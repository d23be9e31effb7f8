package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventStream

/** Event row for MemoryStream (top-level: streaming encoders need an
  * outer-scope-free case class). */
case class Ev(event_id: Long, ts: Long, user_id: Long,
              event_type: String, value: Double, props: String)

/** Drives the streaming operators with a MemoryStream source and a
  * memory sink — the same plans the batch Events operators use, folded
  * incrementally. */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val G = 1000000000L

  private def runToMemory(name: String, mode: String = "complete")
                         (build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
                         (batches: Seq[Seq[Ev]]): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = build(source.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try {
      batches.foreach { b => source.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("windowedCounts folds incrementally and matches the batch twin") {
    import spark.implicits._
    val evs = Seq(
      Ev(1, 100 * G, 1, "click", 1.0, "{}"),
      Ev(2, 200 * G, 2, "click", 1.0, "{}"),
      Ev(3, 3700 * G, 1, "view", 1.0, "{}"),
      Ev(4, 3800 * G, 1, "click", 1.0, "{}"))
    val got = runToMemory("wc")(df => EventStream.windowedCounts(df))(
      Seq(evs.take(2), evs.drop(2)))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.windowedCountsBatch(evs.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === batch)
    assert(got === Set((0L, "click", 2L), (3600L, "view", 1L), (3600L, "click", 1L)))
  }

  test("activeUsers: sliding distinct counts equal the batch twin on closed windows") {
    import spark.implicits._
    import graft.operators.Events
    val evs = Seq(
      Ev(1, 10 * G, 1, "a", 0, "{}"), Ev(2, 20 * G, 1, "a", 0, "{}"), // u1 period 0 twice
      Ev(3, 70 * G, 1, "a", 0, "{}"),                                 // u1 period 1
      Ev(4, 130 * G, 2, "a", 0, "{}"),                                // u2 period 2
      Ev(5, 550 * G, 3, "a", 0, "{}"))                                // u3 period 9
    // sentinel far ahead advances the watermark so every real window closes
    val sentinel = Ev(99, 100000 * G, 99, "a", 0, "{}")
    val got = runToMemory("au", mode = "append")(df =>
      EventStream.activeUsers(df, widthSeconds = 60L, windowPeriods = 3,
        watermark = "0 seconds"))(
      Seq(evs.take(3), evs.drop(3), Seq(sentinel)))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Events.rollingActiveUsers(evs.toDF(), "user_id", "ts",
      widthSeconds = 60L, windowPeriods = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === batch) // sentinel's own windows never closed — not emitted
    assert(got(2L) === 2L && got(0L) === 1L && got(9L) === 1L)
  }

  test("sessionCounts merges events within the gap into one session") {
    val evs = Seq(
      Ev(1, 0, 1, "a", 0, "{}"),
      Ev(2, 600 * G, 1, "a", 0, "{}"),      // 10 min later → same session
      Ev(3, 8000 * G, 1, "a", 0, "{}"))     // ~2.2h later → new session
    val got = runToMemory("sc")(df => EventStream.sessionCounts(df))(Seq(evs))
      .map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
    assert(got === Seq((1L, 1L), (1L, 2L)))
  }

  test("hoppingCounts assigns each event to width/step windows and matches the batch twin") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Events
    val evs = Seq(
      Ev(1, 1000 * G, 1, "click", 0, "{}"),
      Ev(2, 1900 * G, 2, "click", 0, "{}"), // fd=2: the band shifted one step
      Ev(3, 5000 * G, 1, "view", 0, "{}"))
    val got = runToMemory("hop")(df =>
        EventStream.hoppingCounts(df, width = "1 hour", step = "15 minutes"))(
        Seq(evs.take(2), evs.drop(2)))
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Events.hoppingByType(
        spark.createDataFrame(evs).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        widthSeconds = 3600L, stepSeconds = 900L)
      .select(col("bucket"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === batch)
    // t=1000 s → starts {−1800,−900,0,900}; t=1900 s → {−900,0,900,1800}
    assert(got((0L, "click")) === 2L && got((-1800L, "click")) === 1L &&
      got((1800L, "click")) === 1L)
  }

  test("runningUserTotals keeps exact per-user state across batches") {
    val b1 = Seq(Ev(1, 0, 1, "a", 1.25, "{}"), Ev(2, 1, 2, "a", 2.00, "{}"))
    val b2 = Seq(Ev(3, 2, 1, "a", 0.75, "{}"))
    // update mode appends one row per key per batch — keep the latest
    val got = runToMemory("rt", mode = "update")(
        df => EventStream.runningUserTotals(df).toDF())(Seq(b1, b2))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    assert(got(1L) === ((2L, 200L))) // 1.25 + 0.75 = 2.00 → 200 cents
    assert(got(2L) === ((1L, 200L)))
  }

  test("funnelProgress: cross-batch progression matches the batch funnel") {
    import spark.implicits._
    // u1: view | batch cut | click, purchase → step 3 (progress spans batches)
    // u2: click first (ignored), view → step 1
    // u3: view+click same µs → click can NOT advance (strict >)
    val b1 = Seq(Ev(1, 10 * G, 1, "view", 0, "{}"),
      Ev(5, 4 * G, 2, "click", 0, "{}"), Ev(6, 8 * G, 2, "view", 0, "{}"),
      Ev(7, 3 * G, 3, "view", 0, "{}"), Ev(8, 3 * G, 3, "click", 0, "{}"))
    val b2 = Seq(Ev(2, 20 * G, 1, "click", 0, "{}"),
      Ev(3, 30 * G, 1, "purchase", 0, "{}"))
    val rows = runToMemory("fp", mode = "update")(df =>
        graft.streaming.EventStream.funnelProgress(df,
          Seq("view", "click", "purchase")).toDF())(Seq(b1, b2))
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(rows(1L) === 3)
    assert(rows(2L) === 1, "click before the first view must not count")
    assert(rows(3L) === 1, "same-µs click cannot advance past the view (strict >)")
    // equals the batch operator's counts
    val batch = graft.operators.Events.funnelCounts(
        (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val streamCounts = (1 to 3).map(k => k -> rows.values.count(_ >= k).toLong).toMap
    assert(batch === streamCounts)
  }

  test("scdCurrentState: runs fold across batches and match the batch open row") {
    import spark.implicits._
    // u1: free, free | batch cut | pro, free — current = (v3, free, 1 event)
    // u2: pro | (nothing)          — current = (v1, pro, 1 event)
    val b1 = Seq(Ev(1, 10 * G, 1, "free", 0, "{}"), Ev(2, 20 * G, 1, "free", 0, "{}"),
      Ev(5, 5 * G, 2, "pro", 0, "{}"))
    val b2 = Seq(Ev(3, 30 * G, 1, "pro", 0, "{}"), Ev(4, 40 * G, 1, "free", 0, "{}"))
    val rows = runToMemory("scd", mode = "update")(
        df => EventStream.scdCurrentState(df).toDF())(Seq(b1, b2))
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    // latest per user = max version
    val cur = rows.groupBy(_._1._1).view
      .mapValues(m => m.maxBy(_._1._2)).toMap
    assert(cur(1L)._1._2 === 3L)
    assert(cur(1L)._2 === (("free", 40L * 1000000L, 1L)))
    assert(cur(2L)._1._2 === 1L)
    assert(cur(2L)._2 === (("pro", 5L * 1000000L, 1L)))
    // equals the batch operator's open row
    val batch = graft.operators.Events.scd2Intervals(
        (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .filter(org.apache.spark.sql.functions.col("is_current") === 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(5)))).toMap
    cur.foreach { case (u, ((_, v), (t, from, n))) =>
      assert(batch(u) === ((v, t, from, n)), s"user $u")
    }
  }
}
