package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** As-of and range joins against brute-force references. */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest prior value, inclusive at equal ts, nulls before first right row") {
    val left = Seq(
      (101L, 1L, 50L),   // before any right row -> nulls
      (102L, 1L, 100L),  // == right ts 100 -> inclusive match r1
      (103L, 1L, 250L),  // after r2 -> r2
      (104L, 2L, 500L)   // other key, no right rows -> nulls
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, 100L, 11L, 1.5),
      (1L, 200L, 12L, 2.5)
    ).toDF("user_id", "p_ts_us", "p_event_id", "p_value")
    val got = TemporalJoins.asofJoin(left, right, "user_id", "ts_us", "p_ts_us",
      Seq("p_event_id", "p_value"), "p_event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(got(101L).isEmpty)
    assert(got(102L).contains((11L, 1.5)))
    assert(got(103L).contains((12L, 2.5)))
    assert(got(104L).isEmpty)
  }

  test("asofJoin: equal right timestamps tie-break to the larger tie id") {
    val left = Seq((1L, 1L, 300L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, 300L, 7L, 7.0), (1L, 300L, 9L, 9.0))
      .toDF("user_id", "p_ts_us", "p_event_id", "p_value")
    val r = TemporalJoins.asofJoin(left, right, "user_id", "ts_us", "p_ts_us",
      Seq("p_event_id", "p_value"), "p_event_id").collect()(0)
    assert(r.getLong(3) == 9L) // last in (ts, tie) order wins
  }

  test("asofJoin: a NULL value column never tears — the matched row is atomic") {
    val left = Seq((1L, 1L, 250L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      (1L, 100L, Some(11L), Some(1.5)),
      (1L, 200L, Some(12L), Option.empty[Double]) // latest row carries a NULL value
    ).toDF("user_id", "p_ts_us", "p_event_id", "p_value")
    val r = TemporalJoins.asofJoin(left, right, "user_id", "ts_us", "p_ts_us",
      Seq("p_event_id", "p_value"), "p_event_id").collect()(0)
    assert(r.getLong(3) == 12L)
    assert(r.isNullAt(4), "p_value must be the matched row's NULL, not the older row's 1.5")
  }

  test("guards: non-numeric tie column and pathological interval span fail loudly") {
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts_us")
    val right = Seq((1L, 5L, "not-numeric", 1.0))
      .toDF("user_id", "p_ts_us", "p_id", "p_value")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right, "user_id", "ts_us", "p_ts_us",
        Seq("p_value"), rightTieCol = "p_id")
    }
    val points = Seq((1L, 1L, 50L)).toDF("pt_id", "key", "pt")
    val wild = Seq((1L, 1L, 0L, 10000000L)).toDF("iv_id", "key", "lo", "hi")
    val ex = intercept[Exception] {
      TemporalJoins.rangeJoin(points, "pt", wild, "lo", "hi", "key",
        bucketWidth = 10L, maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage != null)
    // inverted interval (lo > hi): sequence would DESCEND — must also trip
    val inverted = Seq((1L, 1L, 10000000L, 0L)).toDF("iv_id", "key", "lo", "hi")
    intercept[Exception] {
      TemporalJoins.rangeJoin(points, "pt", inverted, "lo", "hi", "key",
        bucketWidth = 10L, maxBucketsPerInterval = 100).collect()
    }
    // NULL-bounded (open) interval rows are dropped, not fatal
    val withNull = Seq((1L, 1L, Some(40L), Option.empty[Long]),
      (2L, 1L, Some(40L), Some(60L))).toDF("iv_id", "key", "lo", "hi")
    val ok = TemporalJoins.rangeJoin(points, "pt", withNull, "lo", "hi", "key",
      bucketWidth = 10L).select("iv_id").collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(2L))
    // case-insensitive tie-column resolution still works
    val left2 = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "ts_us")
    val right2 = Seq((1L, 5L, 9L, 1.0)).toDF("user_id", "p_ts_us", "p_id", "p_value")
    val r = TemporalJoins.asofJoin(left2, right2, "user_id", "ts_us", "p_ts_us",
      Seq("p_value"), rightTieCol = "P_ID")
    assert(r.count() == 1L)
  }

  test("rangeJoin equals the brute-force non-equi join, incl. multi-bucket intervals") {
    val rnd = new scala.util.Random(3)
    val points = (1 to 300).map(i => (i.toLong, (i % 5).toLong, rnd.nextInt(10000).toLong))
      .toDF("pt_id", "key", "pt")
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextInt(9000).toLong
      // spans up to 30 buckets at width 100
      (i.toLong, (i % 5).toLong, lo, lo + rnd.nextInt(3000).toLong)
    }.toDF("iv_id", "key", "lo", "hi")
    val rj = TemporalJoins.rangeJoin(points, "pt", intervals, "lo", "hi", "key",
      bucketWidth = 100L)
    // the whole point: an equi-join plan, never the nested loop a
    // naive non-equi join gets
    val plan = rj.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    val got = rj.select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val expect = points.join(intervals, "key")
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expect.toSeq && expect.nonEmpty)
  }

  test("asofJoinForward: nearest following row, inclusive ties, nulls past the end") {
    val left = Seq((1L, 1L, 10L), (2L, 1L, 25L), (3L, 1L, 100L), (4L, 2L, 5L))
      .toDF("l_id", "key", "ts")
    val right = Seq(
      (11L, 1L, 25L, 1.0),  // equal ts: inclusive match for l2
      (12L, 1L, 25L, 2.0),  // tie at 25 → lowest r_id (11) wins
      (13L, 1L, 50L, 3.0)
    ).toDF("r_id", "key", "rts", "v")
    val got = TemporalJoins.asofJoinForward(left, right, "key", "ts", "rts",
      valueCols = Seq("r_id", "v"), rightTieCol = "r_id")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(got(1L) === ((11L, 1.0)), "next row strictly after 10 is the 25 pair, tie → 11")
    assert(got(2L) === ((11L, 1.0)), "equal timestamp is inclusive")
    assert(got(3L) === ((-1L, -1.0)), "no later right row → nulls")
    assert(got(4L) === ((-1L, -1.0)), "other key never matches")
  }

  test("intervalOverlapJoin: exactly-once pairs, closed bounds, equi-join plan") {
    // multi-bucket overlap (the dedup case), endpoint touch, disjoint
    val left = Seq(
      (1L, 1L, 0L, 250L),     // spans buckets 0-2 at width 100
      (2L, 1L, 500L, 600L),   // touches right's lo at 600
      (3L, 1L, 900L, 950L),   // disjoint
      (4L, 2L, 0L, 100L)      // other key: never matches key-1 rows
    ).toDF("l_id", "key", "lo1", "hi1")
    val right = Seq(
      (10L, 1L, 100L, 400L),  // overlaps l1 across buckets 1-2
      (11L, 1L, 600L, 700L),  // touches l2 exactly at 600
      (12L, 1L, 1000L, 1100L)
    ).toDF("r_id", "key", "lo2", "hi2")
    val j = TemporalJoins.intervalOverlapJoin(left, "lo1", "hi1",
      right, "lo2", "hi2", "key", bucketWidth = 100L)
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    val got = j.select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got === Seq((1L, 10L), (2L, 11L)),
      "shared-bucket pair must appear exactly once; closed bounds include the touch")
    // brute-force parity on a random fixture
    val rnd = new scala.util.Random(7)
    val l2 = (1 to 150).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, (i % 4).toLong, lo, lo + rnd.nextInt(900).toLong)
    }.toDF("l_id", "key", "lo1", "hi1")
    val r2 = (1 to 150).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, (i % 4).toLong, lo, lo + rnd.nextInt(900).toLong)
    }.toDF("r_id", "key", "lo2", "hi2")
    val fast = TemporalJoins.intervalOverlapJoin(l2, "lo1", "hi1",
        r2, "lo2", "hi2", "key", bucketWidth = 250L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val brute = l2.join(r2, "key")
      .filter(col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(fast.toSeq === brute.toSeq && brute.nonEmpty)
  }

  test("asofJoin/asofJoinForward: NULL timestamps match nothing (review r15)") {
    // a NULL-ts right row sorted "before all time" under the backward
    // window order, so its values attached to every left row lacking
    // a real prior match; a NULL-ts left row under the forward
    // (descending) order picked up the whole timeline's carry. Both
    // must be NULL matches.
    val left = Seq((101L, 1L, Some(50L)), (102L, 1L, None: Option[Long]))
      .toDF("l_id", "user_id", "ts_us")
    val right = Seq((1L, None: Option[Long], 99.0), (1L, Some(100L), 5.0))
      .toDF("user_id", "p_ts_us", "price")
    val back = TemporalJoins.asofJoin(left, right, "user_id",
        "ts_us", "p_ts_us", Seq("price"), "p_ts_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(back == Map(101L -> None, 102L -> None),
      s"backward: no right row at or before ts=50 (the NULL-ts row is " +
        s"not 'before all time'); got $back")
    val fwd = TemporalJoins.asofJoinForward(left, right, "user_id",
        "ts_us", "p_ts_us", Seq("price"), "p_ts_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(fwd == Map(101L -> Some(5.0), 102L -> None),
      s"forward: ts=50 matches the ts=100 row; the NULL-ts left row " +
        s"matches nothing; got $fwd")
  }
}
