package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Events

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val G = 1000000000L // ns per second
  private val M = 1000000L    // µs per second (sessionize works in micros)

  private def ev(id: Long, tSec: Long, user: Long, typ: String, v: Double, k: Long = 1) =
    (id, tSec * G, user, typ, v, s"""{"k": $k}""")

  private def df(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("bucketEpoch floors to the window start, exactly, at epoch-nano scale") {
    val e = Seq(ev(1, 1704067200, 1, "click", 1.0), // exactly on the hour
      ev(2, 1704067200 + 3599, 1, "click", 1.0),    // last second of hour
      ev(3, 1704067200 + 3600, 1, "click", 1.0))    // first of next
    val b = df(e).select(Events.bucketEpoch(col("ts"), 3600).as("b")).as[Long].collect()
    assert(b.toSeq === Seq(1704067200L, 1704067200L, 1704070800L))
  }

  test("tumblingByType counts and sums per (bucket, type) with exact cents") {
    val e = Seq(ev(1, 0, 1, "click", 1.10), ev(2, 10, 2, "click", 2.20),
      ev(3, 3600, 1, "view", 0.30), ev(4, 3700, 1, "view", 0.01))
    val got = Events.tumblingByType(df(e), 3600)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got((0L, "click")) === ((2L, 3.30)))
    assert(got((3600L, "view")) === ((2L, 0.31)))
  }

  test("cohortRetention: first-period cohort, per-day dedup, offset counts") {
    val D = 86400L
    val e = Seq(
      ev(1, 0, 1, "view", 0), ev(2, D + 5, 1, "view", 0), ev(3, 3 * D, 1, "view", 0),
      ev(4, D, 2, "view", 0), ev(5, 2 * D, 2, "view", 0),
      ev(6, 10, 3, "view", 0), ev(7, 20, 3, "view", 0)) // same day: dedup to one
    val got = Events.cohortRetention(df(e), "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }

  test("rollingActiveUsers: trailing-window distinct counts, per-window dedup") {
    val D = 86400L
    val e = Seq(
      ev(1, 0, 1, "view", 0), ev(2, 5, 1, "view", 0),      // u1 day 0 (twice: dedup)
      ev(3, D, 1, "view", 0),                              // u1 day 1
      ev(4, 2 * D, 2, "view", 0),                          // u2 day 2
      ev(5, 9 * D, 3, "view", 0))                          // u3 day 9 (gap)
    val got = Events.rollingActiveUsers(df(e), "user_id", "ts", windowPeriods = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 0: u1. day 1: u1. day 2: u1(d0,d1 in window)+u2 = 2.
    // day 3: u1(d1)+u2 = 2. day 4: u2. days 5-8: nobody (absent).
    // days 9-11: u3.
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      9L -> 1L, 10L -> 1L, 11L -> 1L))
    // windowPeriods=1 degenerates to per-period actives
    val daily = Events.rollingActiveUsers(df(e), "user_id", "ts", windowPeriods = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(daily === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 9L -> 1L))
  }

  test("funnelCounts: strictly-after first-occurrence step semantics") {
    val e = df(Seq(
      // user 1: completes the funnel in order
      ev(1, 10, 1, "view", 0), ev(2, 20, 1, "click", 0), ev(3, 30, 1, "purchase", 0),
      // user 2: click BEFORE the first view — never reaches step 2
      ev(4, 10, 2, "click", 0), ev(5, 20, 2, "view", 0),
      // user 3: view then purchase, but no click — stops at step 1
      ev(6, 10, 3, "view", 0), ev(7, 20, 3, "purchase", 0),
      // user 4: purchase only before the click — stops at step 2
      ev(8, 5, 4, "purchase", 0), ev(9, 10, 4, "view", 0),
      ev(10, 15, 4, "click", 0), ev(11, 12, 4, "purchase", 0)))
    val got = Events.funnelCounts(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnelCountsWithin: the window bound is inclusive and per-transition") {
    val e = df(Seq(
      // user 1: click 50s after view (inside 60s), purchase 60s after
      // click — exactly ON the bound, still counts (<=)
      ev(1, 10, 1, "view", 0), ev(2, 60, 1, "click", 0), ev(3, 120, 1, "purchase", 0),
      // user 2: click 61s after view — outside the window
      ev(4, 10, 2, "view", 0), ev(5, 71, 2, "click", 0),
      // user 3: first click late, but the window is measured from the
      // FIRST view — a second view doesn't reset it
      ev(6, 10, 3, "view", 0), ev(7, 100, 3, "view", 0), ev(8, 130, 3, "click", 0)))
    val got = Events.funnelCountsWithin(e, Seq("view", "click", "purchase"),
        windowMicros = 60L * M)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("tumblingAgg (window()) agrees with bucketEpoch on the same data") {
    val e = df(Seq(ev(1, 100, 1, "click", 1.0), ev(2, 3700, 1, "click", 1.0),
      ev(3, 3800, 2, "view", 1.0)))
    val viaInts = Events.tumblingByType(e, 3600)
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaWindow = Events.tumblingAgg(e.withColumn("ets", Events.tsFromNanos(col("ts"))),
        col("ets"), "1 hour")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaInts === viaWindow)
  }

  test("sessionize splits on gaps > threshold and aggregates bounds") {
    val gap30m = 1800L * M
    val e = Seq(
      ev(1, 0, 1, "a", 0), ev(2, 60, 1, "a", 0),        // session 1: 2 events
      ev(3, 60 + 1800 + 61, 1, "a", 0),                  // gap > 30min → session 2
      ev(4, 0, 2, "a", 0))                               // user 2: own session
    val got = Events.sessionize(df(e), gap30m)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(5))).toMap
    assert(got((1L, 1)) === ((2L, 60L * M)))   // 2 events, 60s duration
    assert(got((1L, 2)) === ((1L, 0L)))
    assert(got((2L, 1)) === ((1L, 0L)))
  }

  test("topPerUserAgg matches the window twin; plans a partial-agg pair, no Window") {
    val e = (1L to 60L).map(i => ev(i, 100 + i, i % 5, "a", (i * 31 % 17).toDouble))
    val twin = Events.topPerUser(df(e), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val agg = Events.topPerUserAgg(df(e), n = 3)
    val ours = agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(ours === twin)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert("(SortAggregate|HashAggregate|ObjectHashAggregate)".r
      .findAllIn(plan).length >= 2, s"expected partial+final agg pair:\n$plan")
  }

  test("nextEventLabels: per-user lead with exact-µs gaps, NULL tail") {
    val e = Seq(ev(1, 100, 1, "view", 0), ev(2, 160, 1, "click", 0),
      ev(3, 200, 1, "buy", 0), ev(4, 150, 2, "view", 0))
    val got = Events.nextEventLabels(df(e))
      .collect().map(r => r.getLong(0) -> (Option(r.getString(3)), Option(r.get(4)))).toMap
    assert(got(1L) === ((Some("click"), Some(60L * M))))
    assert(got(2L) === ((Some("buy"), Some(40L * M))))
    assert(got(3L) === ((None, None)))   // user 1's last event
    assert(got(4L) === ((None, None)))   // user 2's only event
  }

  test("lagFeatures: back-looking lags, NULL until a full 3-event history") {
    val e = Seq(ev(1, 100, 1, "view", 2.0), ev(2, 160, 1, "click", 4.0),
      ev(3, 200, 1, "buy", 9.0), ev(4, 150, 2, "view", 5.0))
    val got = Events.lagFeatures(df(e)).collect()
      .map(r => r.getLong(0) -> (Option(r.get(4)), Option(r.get(5)),
        Option(r.get(6)), Option(r.get(7)))).toMap
    assert(got(1L) === ((None, None, None, None)))          // no history
    assert(got(2L) === ((Some(2.0), Some(60L * M), None, None))) // 2 events: lags yes, stats no
    assert(got(3L) === ((Some(4.0), Some(40L * M), Some(5.0), Some(9.0)))) // (9+4+2)/3, max
    assert(got(4L) === ((None, None, None, None)))          // other user untouched
  }

  test("coOccurrence: distinct users per pair, multiplicity ignored, threshold") {
    val e = Seq(
      ev(1, 10, 1, "a", 0), ev(2, 20, 1, "b", 0), ev(3, 30, 1, "b", 0), // dup a-b user 1
      ev(4, 10, 2, "a", 0), ev(5, 20, 2, "b", 0), ev(6, 30, 2, "c", 0),
      ev(7, 10, 3, "a", 0), ev(8, 20, 3, "c", 0))
    val got = Events.coOccurrence(df(e), "user_id", "event_type", minUsers = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 2L)) // b-c only user 2
  }

  test("eventTransitions: ordered steps, last event dropped, exact probabilities") {
    val e = Seq(
      ev(1, 10, 1, "view", 0), ev(2, 20, 1, "click", 0), ev(3, 30, 1, "view", 0),
      ev(4, 10, 2, "view", 0), ev(5, 20, 2, "click", 0), ev(6, 30, 2, "buy", 0))
    val got = Events.eventTransitions(df(e))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // from view: ->click ×2 (p=1.0); from click: ->view ×1, ->buy ×1 (p=0.5 each)
    assert(got === Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 0.5)),
      ("click", "buy") -> ((1L, 0.5))))
  }

  test("interArrivalStats: telescoping mean, max gap, single-event NULLs") {
    val e = Seq(ev(1, 100, 1, "view", 1.0), ev(2, 160, 1, "click", 1.0),
      ev(3, 200, 1, "buy", 1.0), ev(4, 500, 2, "view", 1.0))
    val got = Events.interArrivalStats(df(e)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4))))).toMap
    // user 1: gaps 60s, 40s → span 100s, mean 50s, max 60s
    assert(got(1L) === ((3L, 100L * M, Some(50.0 * M), Some(60L * M))))
    assert(got(2L) === ((1L, 0L, None, None)))
  }

  test("interArrivalStats breaks ts ties by event_id deterministically") {
    // two events at the same instant: gap 0 then 10s — max is 10s
    val e = Seq(ev(5, 100, 7, "a", 0), ev(6, 100, 7, "b", 0), ev(7, 110, 7, "c", 0))
    val got = Events.interArrivalStats(df(e)).collect()(0)
    assert(got.getLong(1) === 3L && got.getLong(2) === 10L * M)
    assert(got.getLong(4) === 10L * M)
  }

  test("a gap of exactly the threshold does NOT split (strict >)") {
    val e = Seq(ev(1, 0, 1, "a", 0), ev(2, 1800, 1, "a", 0))
    val got = Events.sessionize(df(e), 1800L * M).collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === 2L)
  }

  test("sessionize truncates sub-microsecond digits BEFORE the gap compare") {
    // two events 1800s apart in micros, but with nano digits that would
    // push the raw-nano gap over the threshold — must NOT split.
    val e = Seq((1L, 100L, 1L, "a", 0.0, "{}"),
      (2L, 1800L * G + 900L, 1L, "a", 0.0, "{}"))  // nano gap 1800s+800ns
    val got = Events.sessionize(df(e), 1800L * M).collect()
    assert(got.length === 1)
    assert(got(0).getLong(3) === 0L)           // t_start_us truncated
    assert(got(0).getLong(5) === 1800L * M)    // duration_us exact micros
  }

  test("propsAgg extracts JSON ints and aggregates exactly") {
    val e = Seq(ev(1, 0, 1, "click", 0, k = 10), ev(2, 1, 1, "click", 0, k = 32),
      ev(3, 2, 1, "view", 0, k = 7))
    val got = Events.propsAgg(df(e))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("click") === ((2L, 42L, 10L, 32L)))
    assert(got("view") === ((1L, 7L, 7L, 7L)))
  }

  test("zscoreByKey: exact integer-cents algebra, degenerate keys NULL") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    // key a: values 1.00, 2.00, 3.00 → cents 100/200/300, n=3, s=600,
    // ss=140000 → varNum = 3·140000 − 360000 = 60000
    // z(1.00) = (100·3 − 600)/√60000 = −300/√60000
    val in = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 5.0), (5L, "c", 7.0), (6L, "c", 7.0))
      .toDF("event_id", "event_type", "value")
    val got = Events.zscoreByKey(in, "event_id", "event_type", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) === Some(-300.0 / math.sqrt(60000.0)))
    assert(got(2L) === Some(0.0))
    assert(got(3L) === Some(300.0 / math.sqrt(60000.0)))
    assert(got(4L) === None, "n=1 key must yield NULL, not a blow-up")
    assert(got(5L) === None, "zero-variance key must yield NULL")
  }

  test("zscoreByKey: NULL-keyed rows survive and form their own group") {
    // the cumeDistByKey defect class (ADVICE r10): a plain equi-join
    // back on the group key silently DROPPED rows whose key is NULL;
    // the join is now null-safe and the NULL key is a real group
    val spark = TestSpark.spark
    import spark.implicits._
    val in = Seq((1L, Some("a"), 1.0), (2L, Some("a"), 3.0),
      (3L, None, 10.0), (4L, None, 20.0), (5L, None, 30.0))
      .toDF("event_id", "event_type", "value")
    val out = Events.zscoreByKey(in, "event_id", "event_type", "value")
    assert(out.count() === 5L, "no input row may disappear")
    val got = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // NULL group: cents 1000/2000/3000, varNum = 3·14000000 − 36000000
    assert(got(3L) === Some(-3000.0 / math.sqrt(6000000.0)))
    assert(got(4L) === Some(0.0))
    assert(got(5L) === Some(3000.0 / math.sqrt(6000000.0)))
  }

  test("hoppingByType: each event lands in exactly width/step windows") {
    // width 3600, step 900 → 4 covering windows per event
    // t=1000 s, fd=floor(1000/900)=1 → starts (1−3..1)·900 = {−1800,−900,0,900}
    val e = Seq(ev(1, 1000, 1, "click", 1.10))
    val got = Events.hoppingByType(df(e), 3600, 900)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set(-1800L, -900L, 0L, 900L))
    assert(got.values.toSet === Set((1L, 1.10)))
  }

  test("hoppingByType with width == step degenerates to tumblingByType") {
    val e = Seq(ev(1, 10, 1, "click", 1.10), ev(2, 3700, 1, "view", 2.20),
      ev(3, 3800, 2, "view", 0.30))
    val hop = Events.hoppingByType(df(e), 3600, 3600)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val tum = Events.tumblingByType(df(e), 3600)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(hop === tum)
  }

  test("hoppingByType rejects non-multiple and row-multiplying widths") {
    intercept[IllegalArgumentException](Events.hoppingByType(df(Nil), 3600, 700))
    intercept[IllegalArgumentException](Events.hoppingByType(df(Nil), 65000, 1000))
  }

  test("typeSequences: consecutive runs per user, support-ranked, stable ties") {
    val e = Seq(
      ev(1, 10, 1, "a", 0), ev(2, 20, 1, "b", 0), ev(3, 30, 1, "c", 0),
      ev(4, 40, 1, "b", 0), // u1: a>b>c, b>c>b
      ev(5, 10, 2, "a", 0), ev(6, 20, 2, "b", 0), ev(7, 30, 2, "c", 0), // u2: a>b>c
      ev(8, 10, 3, "z", 0), ev(9, 20, 3, "z", 0)) // too short for a trigram
    val got = Events.typeSequences(df(e), n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.head === (("a > b > c", 2L)))
    assert(got.toSet === Set(("a > b > c", 2L), ("b > c > b", 1L)))
  }

  test("typeSequences: a NULL type inside a run disqualifies it (review r15)") {
    // u1's timeline is [a, NULL, c]: the last lead is non-null so the
    // old gate passed the run, and concat_ws silently dropped the
    // NULL — counting a fake "a > c" 2-path as a trigram
    val rows = Seq(
      (1L, 10L * G, 1L, Some("a"), 0.0, "{}"),
      (2L, 20L * G, 1L, None: Option[String], 0.0, "{}"),
      (3L, 30L * G, 1L, Some("c"), 0.0, "{}"),
      (4L, 10L * G, 2L, Some("a"), 0.0, "{}"),
      (5L, 20L * G, 2L, Some("b"), 0.0, "{}"),
      (6L, 30L * G, 2L, Some("c"), 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.typeSequences(rows, n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("a > b > c", 1L)),
      s"the NULL-holed run must not be counted; got ${got.toSeq}")
  }

  test("zscoreByKey: an all-NULL value column yields NULL z, not a driver NPE (review r15)") {
    val rows = Seq(
      (1L, "a", None: Option[Double]),
      (2L, "a", None: Option[Double]),
      (3L, "b", None: Option[Double]))
      .toDF("event_id", "event_type", "value")
    val out = Events.zscoreByKey(rows, "event_id", "event_type", "value")
      .collect()
    assert(out.length == 3 && out.forall(_.isNullAt(3)),
      "NULL sums have nothing to overflow — z must come out NULL row-wise")
  }

  test("typeSequences ranks ties by sequence string ascending") {
    val e = Seq(ev(1, 10, 1, "b", 0), ev(2, 20, 1, "a", 0),
      ev(3, 10, 2, "a", 0), ev(4, 20, 2, "b", 0))
    val got = Events.typeSequences(df(e), n = 2, topK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a > b", 1L)), "tie at n=1 must cut by seq asc")
  }

  test("calendarProfile: epoch day 0 is Thursday, hours and cents exact") {
    // 1970-01-01 00:30 UTC → isodow 4 (Thu), hour 0
    // 1970-01-04 23:30 UTC → isodow 7 (Sun), hour 23
    val e = Seq(ev(1, 1800, 1, "click", 1.10),
      ev(2, 3 * 86400 + 23 * 3600 + 1800, 1, "view", 2.23))
    val got = Events.calendarProfile(df(e))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map((4L, 0L) -> ((1L, 1.10)), (7L, 23L) -> ((1L, 2.23))))
  }

  test("entryExitProfile: first/last per user under the tie-broken total order") {
    val e = Seq(
      ev(1, 10, 1, "view", 0), ev(2, 20, 1, "click", 0), ev(3, 30, 1, "buy", 0),
      ev(4, 10, 2, "view", 0),                      // single event: entry == exit
      ev(5, 40, 3, "click", 0), ev(6, 40, 3, "view", 0)) // tie: event_id orders
    val got = Events.entryExitProfile(df(e))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("view", "buy") -> 1L, ("view", "view") -> 1L,
      ("click", "view") -> 1L))
  }

  test("burstiness: exact Fano factor; single-day users NULL") {
    val D = 86400L
    val e = Seq(
      // u1: days 0,1,2 → counts 1,1,1 → fano 0 (metronome)
      ev(1, 0, 1, "a", 0), ev(2, D, 1, "a", 0), ev(3, 2 * D, 1, "a", 0),
      // u2: days 0,1 → counts 4,1: fano = (2·17 − 25)/(2·5) = 0.9 (burst)
      ev(4, 0, 2, "a", 0), ev(5, 1, 2, "a", 0), ev(6, 2, 2, "a", 0),
      ev(7, 3, 2, "a", 0), ev(8, D, 2, "a", 0),
      // u3: one day only
      ev(9, 0, 3, "a", 0))
    val got = Events.burstiness(df(e)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L) === ((3L, 3L, 1.0, Some(0.0))))
    assert(got(2L) === ((2L, 5L, 2.5, Some(0.9))))
    assert(got(3L) === ((1L, 1L, 1.0, None)))
  }

  test("typeDiversity: exact Gini-Simpson; single-type users at exactly 0") {
    val e = Seq(
      // u1: 2×a + 2×b → n=4, Σc²=8 → simpson = (16−8)/16 = 0.5, eff = 2.0
      ev(1, 0, 1, "a", 0), ev(2, 1, 1, "a", 0), ev(3, 2, 1, "b", 0), ev(4, 3, 1, "b", 0),
      // u2: 3×a → simpson exactly 0, eff exactly 1
      ev(5, 0, 2, "a", 0), ev(6, 1, 2, "a", 0), ev(7, 2, 2, "a", 0))
    val got = Events.typeDiversity(df(e)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) === ((4L, 2L, 0.5, 2.0)))
    assert(got(2L) === ((3L, 1L, 0.0, 1.0)))
  }

  test("inactivity: anchored at the corpus max day, churn flag at the threshold") {
    val D = 86400L
    val e = Seq(
      ev(1, 20 * D, 1, "a", 0),             // the anchor user (day 20)
      ev(2, 13 * D, 2, "a", 0),             // 7 days inactive → churned
      ev(3, 14 * D, 3, "a", 0),             // 6 days inactive → not churned
      ev(4, 2 * D, 2, "a", 0))              // earlier activity: max wins
    val got = Events.inactivity(df(e), churnDays = 7).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(got(1L) === ((20L, 0L, 0)))
    assert(got(2L) === ((13L, 7L, 1)))
    assert(got(3L) === ((14L, 6L, 0)))
  }

  test("calendarProfile handles pre-1970 instants (floor + pmod, never negative cells)") {
    val e = Seq(ev(1, -3600, 1, "click", 1.0)) // 1969-12-31 23:00 UTC, a Wednesday
    val got = Events.calendarProfile(df(e))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((3L, 23L)))
  }

  test("scd2Intervals: runs collapse, intervals tile, exactly one open row per user") {
    val e = Seq(
      ev(1, 0, 1, "free", 0), ev(2, 10, 1, "free", 0),   // run 1: two events
      ev(3, 20, 1, "pro", 0),                            // run 2
      ev(4, 30, 1, "free", 0),                           // run 3: back to free = NEW run
      ev(5, 5, 2, "pro", 0))                             // user 2: single open run
    val got = Events.scd2Intervals(df(e)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getLong(5), r.getInt(6))).toMap
    assert(got((1L, 1L)) === (("free", 0L, 20L * M, 2L, 0)))
    assert(got((1L, 2L)) === (("pro", 20L * M, 30L * M, 1L, 0)))
    assert(got((1L, 3L)) === (("free", 30L * M, -1L, 1L, 1)))
    assert(got((2L, 1L)) === (("pro", 5L * M, -1L, 1L, 1)))
    // intervals tile: every close equals the next open (checked above
    // pairwise) and open rows are exactly one per user
    assert(got.count(_._2._5 == 1) === 2)
  }

  test("decayedPopularity: polynomial kernel, anchor on the last day, by hand") {
    val D = 86400L
    // type a: 2 events on day 2 (age 0), 1 on day 0 (age 2)
    // → 2/1 + 1/3; type b: 3 events on day 1 (age 1) → 3/2
    val e = Seq(ev(1, 2 * D, 1, "a", 0), ev(2, 2 * D + 1, 2, "a", 0),
      ev(3, 0, 1, "a", 0),
      ev(4, D, 1, "b", 0), ev(5, D + 1, 2, "b", 0), ev(6, D + 2, 3, "b", 0))
    val got = Events.decayedPopularity(df(e)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("a")._1 === 2L)
    assert(got("a")._2 === (1.0 / 3.0 + 2.0)) // sorted fold: small first
    assert(got("b") === ((1L, 1.5)))
  }

  test("dailyTrend: exact OLS on a hand-built ramp; single-day type yields NULL") {
    val D = 86400L
    // type a: counts 1, 2, 3 on days 0, 1, 2 → slope 1, intercept 1
    val e = Seq(ev(1, 0, 1, "a", 0),
      ev(2, D, 1, "a", 0), ev(3, D + 1, 2, "a", 0),
      ev(4, 2 * D, 1, "a", 0), ev(5, 2 * D + 1, 2, "a", 0), ev(6, 2 * D + 2, 3, "a", 0),
      ev(7, 5 * D, 9, "b", 0)) // one day only
    val got = Events.dailyTrend(df(e)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got("a") === ((3L, Some(1.0), Some(1.0))))
    assert(got("b") === ((1L, None, None)), "den = 0 must yield NULL, not NaN")
  }

  test("sessionFeatures: positions restart and offsets re-anchor at the session break") {
    val e = Seq(
      ev(1, 0, 1, "view", 0), ev(2, 10, 1, "click", 0),     // session 1
      ev(3, 4000, 1, "view", 0), ev(4, 4005, 1, "buy", 0),  // gap > 1800 s → session 2
      ev(5, 7, 2, "view", 0))                               // other user
    val got = Events.sessionFeatures(df(e), gapMicros = 1800L * M)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) === ((1L, 1L, 0L)))
    assert(got(2L) === ((1L, 2L, 10L * M)))
    assert(got(3L) === ((2L, 1L, 0L)), "offset re-anchors at the new session")
    assert(got(4L) === ((2L, 2L, 5L * M)))
    assert(got(5L) === ((1L, 1L, 0L)))
  }

  test("kaplanMeier: censoring enters the risk set, survival is the prefix product") {
    val D = 86400L
    val e = Seq(
      ev(1, 0, 1, "view", 0), ev(2, D, 1, "purchase", 0),      // u1 converts day 1
      ev(3, 0, 2, "view", 0), ev(4, 3 * D, 2, "purchase", 0),  // u2 converts day 3
      ev(5, 0, 3, "view", 0),                                  // u3 censored at horizon
      ev(6, 0, 4, "view", 0), ev(7, 2 * D, 4, "view", 0))      // u4 censored at horizon
    // horizon = day 3 (u2's purchase). durations: 1(ev), 3(ev), 3(c), 3(c)
    // day 1: e=1, n=4 → S = 3/4. day 3: e=1, n=3 → S = 3/4 · 2/3 = 1/2
    val got = Events.kaplanMeier(df(e)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(1L -> ((1L, 4L, 0.75)), 3L -> ((1L, 3L, 0.5))))
  }

  test("kaplanMeier: with no censoring S drops to 0 at the last event day") {
    val D = 86400L
    val e = Seq(
      ev(1, 0, 1, "view", 0), ev(2, D, 1, "purchase", 0),
      ev(3, 0, 2, "view", 0), ev(4, 2 * D, 2, "purchase", 0))
    val got = Events.kaplanMeier(df(e)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 0.5)
    assert(got(2L) === 0.0)
  }

  test("engagementHistogram: trailing window cuts by the anchor day, per-day dedup") {
    val D = 86400L
    val e = Seq(
      ev(1, 29 * D, 1, "a", 0), ev(2, 29 * D + 5, 1, "a", 0), // u1 day 29 ×2 → 1 day
      ev(3, 28 * D, 1, "a", 0),                               // u1 day 28 → 2 days
      ev(4, 29 * D, 2, "a", 0),                               // u2: 1 day
      ev(5, 1 * D, 3, "a", 0))                                // u3: day 1 < 29-28+1 → outside
    val got = Events.engagementHistogram(df(e), windowDays = 28).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // window = days (2, 29] — u3's day 1 excluded entirely
    assert(got === Map(2L -> 1L, 1L -> 1L))
  }
}
