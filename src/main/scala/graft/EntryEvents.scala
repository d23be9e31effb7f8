package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Event analytics: sessions, funnels, attribution, retention, time-series diagnostics over the events table.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryEvents {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── LLM-pipeline: tumbling-window event aggregates ──────────────
    "q_events_window" -> ((s, dir) => {
      Events.tumblingByType(Tables(s, dir, "events"), widthSeconds = 3600L)
    }),


    // ── LLM-pipeline: gap-based sessionization (islands idiom) ──────
    // 30-minute gap at MICROSECOND precision (nano digits are not
    // representable in the oracle's timestamp type — Events.sessionize).
    "q_sessions" -> ((s, dir) => {
      Events.sessionize(Tables(s, dir, "events"), gapMicros = 1800000000L)
    }),


    // ── LLM-pipeline: next-event training labels (lead window) ──────
    "q_next_event" -> ((s, dir) => {
      Events.nextEventLabels(Tables(s, dir, "events"))
    }),


    // ── LLM-pipeline: top-n events per user (PARTITIONED window) ────
    "q_top_events" -> ((s, dir) => {
      Events.topPerUser(Tables(s, dir, "events"), n = 3)
    }),


    // ── LLM-pipeline: top-n per user via bounded partial agg ────────
    // The skew-safe twin of q_top_events: ≤n pairs per user per task
    // shuffle, independent of the hottest user's event count.
    "q_top_events_agg" -> ((s, dir) => {
      Events.topPerUserAgg(Tables(s, dir, "events"), n = 3)
    }),


    // ── events: daily cohort retention triangle ─────────────────────
    "q_cohorts" -> ((s, dir) => {
      Events.cohortRetention(Tables(s, dir, "events"), "user_id", "ts")
    }),


    // ── events: rolling 7-day active users (WAU per day) ────────────
    "q_active_users" -> ((s, dir) => {
      Events.rollingActiveUsers(Tables(s, dir, "events"), "user_id", "ts",
        widthSeconds = 86400L, windowPeriods = 7)
    }),


    // ── temporal: range join (clicks inside 5-min pre-purchase window)
    // Point-in-interval WITHOUT the nested-loop cross product: both
    // sides bucket to a 5-min grid, the join is equi on (user, bucket),
    // the exact BETWEEN filters in-bucket.
    "q_range_attrib" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        Events.epochMicros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = base.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts_us")
      val intervals = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          (col("ts_us") - 300000000L).as("lo"), col("ts_us").as("hi"))
      TemporalJoins.rangeJoin(clicks, "ts_us", intervals, "lo", "hi",
        "user_id", bucketWidth = 300000000L)
        .groupBy("p_id").agg(count(lit(1)).as("n_clicks"))
    }),


    // ── events: ordered conversion funnel (view → click → purchase) ─
    "q_funnel" -> ((s, dir) => {
      Events.funnelCounts(Tables(s, dir, "events"), Seq("view", "click", "purchase"))
    }),


    // ── events: time-bounded funnel (each step within 1 h) ──────────
    "q_funnel_within" -> ((s, dir) => {
      Events.funnelCountsWithin(Tables(s, dir, "events"),
        Seq("view", "click", "purchase"), windowMicros = 3600000000L)
    }),


    // ── events: funnel window-sensitivity sweep ─────────────────────
    // The same time-bounded funnel at 1 h / 6 h / 24 h step windows
    // in one result — the tuning table that shows how much measured
    // "conversion" is an artifact of the window choice (the funnel
    // sibling of q_lsh_budget's parameter sweep). Three per-user
    // window passes, each funnelCountsWithin's linear shape.
    "q_funnel_sweep" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      Seq(3600000000L, 21600000000L, 86400000000L).map { w =>
        Events.funnelCountsWithin(ev, Seq("view", "click", "purchase"), w)
          .withColumn("window_s", lit(w / 1000000L))
      }.reduceLeft(_ unionByName _)
    }),


    // ── LLM-pipeline: JSON props extraction + per-type aggregate ────
    "q_events_props" -> ((s, dir) => {
      Events.propsAgg(Tables(s, dir, "events"))
    }),


    // ── events: multi-touch linear attribution (exact credit split) ─
    // Each purchase splits its cents equally over the clicks in its
    // 24-hour pre-window: per-click credit = p_cents·10^6 DIV n_touch
    // (floor micro-cents — integer arithmetic, both engines drop the
    // same remainder; purchase values are prices, so operands stay
    // non-negative and div == floor-div). Per click: contributing
    // purchases + total credit. rangeJoin's day grid keeps it
    // equi-join shaped (each interval touches ≤ 2 buckets); the
    // per-purchase touch count is a window PARTITIONED by purchase.
    "q_attrib_linear" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        Events.epochMicros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = base.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts_us")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          round(col("value") * 100).cast("long").as("p_cents"),
          (col("ts_us") - 86400000000L).as("lo"), col("ts_us").as("hi"))
      val touched = TemporalJoins.rangeJoin(clicks, "ts_us", purchases, "lo", "hi",
        "user_id", bucketWidth = 86400000000L)
      touched
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("p_id"))))
        .withColumn("__credit", expr("p_cents * 1000000L div __n"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("__credit")).cast("long").as("credit_ucents"))
    }),


    // ── events: position-based (U-shaped) attribution ───────────────
    // Same day-grid range join as q_attrib_linear, different credit
    // rule: first and last touch get 40% each, the middles split the
    // remaining 20% equally (n=1 → all, n=2 → 50/50). All integer
    // µcents with floor div — both engines drop the same remainder.
    "q_attrib_position" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        Events.epochMicros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = base.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts_us")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          round(col("value") * 100).cast("long").as("p_cents"),
          (col("ts_us") - 86400000000L).as("lo"), col("ts_us").as("hi"))
      val touched = TemporalJoins.rangeJoin(clicks, "ts_us", purchases, "lo", "hi",
        "user_id", bucketWidth = 86400000000L)
      val byP = Window.partitionBy(col("p_id"))
      touched
        .withColumn("__n", count(lit(1)).over(byP))
        .withColumn("__pos", row_number().over(
          byP.orderBy(col("ts_us"), col("event_id"))))
        .withColumn("__credit",
          when(col("__n") === 1, expr("p_cents * 1000000L"))
            .when(col("__n") === 2, expr("p_cents * 1000000L div 2"))
            .when(col("__pos") === 1 || col("__pos") === col("__n"),
              expr("p_cents * 400000L"))
            .otherwise(expr("p_cents * 200000L div (__n - 2)")))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("__credit")).cast("long").as("credit_ucents"))
    }),


    // ── events: A/B experiment lift readout ─────────────────────────
    // Arms = the leakage-safe md5 2-fold on user_id (kFoldGroups —
    // repartition-stable, cross-engine exact); per-arm user counts,
    // converters, conversion rate. The experiment-analysis readout
    // with zero rng state.
    "q_ab_lift" -> ((s, dir) => {
      val per = Tables(s, dir, "events").groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("__conv"))
      Sampling.kFoldGroups(per, "user_id", k = 2)
        .groupBy(col("fold").as("arm"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(col("__conv")).cast("long").as("n_conv"),
          (sum(col("__conv")).cast("double") / count(lit(1)).cast("double"))
            .as("rate"))
    }),


    // ── events: Poisson-bootstrap CI on the A/B conversion rates ────
    // 100 deterministic replicates (weight = Poisson(1) of md5(id:r),
    // thresholds shipped as plan literals — exp() never runs in
    // either engine), discrete 2.5/97.5 rank CI per arm. One bounded
    // ×100 explode over the per-user relation.
    "q_ab_bootstrap" -> ((s, dir) => {
      val per = Tables(s, dir, "events").groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("__conv"))
      val armed = Sampling.kFoldGroups(per, "user_id", k = 2)
      Sampling.bootstrapConversionCI(armed, "user_id", "fold", "__conv", b = 100)
    }),


    // ── events: per-type daily activity trend (exact OLS) ───────────
    // Slope + intercept of count-per-day vs the epoch-day index; five
    // exact long moments, decimal(38) normal equations, one double
    // division per output.
    "q_trend" -> ((s, dir) => {
      Events.dailyTrend(Tables(s, dir, "events"))
    }),


    // ── events: per-event session-relative features ─────────────────
    // Session id + ordinal position + exact-µs offset from session
    // start — the sequence-model inputs the per-session rollup drops.
    // Three windows, ONE shuffle key (user_id).
    "q_session_features" -> ((s, dir) => {
      Events.sessionFeatures(Tables(s, dir, "events"), gapMicros = 1800000000L)
    }),


    // ── events: daily activity spike detection (robust z) ───────────
    // Day-grain counts per type scored by the median/IQR robust
    // scaler; |r| > 2 flags spike/crater days (the partial first and
    // last corpus days are the planted positives). Day table is
    // bounded — the quantile machinery never touches raw events.
    "q_spike_days" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), Events.dayBucket(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      Curation.robustScale(daily, "day", "event_type", "cnt")
        .filter(abs(col("r")) > 2.0)
        .select(col("event_type"), col("day"), col("cnt").cast("long").as("cnt"),
          col("r"))
    }),


    // ── events: per-type value cume_dist, mega-key-safe ─────────────
    // The oracle uses the engine's own cume_dist window; the Spark
    // side is the (key, value)-grain decomposition that never funnels
    // a key's rows through one task — same number, scale-safe plan.
    // ~1% of values are deterministically NULLed (event_id % 97) so
    // the NULL contract — rows survive the null-safe join, NULLs
    // order first, cd(null) = nulls_in_key / rows_in_key — is under
    // the hash gate, not just CurationSpec (the driver fixture itself
    // carries no NULL values).
    "q_cume_dist" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").select(col("event_id"), col("event_type"),
        when(col("event_id") % 97 === 0, lit(null))
          .otherwise(round(col("value") * 100).cast("long")).as("cents"))
      Curation.cumeDistByKey(ev, "event_type", "cents")
        .select("event_id", "event_type", "cents", "cd")
    }),


    // ── events: lag-1 autocorrelation of the daily activity series ──
    // Day-grain collapse first; the lag pairs and the exact six-moment
    // Pearson (q_corr's machinery) run on the bounded day table.
    "q_autocorr" -> ((s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(Events.dayBucket(col("ts")).as("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val pairs = daily
        .withColumn("__prev", lag("cnt", 1).over(Window.orderBy(col("day"))))
        .filter(col("__prev").isNotNull)
        .withColumn("__series", lit("lag1"))
      Curation.pearsonByKey(pairs, "__series", "cnt", "__prev",
          xScale = 1, yScale = 1)
        .select(col("__series").as("series"), col("n"), col("r"))
    }),


    // ── events: Kaplan-Meier time-to-conversion survival curve ──────
    // Exact-arithmetic KM estimator over day-grain durations; users
    // who never purchase are censored at the corpus horizon, not
    // dropped. All folds run on the ≤ maxDays day table, never the
    // corpus.
    "q_survival" -> ((s, dir) => {
      Events.kaplanMeier(Tables(s, dir, "events"), convType = "purchase")
    }),


    // ── events: L28 engagement-depth histogram ──────────────────────
    // Distinct active days per user in the trailing 28-day window
    // anchored at the corpus' last active day, histogrammed.
    "q_engagement" -> ((s, dir) => {
      Events.engagementHistogram(Tables(s, dir, "events"), windowDays = 28)
    }),


    // ── events: first-order Markov transition profile ───────────────
    "q_transitions" -> ((s, dir) => {
      Events.eventTransitions(Tables(s, dir, "events"))
    }),


    // ── events: funnel conversion-latency percentiles ───────────────
    // Time-to-convert (first click → first subsequent purchase) as
    // exact type-7 quantiles — the product-latency twin of q_funnel's
    // counts, composed from the funnel's first-reach rule and the
    // range-exchange quantile machinery (no global window).
    "q_funnel_latency" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").select(col("user_id"),
        col("event_type"), Events.epochMicros(col("ts")).as("ts_us"))
      val c = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts_us").as("c_t"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts_us") > col("c_t"))
        .groupBy("user_id", "c_t").agg(min("ts_us").as("p_t"))
      val gaps = p.select(lit("all").as("seg"),
        (col("p_t") - col("c_t")).cast("double").as("gap_us"))
      Curation.quantilesByKey(gaps, "seg", "gap_us", Seq(0.5, 0.9, 0.99))
    }),


    // ── events: hopping-window aggregate (1 h windows every 15 min) ─
    // Overlapping trend view: one bounded ×4 explode + one hash agg —
    // never a range join of events × windows.
    "q_hopping" -> ((s, dir) => {
      Events.hoppingByType(Tables(s, dir, "events"),
        widthSeconds = 3600L, stepSeconds = 900L)
    }),


    // ── events: top consecutive event-type trigram sequences ────────
    // Sequence mining over user timelines (the n=3 extension of
    // q_transitions): support-ranked full paths, stable tie-break.
    "q_type_seqs" -> ((s, dir) => {
      Events.typeSequences(Tables(s, dir, "events"), n = 3, topK = 50)
    }),


    // ── events: calendar seasonality heatmap (isodow × hour) ────────
    // Pure integer calendar arithmetic on the µs epoch — 168 cells
    // from one map-side-combined aggregate.
    "q_seasonality" -> ((s, dir) => {
      Events.calendarProfile(Tables(s, dir, "events"))
    }),


    // ── events: cumulative user-growth curve ────────────────────────
    // New users per first-active day + running total — the prefix sum
    // rides globalRunningSum's range exchange (day-grain input), never
    // a single-partition global window.
    "q_growth" -> ((s, dir) => {
      val nu = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(min(Events.dayBucket(col("ts"))).as("day"))
        .groupBy("day").agg(count(lit(1)).cast("long").as("new_users"))
      Curation.globalRunningSum(nu, "new_users", "cum_users", 0, col("day"))
        .select(col("day"), col("new_users"), col("cum_users"))
    }),


    // ── events: entry/exit type profile (landing → abandonment) ─────
    // One window pass (first+last over the total order), user-grain
    // distinct, type²-bounded count.
    "q_entry_exit" -> ((s, dir) => {
      Events.entryExitProfile(Tables(s, dir, "events"))
    }),


    // ── events: per-user burstiness (Fano factor of daily counts) ───
    // Exact integer dispersion: (n·Σc² − (Σc)²)/(n·Σc), one division.
    "q_burstiness" -> ((s, dir) => {
      Events.burstiness(Tables(s, dir, "events"))
    }),


    // ── events: per-user type diversity (Gini-Simpson, log-free) ────
    // (n² − Σc²)/n² and n²/Σc² — exact-long divisions; Shannon
    // entropy deliberately avoided (Spark log() is StrictMath, 1 ulp
    // off DuckDB's libm ln — measured at x=74).
    "q_type_diversity" -> ((s, dir) => {
      Events.typeDiversity(Tables(s, dir, "events"))
    }),


    // ── events: inactivity / churn flags vs the corpus anchor day ───
    "q_churn" -> ((s, dir) => {
      Events.inactivity(Tables(s, dir, "events"), churnDays = 7)
    }),


    // ── events: per-user inter-arrival cadence profile ──────────────
    "q_inter_arrival" -> ((s, dir) => {
      Events.interArrivalStats(Tables(s, dir, "events"))
    }),


    // ── events: time-decayed popularity (polynomial kernel) ─────────
    // Recency-weighted per-type activity; 1/(1+age) instead of exp()
    // ON PURPOSE (cross-engine ulp), sorted-fold sum over the bounded
    // day grain.
    "q_decayed_pop" -> ((s, dir) => {
      Events.decayedPopularity(Tables(s, dir, "events"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q_events_window" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket, event_type,
        |       count(*) AS n, sum(round(value * 100)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,


    "q_cohorts" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS period FROM events
        |),
        |c AS (
        |  SELECT u, period, min(period) OVER (PARTITION BY u) AS cohort FROM ud
        |)
        |SELECT cohort, period - cohort AS period_offset, count(*) AS n_users
        |FROM c GROUP BY 1, 2""".stripMargin,


    "q_active_users" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS p FROM events
        |),
        |w AS (SELECT DISTINCT u, p + d AS period FROM active CROSS JOIN range(0, 7) t(d))
        |SELECT period, count(*) AS n_active FROM w GROUP BY 1""".stripMargin,


    "q_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |m AS (
        |  SELECT user_id, ts_us, event_id,
        |         CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |              WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |              ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |),
        |s AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                     ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
        |  FROM m
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts_us) AS t_start_us, max(ts_us) AS t_end_us,
        |       max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY 1, 2""".stripMargin,


    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1.t
        |  GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
        |  GROUP BY 1
        |)
        |SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), 'purchase', count(*) FROM s3""".stripMargin,


    "q_funnel_sweep" -> {
      val windows = Seq(3600000000L, 21600000000L, 86400000000L)
      val ctes = windows.zipWithIndex.map { case (w, i) =>
        s"""w${i}s2 AS (
           |  SELECT e.user_id, min(e.ts_us) AS t
           |  FROM e JOIN s1 ON e.user_id = s1.user_id
           |  WHERE e.event_type = 'click' AND e.ts_us > s1.t AND e.ts_us - s1.t <= $w
           |  GROUP BY 1
           |),
           |w${i}s3 AS (
           |  SELECT e.user_id, min(e.ts_us) AS t
           |  FROM e JOIN w${i}s2 ON e.user_id = w${i}s2.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts_us > w${i}s2.t
           |    AND e.ts_us - w${i}s2.t <= $w
           |  GROUP BY 1
           |)""".stripMargin
      }.mkString(",\n")
      val selects = windows.zipWithIndex.map { case (w, i) =>
        val ws = w / 1000000L
        s"""SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
           |       count(*) AS n_users, CAST($ws AS BIGINT) AS window_s FROM s1
           |UNION ALL
           |SELECT CAST(2 AS INTEGER), 'click', count(*), CAST($ws AS BIGINT) FROM w${i}s2
           |UNION ALL
           |SELECT CAST(3 AS INTEGER), 'purchase', count(*), CAST($ws AS BIGINT) FROM w${i}s3""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |s1 AS (SELECT user_id, min(ts_us) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
         |$ctes
         |$selects""".stripMargin
    },


    "q_funnel_within" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1.t AND e.ts_us - s1.t <= 3600000000
        |  GROUP BY 1
        |),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts_us) AS t
        |  FROM e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t AND e.ts_us - s2.t <= 3600000000
        |  GROUP BY 1
        |)
        |SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), 'purchase', count(*) FROM s3""".stripMargin,


    "q_range_attrib" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events)
        |SELECT p.event_id AS p_id, count(*) AS n_clicks
        |FROM (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.ts_us BETWEEN p.ts_us - 300000000 AND p.ts_us
        |GROUP BY 1""".stripMargin,


    "q_events_props" ->
      """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |       min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1""".stripMargin,


    "q_inter_arrival" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT user_id, ts_us,
        |             ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS gap_us
        |      FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
        |       CASE WHEN count(*) > 1
        |            THEN CAST(max(ts_us) - min(ts_us) AS DOUBLE) / (count(*) - 1)
        |            END AS mean_gap_us,
        |       CAST(max(gap_us) AS BIGINT) AS max_gap_us
        |FROM g GROUP BY user_id""".stripMargin,


    "q_top_events" ->
      """SELECT user_id, event_id, value, CAST(rn AS INTEGER) AS rank
        |FROM (SELECT user_id, event_id, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY value DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 3""".stripMargin,


    "q_top_events_agg" ->
      """SELECT user_id, event_id, value, CAST(rn AS INTEGER) AS rank
        |FROM (SELECT user_id, event_id, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY value DESC, event_id) AS rn
        |      FROM events)
        |WHERE rn <= 3""".stripMargin,


    "q_next_event" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT event_id, user_id, event_type,
        |       lead(event_type) OVER w AS next_type,
        |       lead(ts_us) OVER w - ts_us AS gap_us
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,


    "q_attrib_linear" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |c AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, CAST(round(value * 100) AS BIGINT) AS p_cents,
        |             ts_us - 86400000000 AS lo, ts_us AS hi
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT c.event_id, p.p_id, p.p_cents,
        |             count(*) OVER (PARTITION BY p.p_id) AS n
        |      FROM c JOIN p ON c.user_id = p.user_id AND c.ts_us BETWEEN p.lo AND p.hi)
        |SELECT event_id, count(*) AS n_purchases,
        |       CAST(sum(p_cents * 1000000 // n) AS BIGINT) AS credit_ucents
        |FROM t GROUP BY 1""".stripMargin,


    "q_attrib_position" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |c AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, CAST(round(value * 100) AS BIGINT) AS p_cents,
        |             ts_us - 86400000000 AS lo, ts_us AS hi
        |      FROM e WHERE event_type = 'purchase'),
        |t AS (SELECT c.event_id, c.ts_us, p.p_id, p.p_cents,
        |             count(*) OVER (PARTITION BY p.p_id) AS n,
        |             row_number() OVER (PARTITION BY p.p_id ORDER BY c.ts_us, c.event_id) AS pos
        |      FROM c JOIN p ON c.user_id = p.user_id AND c.ts_us BETWEEN p.lo AND p.hi),
        |cr AS (SELECT event_id,
        |              CASE WHEN n = 1 THEN p_cents * 1000000
        |                   WHEN n = 2 THEN p_cents * 1000000 // 2
        |                   WHEN pos = 1 OR pos = n THEN p_cents * 400000
        |                   ELSE p_cents * 200000 // (n - 2) END AS credit
        |       FROM t)
        |SELECT event_id, count(*) AS n_purchases,
        |       CAST(sum(credit) AS BIGINT) AS credit_ucents
        |FROM cr GROUP BY 1""".stripMargin,


    "q_ab_lift" ->
      """WITH per AS (SELECT user_id,
        |                    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |             FROM events GROUP BY 1),
        |a AS (SELECT least(CAST(floor(
        |               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |               / 4294967296.0 * 2) AS BIGINT), 1) AS arm,
        |             conv
        |      FROM per)
        |SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(conv) AS BIGINT) AS n_conv,
        |       CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate
        |FROM a GROUP BY 1""".stripMargin,


    "q_ab_bootstrap" -> {
      val caseArms = Sampling.poisson1Cum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"""WITH per AS (SELECT user_id,
         |                    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         |                    least(CAST(floor(
         |                      CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |                      / 4294967296.0 * 2) AS BIGINT), 1) AS arm
         |             FROM events GROUP BY 1),
         |rep AS (SELECT arm, conv, user_id, unnest(range(1, 101)) AS b FROM per),
         |wts AS (SELECT arm, b, conv, CASE $caseArms ELSE 8 END AS w
         |        FROM (SELECT arm, b, conv,
         |                CAST(concat('0x', substr(md5(concat(CAST(user_id AS VARCHAR), ':',
         |                     CAST(b AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 AS u
         |              FROM rep)),
         |rates AS (SELECT arm, b, CAST(sum(w * conv) AS BIGINT) AS num,
         |                 CAST(sum(w) AS BIGINT) AS den
         |          FROM wts GROUP BY 1, 2),
         |rr AS (SELECT arm, b, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS rate
         |       FROM rates WHERE den > 0),
         |rk AS (SELECT arm, rate,
         |              row_number() OVER (PARTITION BY arm ORDER BY rate, b) AS rn,
         |              count(*) OVER (PARTITION BY arm) AS bn
         |       FROM rr),
         |ci AS (SELECT arm,
         |              min(CASE WHEN rn = greatest((bn * 25 + 999) // 1000, 1)
         |                  THEN rate END) AS ci_lo,
         |              min(CASE WHEN rn = bn + 1 - greatest((bn * 25 + 999) // 1000, 1)
         |                  THEN rate END) AS ci_hi
         |       FROM rk GROUP BY 1),
         |pt AS (SELECT arm, CAST(count(*) AS BIGINT) AS n_units,
         |              CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rate
         |       FROM per GROUP BY 1)
         |SELECT pt.arm, pt.n_units, pt.rate, ci.ci_lo, ci.ci_hi
         |FROM pt LEFT JOIN ci ON pt.arm = ci.arm""".stripMargin
    },


    "q_trend" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |             CAST(sum(day) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
        |             CAST(sum(day * day) AS BIGINT) AS sxx,
        |             CAST(sum(day * cnt) AS BIGINT) AS sxy
        |      FROM d GROUP BY 1),
        |nd AS (SELECT event_type, n_days, sx, sy,
        |              CAST(n_days AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |              CAST(n_days AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
        |       FROM m)
        |SELECT event_type, n_days,
        |       CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope,
        |       CASE WHEN den > 0 THEN
        |         (CAST(sy AS DOUBLE)
        |          - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * CAST(sx AS DOUBLE))
        |         / CAST(n_days AS DOUBLE) END AS intercept
        |FROM nd""".stripMargin,


    "q_session_features" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |                      WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |                      ELSE 0 END AS nw
        |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |       FROM s1)
        |SELECT event_id, user_id, session_id, event_type,
        |       CAST(row_number() OVER (PARTITION BY user_id, session_id
        |                               ORDER BY ts_us, event_id) AS BIGINT) AS pos_in_session,
        |       ts_us - min(ts_us) OVER (PARTITION BY user_id, session_id) AS t_since_start_us
        |FROM s2""".stripMargin,


    "q_spike_days" ->
      """WITH d AS (SELECT event_type AS k, epoch_ns(ts) // 86400000000000 AS day,
        |                  CAST(count(*) AS DOUBLE) AS v
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT k, v, CAST(row_number() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS r
        |      FROM d),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS m FROM d GROUP BY k),
        |ps AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.75 AS DOUBLE)]) AS p),
        |spec AS (SELECT k, p, m, CAST(m - 1 AS DOUBLE) * p + 1 AS h
        |         FROM m CROSS JOIN ps),
        |spec2 AS (
        |  SELECT k, p, m, CAST(floor(h) AS BIGINT) AS lo,
        |         least(CAST(floor(h) AS BIGINT) + 1, m) AS hi, h - floor(h) AS frac
        |  FROM spec
        |),
        |q AS (SELECT s.k, s.p, rl.v + s.frac * (rh.v - rl.v) AS q
        |      FROM spec2 s JOIN r rl ON rl.k = s.k AND rl.r = s.lo
        |                   JOIN r rh ON rh.k = s.k AND rh.r = s.hi),
        |st AS (SELECT k, max(CASE WHEN p = 0.25 THEN q END) AS q1,
        |              max(CASE WHEN p = 0.5  THEN q END) AS med,
        |              max(CASE WHEN p = 0.75 THEN q END) AS q3
        |       FROM q GROUP BY k),
        |sc AS (SELECT d.k AS event_type, d.day, CAST(d.v AS BIGINT) AS cnt,
        |              CASE WHEN st.q3 > st.q1
        |                   THEN (d.v - st.med) / (st.q3 - st.q1) END AS r
        |       FROM d JOIN st ON st.k = d.k)
        |SELECT event_type, day, cnt, r FROM sc WHERE abs(r) > 2.0""".stripMargin,


    // NULLS FIRST pins DuckDB to Spark's ASC-window default: the
    // injected NULL rows (event_id % 97, mirroring the Spark side)
    // get cd = nulls_in_key / rows_in_key on both engines.
    "q_cume_dist" ->
      """WITH e AS (SELECT event_id, event_type,
        |                  CASE WHEN event_id % 97 = 0 THEN NULL
        |                       ELSE CAST(round(value * 100) AS BIGINT) END AS cents
        |           FROM events)
        |SELECT event_id, event_type, cents,
        |       cume_dist() OVER (PARTITION BY event_type
        |                         ORDER BY cents NULLS FIRST) AS cd
        |FROM e""".stripMargin,


    "q_autocorr" ->
      """WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |p AS (SELECT cnt, lag(cnt) OVER (ORDER BY day) AS prev FROM d),
        |c AS (SELECT CAST(round(cnt * 1) AS BIGINT) AS x,
        |             CAST(round(prev * 1) AS BIGINT) AS y
        |      FROM p WHERE prev IS NOT NULL),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM c)
        |SELECT 'lag1' AS series, n,
        |       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |       THEN CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |            / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
        |                         - CAST(sx AS HUGEINT) * sx AS DOUBLE))
        |               * sqrt(CAST(CAST(n AS HUGEINT) * syy
        |                           - CAST(sy AS HUGEINT) * sy AS DOUBLE))) END AS r
        |FROM m""".stripMargin,


    "q_survival" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |per AS (SELECT user_id, min(us) AS t0,
        |               min(CASE WHEN event_type = 'purchase' THEN us END) AS tc
        |        FROM e GROUP BY 1),
        |mx AS (SELECT max(us) AS amax FROM e),
        |dur AS (SELECT CASE WHEN tc IS NOT NULL THEN (tc - t0) // 86400000000
        |                    ELSE (amax - t0) // 86400000000 END AS day,
        |               CAST(CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS ev
        |        FROM per CROSS JOIN mx),
        |durf AS (SELECT * FROM dur WHERE day < 3660),
        |days AS (SELECT day, CAST(sum(ev) AS BIGINT) AS n_event,
        |                CAST(count(*) AS BIGINT) AS n_total
        |         FROM durf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM durf),
        |risky AS (SELECT day, n_event,
        |                 nn.n - CAST(sum(n_total) OVER (ORDER BY day
        |                   ROWS UNBOUNDED PRECEDING) AS BIGINT) + n_total AS n_risk
        |          FROM days CROSS JOIN nn),
        |fs AS (SELECT list_sort(list({'day': day,
        |                 'f': 1.0 - CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE)})) AS fs
        |       FROM risky WHERE n_event > 0)
        |SELECT r.day, r.n_event, r.n_risk,
        |       list_reduce(list_prepend(1.0,
        |         list_transform(list_filter(fs.fs, x -> x.day <= r.day), x -> x.f)),
        |         (a, b) -> a * b) AS survival
        |FROM risky r CROSS JOIN fs WHERE r.n_event > 0""".stripMargin,


    "q_engagement" ->
      """WITH ud AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |            FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS dmax FROM ud),
        |act AS (SELECT user_id, CAST(count(*) AS BIGINT) AS days_active
        |        FROM ud CROSS JOIN mx WHERE day > dmax - 28 GROUP BY 1)
        |SELECT days_active, CAST(count(*) AS BIGINT) AS n_users
        |FROM act GROUP BY 1""".stripMargin,


    "q_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |st AS (SELECT event_type,
        |              lead(event_type) OVER (PARTITION BY user_id
        |                ORDER BY ts_us, event_id) AS nxt
        |       FROM e),
        |pr AS (SELECT event_type AS from_type, nxt AS to_type,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM st WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
        |      FROM pr GROUP BY from_type)
        |SELECT pr.from_type, pr.to_type, pr.n,
        |       CAST(pr.n AS DOUBLE) / t.tot AS p
        |FROM pr JOIN t USING (from_type)""".stripMargin,


    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |c AS (SELECT user_id, min(ts_us) AS c_t FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |pp AS (SELECT e.user_id, c.c_t, min(e.ts_us) AS p_t
        |       FROM e JOIN c USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_us > c.c_t
        |       GROUP BY e.user_id, c.c_t),
        |v AS (SELECT 'all' AS k, CAST(p_t - c_t AS DOUBLE) AS v FROM pp),
        |r AS (SELECT k, v,
        |             CAST(row_number() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS r
        |      FROM v),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS m FROM v GROUP BY k),
        |ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
        |                      CAST(0.99 AS DOUBLE)]) AS p),
        |spec AS (SELECT k, p, m, CAST(m - 1 AS DOUBLE) * p + 1 AS h
        |         FROM m CROSS JOIN ps),
        |spec2 AS (
        |  SELECT k, p, m, CAST(floor(h) AS BIGINT) AS lo,
        |         least(CAST(floor(h) AS BIGINT) + 1, m) AS hi, h - floor(h) AS frac
        |  FROM spec
        |)
        |SELECT s.k AS seg, s.p, rl.v + s.frac * (rh.v - rl.v) AS q, s.m AS m
        |FROM spec2 s JOIN r rl ON rl.k = s.k AND rl.r = s.lo
        |             JOIN r rh ON rh.k = s.k AND rh.r = s.hi""".stripMargin,


    "q_growth" ->
      """WITH f AS (SELECT user_id, min(epoch_ns(ts) // 86400000000000) AS day
        |           FROM events GROUP BY 1),
        |n AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
        |SELECT day, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM n""".stripMargin,


    "q_entry_exit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |r AS (SELECT user_id, event_type,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS ra,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY ts_us DESC, event_id DESC) AS rd
        |      FROM e),
        |u AS (SELECT a.user_id, a.event_type AS entry_type, d.event_type AS exit_type
        |      FROM (SELECT user_id, event_type FROM r WHERE ra = 1) a
        |      JOIN (SELECT user_id, event_type FROM r WHERE rd = 1) d
        |        USING (user_id))
        |SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1, 2""".stripMargin,


    // exact-integer Fano factor: (n·Σc² − (Σc)²)/(n·Σc), truncating
    // day buckets (the bucketEpoch // convention)
    "q_burstiness" ->
      """WITH d AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |                  CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS days_active,
        |             CAST(sum(c) AS BIGINT) AS n_events,
        |             CAST(sum(c * c) AS BIGINT) AS ss
        |      FROM d GROUP BY 1)
        |SELECT user_id, days_active, n_events,
        |       CAST(n_events AS DOUBLE) / CAST(days_active AS DOUBLE) AS mean_daily,
        |       CASE WHEN days_active > 1 THEN
        |         CAST(days_active * ss - n_events * n_events AS DOUBLE)
        |           / CAST(days_active * n_events AS DOUBLE) END AS fano
        |FROM a""".stripMargin,


    // log-free diversity: exact-long numerators, one division each
    "q_type_diversity" ->
      """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |             CAST(count(*) AS BIGINT) AS n_types,
        |             CAST(sum(c * c) AS BIGINT) AS ss
        |      FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |       CAST(n_events * n_events - ss AS DOUBLE)
        |         / CAST(n_events * n_events AS DOUBLE) AS simpson,
        |       CAST(n_events * n_events AS DOUBLE) / CAST(ss AS DOUBLE) AS eff_types
        |FROM a""".stripMargin,


    "q_churn" ->
      """WITH l AS (SELECT user_id, max(epoch_ns(ts) // 86400000000000) AS last_day
        |           FROM events GROUP BY 1),
        |a AS (SELECT max(last_day) AS amax FROM l)
        |SELECT l.user_id, l.last_day, a.amax - l.last_day AS days_inactive,
        |       CAST(a.amax - l.last_day >= 7 AS INTEGER) AS churned
        |FROM l CROSS JOIN a""".stripMargin,


    // floor-div of the µs epoch by the 900 s step (pmod form, exact
    // for pre-1970), then the 4 consecutive step-aligned starts
    "q_hopping" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type, value FROM events),
        |f AS (SELECT (t - ((t % 900000000) + 900000000) % 900000000) // 900000000
        |             AS fd, event_type, value FROM e),
        |x AS (SELECT unnest(generate_series(fd - 3, fd)) AS w, event_type, value
        |      FROM f)
        |SELECT w * 900 AS bucket, event_type, count(*) AS n,
        |       sum(round(value * 100)) / 100.0 AS sum_value
        |FROM x GROUP BY 1, 2""".stripMargin,


    "q_type_seqs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |           FROM events),
        |l AS (SELECT event_type,
        |             lead(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS t1,
        |             lead(event_type, 2) OVER (PARTITION BY user_id
        |               ORDER BY ts_us, event_id) AS t2
        |      FROM e)
        |SELECT event_type || ' > ' || t1 || ' > ' || t2 AS seq,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM l WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, seq LIMIT 50""".stripMargin,


    "q_seasonality" ->
      """SELECT isodow(ts) AS isodow, hour(ts) AS hour, count(*) AS n,
        |       sum(round(value * 100)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,


    "q_decayed_pop" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |                  CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS dmax FROM d),
        |w AS (SELECT event_type,
        |             CAST(cnt AS DOUBLE) / (1.0 + CAST(mx.dmax - day AS DOUBLE)) AS w
        |      FROM d CROSS JOIN mx)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       list_reduce(list_sort(list(w)), (a, b) -> a + b) AS decayed_score
        |FROM w GROUP BY 1""".stripMargin,
  )
}
