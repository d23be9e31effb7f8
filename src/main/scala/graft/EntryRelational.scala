package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Relational core: the TPC-H subset, windows, set ops, pivots, SCD, profiling, robust statistics over lineitem/orders.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryRelational {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── extension surface: SQL-TEXT kernels under the hash gate ─────
    // The same fingerprint + a native vector dot, written as a SQL
    // string through GraftExtensions (spark.sql.extensions) — pins
    // that the SQL-registered kernels resolve to the identical
    // Catalyst trees as the Column API (q_simhash is the Column twin)
    // in the driver gate, not just in specs.
    "q_sql_kernels" -> ((s, dir) => {
      GraftExtensions.register(s)
      Tables(s, dir, "documents").createOrReplaceTempView("graft_docs_v")
      Tables(s, dir, "embeddings").createOrReplaceTempView("graft_emb_v")
      s.sql("""
        SELECT d.doc_id,
               simhash64(split(d.text, ' ')) AS fp,
               vec_dot(CAST(e.embedding AS ARRAY<DOUBLE>),
                       CAST(e.embedding AS ARRAY<DOUBLE>)) AS self_dot
        FROM graft_docs_v d JOIN graft_emb_v e ON e.vec_id = d.doc_id % 500""")
    }),


    // ── temporal: backward as-of join (click ← latest prior purchase)
    // The feature-lookup join at µs precision: one shuffle by user_id,
    // union + running-last window — no per-row range scan.
    "q_asof" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        Events.epochMicros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = base.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts_us"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      TemporalJoins.asofJoin(clicks, purchases, "user_id", "ts_us", "p_ts_us",
        valueCols = Seq("p_event_id", "p_ts_us", "p_value"), rightTieCol = "p_event_id")
    }),


    // ── temporal: FORWARD as-of join (next purchase at/after click) ─
    // The label-lookahead dual of q_asof: same one-shuffle union
    // trick traversed descending. Ties resolve to the lowest purchase
    // event id; clicks with no later purchase keep nulls.
    "q_asof_fwd" -> ((s, dir) => {
      val base = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        Events.epochMicros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      val clicks = base.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts_us"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      TemporalJoins.asofJoinForward(clicks, purchases, "user_id", "ts_us", "p_ts_us",
        valueCols = Seq("p_event_id", "p_ts_us", "p_value"), rightTieCol = "p_event_id")
    }),


    // ── curation: snapshot merge-upsert with provenance actions ─────
    // The apply side of q_snapshot_diff: current (doc_id%4≠3) merged
    // with an incoming batch (odd ids, text revised when id%3=0) —
    // incoming wins collisions, current-only rows are kept, actions
    // label every row (inserted/updated/unchanged/kept) so
    // incremental consumers can skip no-ops.
    "q_merge_upsert" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val current = docs.filter(col("doc_id") % 4 =!= 3)
        .select(col("doc_id"), col("text"), col("source"))
      val incoming = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(lit("v2 "), col("text")))
            .otherwise(col("text")).as("text"),
          col("source"))
      Curation.mergeSnapshot(current, incoming, "doc_id", Seq("text", "source"))
    }),


    // ── OLAP: small-quantity orders vs per-part average (Q17 shape) ─
    // The correlated-scalar-subquery pattern ("rows under 20% of
    // their own group's average"), decorrelated Catalyst-style into a
    // per-key aggregate + equi-join — never a per-row re-scan. The
    // filtered dim broadcasts into both the fact scan and the
    // aggregate. Exactness: l_quantity is integer-valued (sum exact
    // in any order), the revenue sum runs in cents (the fixed-point
    // trick), avg and the 0.2 threshold are single fixed-order IEEE
    // ops.
    "q17_smallqty" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val pk = Tables(s, dir, "part").filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val fact = li.join(broadcast(pk), col("l_partkey") === col("p_partkey"))
      val avgq = fact.groupBy(col("l_partkey").as("__pk"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      fact.join(avgq, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(count(lit(1)).cast("long").as("n_small"),
          (sum(round(col("l_extendedprice") * 100)).cast("double") / 100.0 / 7.0)
            .as("avg_yearly"))
    }),


    // ── curation: exact fixed-width length histogram ────────────────
    "q_histogram" -> ((s, dir) => {
      Curation.histogram(Tables(s, dir, "documents"), "n_chars", buckets = 10)
    }),


    // ── curation: referential-integrity orphan audit ────────────────
    // Planted: every 100th order re-enters pointing at a customer key
    // shifted past the dimension's range — those keys (and ONLY
    // those) must surface with their row counts.
    "q_fk_orphans" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val planted = orders.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_custkey", col("o_custkey") + 900000000L)
      Curation.fkOrphans(orders.unionByName(planted), "o_custkey",
        Tables(s, dir, "customer"), "c_custkey")
    }),


    // ── curation: per-column completeness profile ───────────────────
    // Planted: one row with NULL text/source and one with blank text
    // and NULL keys, so every counter in the report is exercised.
    "q_null_profile" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val extra1 = s.range(1).select(lit(999000001L).as("doc_id"),
        lit(null).cast("string").as("text"), lit("xx").as("lang"),
        lit(null).cast("string").as("source"), lit(0L).as("n_chars"))
      val extra2 = s.range(1).select(lit(null).cast("long").as("doc_id"),
        lit("   ").as("text"), lit(null).cast("string").as("lang"),
        lit("srcX").as("source"), lit(null).cast("long").as("n_chars"))
      Curation.nullProfile(docs.unionByName(extra1).unionByName(extra2))
    }),


    // ── set ops: users who clicked but never purchased ──────────────
    "q_setops" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      // no .distinct() on the left: Spark's except is EXCEPT DISTINCT
      // already — an explicit one adds a redundant shuffle
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .except(ev.filter(col("event_type") === "purchase" && col("value") > 150)
          .select(col("user_id")))
    }),


    // ── relational baseline: TPC-H Q3-style 3-way join + agg ────────
    // customer (dim, broadcastable) ⋈ orders ⋈ lineitem (facts): the
    // segment filter pushes to the customer scan, the date filters to
    // the fact scans, and Catalyst broadcasts the filtered dim —
    // shuffle only on o_orderkey for the final aggregate.
    "q3_join" -> ((s, dir) => {
      val cut = lit("1998-06-01").cast("timestamp")
      Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(Tables(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(Tables(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000.0)
          .as("revenue"))
    }),


    // ── relational baseline: TPC-H Q5-style 6-table join ────────────
    // region→nation are broadcast dims, supplier/customer broadcast at
    // test scale (shuffle at cluster scale), facts join on their keys;
    // Catalyst orders the join tree — nothing is hand-scheduled.
    "q5_join" -> ((s, dir) => {
      Tables(s, dir, "customer").as("c")
        .join(Tables(s, dir, "orders").as("o")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("c.c_custkey") === col("o.o_custkey"))
        .join(Tables(s, dir, "lineitem").as("l"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .join(Tables(s, dir, "supplier").as("s"),
          col("l.l_suppkey") === col("s.s_suppkey") &&
            col("c.c_nationkey") === col("s.s_nationkey"))
        .join(Tables(s, dir, "nation").as("n"),
          col("s.s_nationkey") === col("n.n_nationkey"))
        .join(Tables(s, dir, "region").as("r"),
          col("n.n_regionkey") === col("r.r_regionkey") && col("r.r_name") === "ASIA")
        .groupBy(col("n.n_name"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000.0)
            .as("revenue"))
    }),


    // ── relational baseline: TPC-H Q4-style EXISTS semi-join ────────
    // Orders placed in 1995Q1 that still had a line shipping after
    // Feb, counted per priority. The EXISTS shape compiles to a LEFT
    // SEMI hash join on o_orderkey — lineitem is filtered BEFORE the
    // join (predicate reaches its scan) and never duplicates order
    // rows, so no distinct is needed on either side.
    "q4_semi" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val dt = o.schema("o_orderdate").dataType
      val li = Tables(s, dir, "lineitem")
      val lateLines = li
        .filter(col("l_shipdate") > lit("1995-02-01").cast(li.schema("l_shipdate").dataType))
        .select(col("l_orderkey"))
      o.filter(col("o_orderdate") >= lit("1995-01-01").cast(dt)
          && col("o_orderdate") < lit("1995-04-01").cast(dt))
        .join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("order_count"))
    }),


    // ── relational baseline: TPC-H Q10-style top returned-revenue ───
    // The scale-right plan order: aggregate the R-flagged revenue per
    // customer FIRST (map-side combine on compact keys), take the
    // top 20 on the exact integer cent sum (TakeOrderedAndProject),
    // and only THEN join the 20-row head to `customer` for names —
    // the name join broadcasts 20 rows instead of shuffling the
    // customer dimension.
    "q10_returns" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val top = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("l_extendedprice") * 100)
            * (lit(100L) - round(col("l_discount") * 100))).cast("long")
            .as("rev_ucents"),
          count(lit(1)).cast("long").as("n_items"))
        .orderBy(col("rev_ucents").desc, col("o_custkey")).limit(20)
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .join(broadcast(top), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"),
          (col("rev_ucents") / 10000.0).as("revenue"), col("n_items"))
    }),


    // ── relational baseline: TPC-H Q14-style promo revenue share ───
    // Conditional-sum ratio over one month of lineitem ⋈ part; both
    // revenue sums exact integer µcents, ONE double division each at
    // the end. The date range reaches the lineitem scan.
    "q14_promo" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val dt = li.schema("l_shipdate").dataType
      val rev = round(col("l_extendedprice") * 100) *
        (lit(100L) - round(col("l_discount") * 100))
      li.filter(col("l_shipdate") >= lit("1995-09-01").cast(dt)
          && col("l_shipdate") < lit("1995-10-01").cast(dt))
        .join(Tables(s, dir, "part").select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L)))
            .cast("long").as("promo_ucents"),
          sum(rev).cast("long").as("total_ucents"))
        .select(col("promo_ucents"), col("total_ucents"),
          (lit(100.0) * col("promo_ucents").cast("double")
            / col("total_ucents").cast("double")).as("promo_share"))
    }),


    // ── relational baseline: TPC-H Q19-style disjunctive predicates ─
    // OR of three (brand, size-range, quantity-range) conjunctions
    // across the lineitem ⋈ part join — the predicate shape that
    // exercises CNF extraction (the shared l_quantity/p_size bounds
    // can still prune) without hand-flattening.
    "q19_disjunct" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val rev = round(col("l_extendedprice") * 100) *
        (lit(100L) - round(col("l_discount") * 100))
      li.join(Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(count(lit(1)).cast("long").as("n_items"),
          (sum(rev) / 10000.0).as("revenue"))
    }),


    // ── relational baseline: TPC-H Q13-style customer distribution ──
    // LEFT OUTER join so order-less customers keep a row, count of
    // the NULLABLE order key per customer (0 for them), then the
    // histogram — the two-level aggregate over an outer join.
    "q13_custdist" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_custkey"))
      val o = Tables(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).cast("long").as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("long").as("custdist"))
    }),


    // ── relational baseline: TPC-H Q22-style dormant rich customers ─
    // Scalar-subquery threshold (positive-balance mean) done as an
    // EXACT integer compare — cents·n > Σcents, no FP mean — then a
    // LEFT ANTI join against RECENT orders ("no order since 2000")
    // and a broadcast-nation rollup; the date filter reaches the
    // orders scan before the anti join.
    "q22_noorders" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("__cents"))
      val thr = c.filter(col("__cents") > 0L)
        .agg(sum(col("__cents")).as("__sum"), count(lit(1)).as("__cnt"))
      val rich = c.crossJoin(broadcast(thr))
        .filter(col("__cents") * col("__cnt") > col("__sum"))
      val o = Tables(s, dir, "orders")
      val recent = o.filter(col("o_orderdate")
          >= lit("2000-01-01").cast(o.schema("o_orderdate").dataType))
        .select(col("o_custkey"))
      rich.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("long").as("numcust"),
          (sum(col("__cents")) / 100.0).as("totacctbal"))
    }),


    // ── relational baseline: TPC-H Q18-style subquery join (large
    // orders). The IN-subquery shape: orders joined (inner — sum_qty
    // is projected from the aggregate side) against a grouped HAVING
    // subquery, never a correlated per-row subquery.
    "q18_join" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      Tables(s, dir, "orders").as("o")
        .join(big.select(col("l_orderkey"), col("sum_qty")),
          col("o.o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("sum_qty"))
    }),


    // ── relational baseline: ROLLUP hierarchy aggregation ───────────
    // Partial totals per (returnflag, linestatus), per returnflag, and
    // grand total in ONE pass — Spark expands grouping sets before the
    // exchange, so it stays a single shuffle. Subtotal rows are
    // labelled via grouping() (NOT coalesce-on-NULL, which would
    // conflate a genuine NULL group value with a ROLLUP total on
    // nullable columns).
    "q_rollup" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("__g_rf"),
          grouping(col("l_linestatus")).as("__g_ls"))
        .select(
          when(col("__g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
          when(col("__g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
          col("sum_qty"), col("n"))
    }),


    // ── relational baseline: CUBE over a join (all grouping sets) ───
    // All four grouping sets of (returnflag, orderpriority) in ONE
    // pass over the joined fact — Spark expands the sets before the
    // exchange (one shuffle), and the join key side is the orders dim
    // projected to two columns. Subtotals labelled via grouping(),
    // same NULL-safety rationale as q_rollup.
    "q_cube" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .cube(col("l_returnflag"), col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("__g_rf"),
          grouping(col("o_orderpriority")).as("__g_pr"))
        .select(
          when(col("__g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
          when(col("__g_pr") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("pri"),
          col("sum_qty"), col("n"))
    }),


    // ── relational baseline: per-language difficulty deciles ────────
    // ntile + percent_rank + cume_dist over a PARTITIONED window with
    // a unique (n_chars, doc_id) order — the curriculum-bucketing
    // shape as ranking functions (vs q_curriculum's global
    // range-exchange rank). Unique ordering makes both FP ranks exact
    // integer ratios, identical cross-engine; tile cast to long
    // (DuckDB ntile returns BIGINT).
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          ntile(10).over(w).cast("long").as("tile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
    }),


    // ── curation: 2-D Pareto frontier (cost/value skyline) ──────────
    // Per user: event count (cost, minimize) vs exact purchase-value
    // cents (value, maximize); keep the users no other user beats on
    // both. Reduce-per-distinct-cost + range-exchange prefix max +
    // broadcast-back — never the all-pairs NOT EXISTS the oracle runs.
    "q_pareto" -> ((s, dir) => {
      val per = Tables(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100)).cast("long").as("cents"))
      Curation.paretoFrontier(per, "n_events", "cents")
        .select(col("user_id"), col("n_events"), col("cents"))
    }),


    // ── events: hot-key skew report (the saltedJoin sizing input) ───
    "q_skew_report" -> ((s, dir) => {
      Skew.skewReport(Tables(s, dir, "events"), "user_id",
        topK = 20, targetRows = 1000L)
    }),


    // ── events: interval-overlap join (sessions × purchase windows) ─
    // True interval×interval join — how many 1-hour pre-purchase
    // windows intersect each session. Grid equi-join with the
    // first-overlap-bucket dedup (exactly one row per pair, no
    // distinct); the oracle is the direct theta join.
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val sessions = Events.sessionize(ev, gapMicros = 1800000000L)
        .select(col("user_id"), col("session_id"),
          col("t_start_us"), col("t_end_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          (Events.epochMicros(col("ts")) - 3600000000L).as("w_lo"),
          Events.epochMicros(col("ts")).as("w_hi"))
      TemporalJoins.intervalOverlapJoin(sessions, "t_start_us", "t_end_us",
          purchases, "w_lo", "w_hi", "user_id", bucketWidth = 86400000000L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).cast("long").as("n_purchase_windows"))
    }),


    // ── LLM-pipeline: schema-evolution-tolerant corpus union ────────
    // Two "generations" of documents (v1 narrow, v2 with lang +
    // n_chars) united BY NAME with null fill, then a per-source
    // completeness audit — the ingest shape a positional union
    // silently corrupts.
    "q_union_evolved" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("source"))
      val v2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("source"), col("lang"),
          col("n_chars"))
      Curation.unionEvolved(Seq(v1, v2))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          count(col("lang")).cast("long").as("n_with_lang"),
          sum(coalesce(col("n_chars"), lit(0L))).cast("long").as("sum_chars_v2"))
    }),


    // ── events: SCD Type-2 validity intervals per user ──────────────
    // The warehouse dimension shape for point-in-time joins: one row
    // per run of consecutive identical event types, half-open µs
    // intervals, NULL valid_to on the current run.
    "q_scd2" -> ((s, dir) => {
      Events.scd2Intervals(Tables(s, dir, "events"))
    }),


    // ── scale lever: salted shuffle join (skew mitigation) ──────────
    // The manual skew lever driver-gated: events fanned over 8 salts
    // against a per-user dim, re-aggregated — the oracle runs the
    // PLAIN join, pinning that salting is a plan-level rewrite with
    // identical semantics (SkewSpec pins the same equality in-mem).
    "q_skew_join" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val dim = Tables(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("user_events"))
      Skew.saltedJoin(ev, dim, "user_id", salts = 8, saltSrc = col("event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_events")).cast("long").as("sum_ue"))
    }),


    // ── relational baseline: TPC-H Q1-style aggregation ─────────────
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100)) / 100.0).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)) / 10000.0)
            .as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sum(round(col("l_discount") * 100)) / 100.0 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),


    // ── events: trailing 7-day rolling activity per user ────────────
    "q_rolling" -> ((s, dir) => {
      Events.rollingDaily(Tables(s, dir, "events"), windowDays = 7)
    }),


    // ── events: dense daily grid with zero-filled silent days ───────
    "q_gap_fill" -> ((s, dir) => {
      Events.gapFillDaily(Tables(s, dir, "events"))
    }),


    // ── curation report: exact per-source length quantiles ──────────
    "q_quantiles" -> ((s, dir) => {
      Curation.quantilesByKey(Tables(s, dir, "documents"), "source", "n_chars",
        Seq(0.5, 0.9, 0.99))
    }),


    // ── events: per-user lag features (explicit-lag moving stats) ───
    "q_lag_features" -> ((s, dir) => {
      Events.lagFeatures(Tables(s, dir, "events"))
    }),


    // ── OLAP: TPC-H Q6 forecasting-revenue (the pushdown showcase) ──
    // All three predicates reach the parquet scan (PushedFilters —
    // plan-pinned); revenue = Σ cents(ep)·cents(disc) exact
    // integer-valued doubles, ONE /10000.0.
    "q6_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ts = li.schema("l_shipdate").dataType
      li.filter(col("l_shipdate") >= lit("1995-01-01").cast(ts)
          && col("l_shipdate") < lit("1996-01-01").cast(ts)
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * 100) * round(col("l_discount") * 100))
            / 10000.0).as("revenue"),
          count(lit(1)).as("n"))
    }),


    // ── curation: exact one-pass Pearson correlation per key ────────
    // Six long moments + decimal(38,0) final algebra (HUGEINT twin in
    // the oracle) — bit-exact where two-pass FP corr is not.
    "q_corr" -> ((s, dir) => {
      Curation.pearsonByKey(Tables(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_discount")
    }),


    // ── relational: explicit GROUPING SETS (the cube/rollup sibling) ─
    "q_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupingSets(Seq(Seq(col("source")), Seq(col("lang"))),
          col("source"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
          grouping(col("source")).as("__gs"), grouping(col("lang")).as("__gl"))
        .select(
          when(col("__gs") === 1, lit("ALL")).otherwise(col("source")).as("source"),
          when(col("__gl") === 1, lit("ALL")).otherwise(col("lang")).as("lang"),
          col("n"), col("sum_chars"))
    }),


    // ── curation: robust (median/IQR) per-type value scaling ────────
    // The outlier-insensitive twin of q_zscore, on the exact type-7
    // quantile machinery; corpus never shuffles (broadcast quartiles).
    "q_robust_scale" -> ((s, dir) => {
      Curation.robustScale(
        Tables(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_id", "event_type", "value")
    }),


    // ── events: per-user activity pivot (long → wide) ───────────────
    // The relational PIVOT with an EXPLICIT value list (open-ended
    // pivot would scan once just to discover columns — and make the
    // output schema data-dependent, which no gate could pin). One
    // hash aggregate; each cell is an exact conditional count.
    "q_pivot" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count().na.fill(0L)
    }),


    // ── OLAP: unpivot (wide → long melt) + per-measure profile ──────
    // The inverse of q_pivot: lineitem's four value columns melt to
    // (measure, value) rows — the tidy form feeding generic per-
    // metric profiling. Cents-exact sums per measure.
    "q_unpivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).cast("long").as("n"),
          (sum(round(col("value") * 100)).cast("double") / 100.0).as("total"))
    }),


    // ── events: per-type z-score standardization (exact cents form) ─
    // z = (c·n − Σc)/√(n·Σc² − (Σc)²) — exact long numerators, one
    // sqrt, one division; the order-dependent FP-moment pitfall of
    // the textbook (x−μ)/σ never appears.
    "q_zscore" -> ((s, dir) => {
      Events.zscoreByKey(Tables(s, dir, "events"), "event_id", "event_type", "value")
    }),


    // ── events: per-type value winsorization (p05/p95 clip) ─────────
    // Outlier treatment that KEEPS every row: whale purchases count
    // at the ceiling. Exact type-7 quantiles broadcast back; corpus
    // never shuffles.
    "q_winsorize" -> ((s, dir) => {
      Curation.winsorizeByKey(
        Tables(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_id"), col("event_type"), col("value")),
        "event_id", "event_type", "value")
    }),


    // ── LLM-pipeline: per-source top-5 docs, window-free ────────────
    // TopKAgg bounded partial agg instead of the per-key window sort:
    // each task ships ≤ 5 (id, score) pairs per source. Score =
    // n_chars (exact ints in double), tie → lowest doc_id.
    "q_top_per_key" -> ((s, dir) => {
      Curation.topKPerKey(Tables(s, dir, "documents"), "source", "doc_id",
        "n_chars", k = 5)
    }),


    // ── LLM-pipeline: Gini concentration of the char budget ─────────
    // One number for "is the corpus' character mass spread or locked
    // in a few giant documents" — exact rank formula over ONE range
    // exchange, never a single-partition sort.
    "q_gini" -> ((s, dir) => {
      Curation.giniConcentration(Tables(s, dir, "documents"), "doc_id", "n_chars")
    }),


    // ── LLM-pipeline: exact heavy hitters, bounded-state candidates ─
    // All tokens with frequency > n/100 via Misra-Gries candidates
    // (≤ 100 counters per task, never a vocabulary-sized shuffle) +
    // one exact verification pass — output equals the oracle's plain
    // HAVING threshold, deterministically, though MG state is not.
    "q_heavy_hitters" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      Curation.heavyHitters(toks, "term", k = 100)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // forward as-of: the oracle is the DIRECT theta join + first-row
    // pick — an independent statement of the semantics (the engine's
    // descending union trick must reproduce it)
    "q_asof_fwd" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS p_ts_us, event_id AS p_event_id, value AS p_value
        |      FROM e WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts_us, p.p_event_id, p.p_ts_us, p.p_value,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY p.p_ts_us, p.p_event_id) AS rn
        |  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.p_ts_us >= c.ts_us
        |)
        |SELECT event_id, user_id, ts_us, p_event_id, p_ts_us, p_value
        |FROM j WHERE rn = 1""".stripMargin,


    "q_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS p_ts_us, event_id AS p_event_id, value AS p_value
        |      FROM e WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id, ts_us, 1 AS side, 9223372036854775807 AS tie, event_id,
        |         CAST(NULL AS STRUCT(p_event_id BIGINT, p_ts_us BIGINT, p_value DOUBLE)) AS vals
        |  FROM c
        |  UNION ALL
        |  SELECT user_id, p_ts_us AS ts_us, 0 AS side, p_event_id AS tie,
        |         CAST(NULL AS BIGINT) AS event_id,
        |         struct_pack(p_event_id := p_event_id, p_ts_us := p_ts_us,
        |                     p_value := p_value) AS vals
        |  FROM p
        |),
        |w AS (
        |  SELECT user_id, ts_us, side, event_id,
        |         last_value(vals IGNORE NULLS) OVER win AS vals
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, tie
        |                 ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT event_id, user_id, ts_us, vals.p_event_id AS p_event_id,
        |       vals.p_ts_us AS p_ts_us, vals.p_value AS p_value
        |FROM w WHERE side = 1""".stripMargin,


    "q_histogram" ->
      """WITH mm AS (
        |  SELECT min(CAST(n_chars AS DOUBLE)) AS mn, max(CAST(n_chars AS DOUBLE)) AS mx
        |  FROM documents
        |),
        |bkt AS (
        |  SELECT CAST(least(floor((CAST(n_chars AS DOUBLE) - mm.mn) * 10 / (mm.mx - mm.mn)),
        |                    9) AS INTEGER) AS bucket
        |  FROM documents CROSS JOIN mm WHERE n_chars IS NOT NULL
        |)
        |SELECT bucket, count(*) AS n,
        |       mm.mn + bucket * ((mm.mx - mm.mn) / 10) AS lo,
        |       CASE WHEN bucket = 9 THEN mm.mx
        |            ELSE mm.mn + (bucket + 1) * ((mm.mx - mm.mn) / 10) END AS hi
        |FROM bkt CROSS JOIN mm GROUP BY bucket, mm.mn, mm.mx""".stripMargin,


    "q_sql_kernels" ->
      s"""WITH $sqlSimhashFp
         |SELECT f.doc_id, f.fp,
         |       list_sum(list_transform(list_zip(e.embedding::DOUBLE[], e.embedding::DOUBLE[]),
         |                               q -> q[1]*q[2])) AS self_dot
         |FROM fpt f JOIN embeddings e ON e.vec_id = f.doc_id % 500""".stripMargin,


    "q_merge_upsert" ->
      """WITH cur AS (SELECT doc_id, text, source FROM documents WHERE doc_id % 4 <> 3),
        |inc AS (SELECT doc_id,
        |               CASE WHEN doc_id % 3 = 0 THEN concat('v2 ', text)
        |                    ELSE text END AS text,
        |               source
        |        FROM documents WHERE doc_id % 2 = 1)
        |SELECT coalesce(i.doc_id, c.doc_id) AS doc_id,
        |       coalesce(i.text, c.text) AS text,
        |       coalesce(i.source, c.source) AS source,
        |       CASE WHEN c.doc_id IS NULL THEN 'inserted'
        |            WHEN i.doc_id IS NULL THEN 'kept'
        |            WHEN c.text <> i.text OR c.source <> i.source THEN 'updated'
        |            ELSE 'unchanged' END AS action
        |FROM cur c FULL OUTER JOIN inc i ON c.doc_id = i.doc_id""".stripMargin,


    "q_unpivot" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(value * 100)) AS DOUBLE) / 100.0 AS total
        |FROM u GROUP BY 1""".stripMargin,


    "q_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,


    "q_zscore" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(c) AS BIGINT) AS s,
        |             CAST(sum(c * c) AS BIGINT) AS ss
        |      FROM e GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |       CASE WHEN m.n > 1 AND m.n * m.ss - m.s * m.s > 0
        |            THEN CAST(e.c * m.n - m.s AS DOUBLE)
        |                 / sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE)) END AS z
        |FROM e JOIN m USING (event_type)""".stripMargin,


    "q17_smallqty" ->
      """WITH f AS (
        |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#1'),
        |a AS (SELECT l_partkey AS pk, sum(l_quantity) / count(*) AS avg_qty
        |      FROM f GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        |       CAST(sum(round(f.l_extendedprice * 100)) AS DOUBLE) / 100.0 / 7.0
        |         AS avg_yearly
        |FROM f JOIN a ON f.l_partkey = a.pk
        |WHERE f.l_quantity < 0.2 * a.avg_qty""".stripMargin,


    "q_fk_orphans" ->
      """WITH c AS (
        |  SELECT o_custkey FROM orders
        |  UNION ALL
        |  SELECT o_custkey + 900000000 FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows
        |FROM c
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |GROUP BY o_custkey""".stripMargin,


    "q_null_profile" ->
      """WITH base AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL SELECT 999000001, NULL, 'xx', NULL, 0
        |  UNION ALL SELECT NULL, '   ', NULL, 'srcX', NULL
        |),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
        |SELECT 'doc_id' AS col_name, t.n AS n_rows,
        |       CAST((SELECT count(*) FROM base WHERE doc_id IS NULL) AS BIGINT) AS n_null,
        |       CAST(NULL AS BIGINT) AS n_blank FROM t
        |UNION ALL SELECT 'text', t.n,
        |       CAST((SELECT count(*) FROM base WHERE text IS NULL) AS BIGINT),
        |       CAST((SELECT count(*) FROM base WHERE trim(text) = '') AS BIGINT) FROM t
        |UNION ALL SELECT 'lang', t.n,
        |       CAST((SELECT count(*) FROM base WHERE lang IS NULL) AS BIGINT),
        |       CAST((SELECT count(*) FROM base WHERE trim(lang) = '') AS BIGINT) FROM t
        |UNION ALL SELECT 'source', t.n,
        |       CAST((SELECT count(*) FROM base WHERE source IS NULL) AS BIGINT),
        |       CAST((SELECT count(*) FROM base WHERE trim(source) = '') AS BIGINT) FROM t
        |UNION ALL SELECT 'n_chars', t.n,
        |       CAST((SELECT count(*) FROM base WHERE n_chars IS NULL) AS BIGINT),
        |       CAST(NULL AS BIGINT) FROM t""".stripMargin,


    "q_setops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150""".stripMargin,


    "q5_join" ->
      """SELECT n_name, count(*) AS n,
        |       sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,


    "q18_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b
        |  ON o_orderkey = b.l_orderkey""".stripMargin,


    "q_rollup" ->
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |       CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,


    "q_cube" ->
      """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        |       CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS pri,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY CUBE (l_returnflag, o_orderpriority)""".stripMargin,


    "q_ntile" ->
      """SELECT doc_id, lang,
        |       ntile(10) OVER w AS tile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM documents
        |WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)""".stripMargin,


    "q_pareto" ->
      """WITH agg AS (SELECT user_id, count(*) AS n_events,
        |                    CAST(sum(round(value * 100)) AS BIGINT) AS cents
        |             FROM events GROUP BY 1)
        |SELECT a.user_id, a.n_events, a.cents FROM agg a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM agg b
        |  WHERE b.n_events <= a.n_events AND b.cents >= a.cents
        |    AND (b.n_events < a.n_events OR b.cents > a.cents))""".stripMargin,


    "q_interval_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |                      WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |                      ELSE 0 END AS nw
        |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s2 AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                    ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
        |       FROM s1),
        |ses AS (SELECT user_id, session_id, min(ts_us) AS t_start_us,
        |               max(ts_us) AS t_end_us
        |        FROM s2 GROUP BY 1, 2),
        |p AS (SELECT user_id, ts_us - 3600000000 AS w_lo, ts_us AS w_hi
        |      FROM e WHERE event_type = 'purchase')
        |SELECT s.user_id, s.session_id, CAST(count(*) AS BIGINT) AS n_purchase_windows
        |FROM ses s JOIN p ON p.user_id = s.user_id
        |                 AND s.t_start_us <= p.w_hi AND p.w_lo <= s.t_end_us
        |GROUP BY 1, 2""".stripMargin,


    "q_union_evolved" ->
      """WITH u AS (
        |  SELECT doc_id, text, source, NULL AS lang, NULL AS n_chars
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, text, source, lang, n_chars
        |  FROM documents WHERE doc_id % 2 = 1
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(lang) AS BIGINT) AS n_with_lang,
        |       CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_chars_v2
        |FROM u GROUP BY 1""".stripMargin,


    "q_skew_report" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |       CAST((cnt + 999) // 1000 AS BIGINT) AS salt
        |FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 20""".stripMargin,


    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |r AS (SELECT user_id, event_id, ts_us, event_type,
        |             CASE WHEN lag(event_type) OVER w IS NULL
        |                    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |v AS (SELECT user_id, event_type, ts_us,
        |             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |      FROM r),
        |runs AS (SELECT user_id, version, min(event_type) AS event_type,
        |                min(ts_us) AS valid_from_us,
        |                CAST(count(*) AS BIGINT) AS n_events
        |         FROM v GROUP BY 1, 2)
        |SELECT user_id, version, event_type, valid_from_us,
        |       lead(valid_from_us) OVER w2 AS valid_to_us, n_events,
        |       CAST(CASE WHEN lead(valid_from_us) OVER w2 IS NULL THEN 1 ELSE 0 END AS INT)
        |         AS is_current
        |FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY version)""".stripMargin,


    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3""".stripMargin,


    "q4_semi" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > TIMESTAMP '1995-02-01')
        |GROUP BY 1""".stripMargin,


    "q10_returns" ->
      """WITH rev AS (
        |  SELECT o.o_custkey,
        |         CAST(sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100)))
        |              AS BIGINT) AS rev_ucents,
        |         CAST(count(*) AS BIGINT) AS n_items
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R'
        |  GROUP BY 1
        |),
        |top AS (SELECT * FROM rev ORDER BY rev_ucents DESC, o_custkey LIMIT 20)
        |SELECT c.c_custkey, c.c_name, t.rev_ucents / 10000.0 AS revenue, t.n_items
        |FROM top t JOIN customer c ON c.c_custkey = t.o_custkey""".stripMargin,


    "q14_promo" ->
      """WITH r AS (
        |  SELECT p.p_type,
        |         round(l_extendedprice * 100) * (100 - round(l_discount * 100)) AS rev
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
        |    AND l.l_shipdate < TIMESTAMP '1995-10-01'
        |)
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
        |         AS promo_ucents,
        |       CAST(sum(rev) AS BIGINT) AS total_ucents,
        |       100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
        |         / CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) AS promo_share
        |FROM r""".stripMargin,


    "q19_disjunct" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_items,
        |       sum(round(l_extendedprice * 100) * (100 - round(l_discount * 100)))
        |         / 10000.0 AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
        |       AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |       AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15
        |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,


    "q13_custdist" ->
      """WITH per AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1
        |)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM per GROUP BY 1""".stripMargin,


    "q22_noorders" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        |      FROM c WHERE cents > 0),
        |rich AS (SELECT c.* FROM c CROSS JOIN t WHERE c.cents * t.n > t.s),
        |no AS (SELECT r.* FROM rich r
        |       WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                         WHERE o.o_custkey = r.c_custkey
        |                           AND o.o_orderdate >= TIMESTAMP '2000-01-01'))
        |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(cents) AS BIGINT) / 100.0 AS totacctbal
        |FROM no JOIN nation ON n_nationkey = c_nationkey GROUP BY 1""".stripMargin,


    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       sum(round(l_extendedprice * 100)) / 100.0 AS sum_base_price,
        |       sum(round(l_extendedprice * (1 - l_discount) * 10000)) / 10000.0 AS sum_disc_price,
        |       sum(l_quantity) / count(*) AS avg_qty,
        |       sum(round(l_discount * 100)) / 100.0 / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,


    "q_rolling" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, value
        |           FROM events),
        |d AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
        |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM e GROUP BY 1, 2)
        |SELECT user_id, day, n_events,
        |       CAST(sum(n_events) OVER w AS BIGINT) AS roll_events,
        |       CAST(count(*) OVER w AS BIGINT) AS roll_days,
        |       CAST(sum(cents) OVER w AS BIGINT) / 100.0 AS roll_value
        |FROM d
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,


    "q_gap_fill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |d AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events
        |      FROM e GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d
        |       GROUP BY user_id HAVING max(day) - min(day) < 3660),
        |g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM sp)
        |SELECT g.user_id, g.day, coalesce(d.n_events, 0) AS n_events
        |FROM g LEFT JOIN d ON d.user_id = g.user_id AND d.day = g.day""".stripMargin,


    "q_skew_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |       CAST(sum(d.user_events) AS BIGINT) AS sum_ue
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY 1""".stripMargin,


    "q_quantiles" ->
      """WITH v AS (SELECT source AS k, CAST(n_chars AS DOUBLE) AS v
        |           FROM documents WHERE n_chars IS NOT NULL),
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
        |SELECT s.k AS source, s.p, rl.v + s.frac * (rh.v - rl.v) AS q, s.m AS m
        |FROM spec2 s JOIN r rl ON rl.k = s.k AND rl.r = s.lo
        |             JOIN r rh ON rh.k = s.k AND rh.r = s.hi""".stripMargin,


    "q6_revenue" ->
      """SELECT sum(round(l_extendedprice * 100) * round(l_discount * 100))
        |         / 10000.0 AS revenue,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,


    // moments in BIGINT, cross terms in HUGEINT (the decimal(38,0)
    // twin), one rounding per operand at the DOUBLE cast
    "q_corr" ->
      """WITH c AS (SELECT l_returnflag AS k,
        |                  CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |                  CAST(round(l_discount * 100) AS BIGINT) AS y
        |           FROM lineitem),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(y * y) AS BIGINT) AS syy,
        |             CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM c GROUP BY k)
        |SELECT k AS l_returnflag, n,
        |       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |       THEN CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |            / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
        |                         - CAST(sx AS HUGEINT) * sx AS DOUBLE))
        |               * sqrt(CAST(CAST(n AS HUGEINT) * syy
        |                           - CAST(sy AS HUGEINT) * sy AS DOUBLE))) END AS r
        |FROM m""".stripMargin,


    "q_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        |       CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((source), (lang))""".stripMargin,


    // the q_quantiles type-7 machinery at p ∈ {.25, .5, .75} pivoted
    // to (q1, med, q3), then r = (x − med) / (q3 − q1)
    "q_robust_scale" ->
      """WITH v AS (SELECT event_type AS k, CAST(value AS DOUBLE) AS v FROM events
        |           WHERE value IS NOT NULL),
        |r AS (SELECT k, v,
        |             CAST(row_number() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS r
        |      FROM v),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS m FROM v GROUP BY k),
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
        |       FROM q GROUP BY k)
        |SELECT e.event_id, e.event_type, e.value,
        |       CASE WHEN st.q3 > st.q1
        |            THEN (e.value - st.med) / (st.q3 - st.q1) END AS r
        |FROM events e JOIN st ON st.k = e.event_type""".stripMargin,


    // explicit lag() columns, never a frame aggregate — see
    // Events.lagFeatures on the segment-tree FP-order trap
    "q_lag_features" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
        |l AS (
        |  SELECT event_id, user_id, ts_us, value,
        |         lag(value, 1) OVER w AS prev_value,
        |         ts_us - lag(ts_us, 1) OVER w AS gap_us,
        |         lag(value, 2) OVER w AS l2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |)
        |SELECT event_id, user_id, ts_us, value, prev_value, gap_us,
        |       (value + prev_value + l2) / 3.0 AS avg3,
        |       CASE WHEN prev_value IS NOT NULL AND l2 IS NOT NULL
        |            THEN greatest(value, prev_value, l2) END AS max3
        |FROM l""".stripMargin,


    "q_winsorize" ->
      """WITH v AS (SELECT event_type AS k, event_id, CAST(value AS DOUBLE) AS v
        |           FROM events WHERE value IS NOT NULL),
        |r AS (SELECT k, v,
        |             CAST(row_number() OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS r
        |      FROM v),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS m FROM v GROUP BY k),
        |ps AS (SELECT unnest([CAST(0.05 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p),
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
        |st AS (SELECT k, max(CASE WHEN p = 0.05 THEN q END) AS qlo,
        |              max(CASE WHEN p = 0.95 THEN q END) AS qhi
        |       FROM q GROUP BY k)
        |SELECT e.event_id, e.k AS event_type, e.v AS value,
        |       least(greatest(e.v, st.qlo), st.qhi) AS clipped
        |FROM v e JOIN st ON st.k = e.k""".stripMargin,


    "q_top_per_key" ->
      """SELECT source, CAST(doc_id AS BIGINT) AS id, CAST(rn AS BIGINT) AS rank,
        |       CAST(n_chars AS DOUBLE) AS score
        |FROM (SELECT source, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 5""".stripMargin,


    "q_gini" ->
      """WITH r AS (SELECT n_chars,
        |                  CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        |           FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(n_chars) AS BIGINT) AS total,
        |       2.0 * CAST(sum(rk * n_chars) AS BIGINT)
        |           / CAST(CAST(count(*) AS BIGINT) * CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
        |         - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gini
        |FROM r""".stripMargin,


    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS key FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
        |SELECT key, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(count(*) AS DOUBLE) / CAST(n.n AS DOUBLE) AS share
        |FROM t CROSS JOIN n GROUP BY key, n.n HAVING count(*) * 100 > n.n""".stripMargin,
  )
}
