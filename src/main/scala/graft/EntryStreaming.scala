package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Structured Streaming twins (MemoryStream micro-batch rigs, driver rows-gated).
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged.
  *
  * All fixtures draw their micro-batch rows from the SHARED collected
  * feeds (EntryHelpers.docFeed / eventFeed — VERDICT r11 item 2): one
  * driver collect per table per session instead of one per rig per
  * rep. Each rig derives its own projection + sort driver-side; the
  * rows fed are byte-identical to the per-rig collects they replace. */
private[graft] object EntryStreaming {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── streaming: incremental exact dedup, driver-gated ────────────
    // VERDICT r8 item 6: the streaming twins were spec-gated only;
    // this puts one under the same DuckDB-oracle regime as everything
    // else. A REAL Structured Streaming run: the doc_id%4==0 slice
    // arrives as 3 MemoryStream micro-batches (sorted by doc_id,
    // chunked) and is deduped against the static exact index of the
    // already-admitted corpus (the other 3/4) via the stream-static
    // anti-join — admitted rows land in a memory sink, which is the
    // query result. The result SET is a pure function of the input
    // (per-row anti-join, no cross-row state), so batch boundaries
    // can't perturb it and the oracle is plain SQL. The driver-side
    // collect here is the micro-batch FIXTURE (MemoryStream is fed
    // from the driver by definition — production sources are
    // files/Kafka); the operator under test never collects.
    "q_stream_dedup" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val docs = Tables(s, dir, "documents")
      val index = Dedup.exactIndex(docs.filter(col("doc_id") % 4 =!= 0), Seq("text"))
      val arrivals = docFeed(s, dir).filter(_._1 % 4 == 0)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = DedupStream.dropSeenExact(source.toDF(), index, Seq("text"))
        .select(col("doc_id"), col("source"))
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: watermarked windowed counts, driver-gated ────────
    // The STATEFUL streaming twin under the oracle gate: hourly
    // tumbling counts per event type fold across 3 time-ordered
    // micro-batches (EventStream.windowedCounts — watermark + window
    // state). Batches are chunked from the ts-sorted event feed, so
    // no row is ever late and the watermark is semantically inert;
    // complete-mode memory sink then holds exactly the batch
    // aggregate, making the stream's windowed STATE (not just a
    // rowwise map) hash-checkable against DuckDB.
    "q_stream_window" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._2, e._4)).sortBy(_._1)
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val source = MemoryStream[(Long, String)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.windowedCounts(source.toDF().toDF("ts", "event_type"))
        .writeStream.format("memory").queryName(qn).outputMode("complete").start()
      try ev.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: NEAR-dup admission via band-bucket state ─────────
    // The streaming MinHash gate: one long of occupancy state per LSH
    // bucket; a doc is admitted iff ALL its bands are first-ever
    // occupants (shares no bucket with any earlier doc). The
    // all-bands-fresh fold over the sink is the q_stream_kmv
    // final-state-selection convention; the cross-batch BUCKET state
    // is what the doc_id-order oracle checks.
    "q_stream_neardup" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = docFeed(s, dir)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = streaming.DedupStream
        .bandOccupancy(source.toDF(), "doc_id", "text", parity = true)
        .toDF()
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn).groupBy("doc_id")
        .agg(sum(col("fresh")).as("__f"), count(lit(1)).as("__b"))
        .filter(col("__f") === col("__b"))
        .select(col("doc_id"))
    }),


    // ── streaming: watermarked HOPPING counts, driver-gated ─────────
    // Overlapping-window state under the hash gate: each event lands
    // in 4 windows (1 h width / 15 min slide), folded across 3
    // time-ordered micro-batches in complete mode — the sliding twin
    // of q_stream_window, checked against the batch hopping oracle.
    "q_stream_hop" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._2, e._4)).sortBy(_._1)
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val source = MemoryStream[(Long, String)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.hoppingCounts(source.toDF().toDF("ts", "event_type"))
        .writeStream.format("memory").queryName(qn).outputMode("complete").start()
      try ev.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: stateful per-source admission cap, driver-gated ──
    // The exactly-once STATE path under the hash gate (VERDICT r9
    // item 7): CurationStream.capPerKey holds one long of
    // flatMapGroupsWithState state per source (the lifetime admitted
    // count) across 3 doc_id-sorted micro-batches. With arrival in id
    // order and orderCol=doc_id resolving within-batch ties, the
    // admitted set is exactly the batch operator's lowest-n-ids-per-
    // key contract — so the cross-batch COUNTER state (a quota
    // filling mid-stream, partially-admitted batches) is what the
    // DuckDB row_number oracle checks, not just a rowwise map. */
    "q_stream_cap" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = docFeed(s, dir)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = streaming.CurationStream
        .capPerKey(source.toDF(), "source", n = 10, orderCol = Some("doc_id"))
        .select(col("doc_id"), col("source"))
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: model-based admission filter, driver-gated ───────
    // Online corpus filtering with the TRAINED quality classifier
    // (q_lr_train's model, shared fixture): arriving docs are scored
    // and admitted inside one stateless map — rowwise hashed features
    // (`Classifier.hashedFeaturesRowwise`, bit-equal to the batch
    // builder: integer ±1 bucket sums), standardizer and weights as
    // plan literals, quantized admission predicate. Zero state, zero
    // shuffle, append mode: batch boundaries cannot perturb the
    // admitted set, so the oracle is the batch chain's scores
    // filtered to the arriving slice. THE production shape for
    // filter-at-ingest at any scale.
    "q_stream_score" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val (_, st, m) = EntryVector.lrModelShared(s, dir)
      val arrivals = docFeed(s, dir).filter(_._1 % 4 == 0)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val scored = source.toDF().select(col("doc_id"),
          Classifier.scoreColumn(
            Classifier.standardizeColumn(
              Classifier.hashedFeaturesRowwise(col("text"), dim = 64), st), m)
            .as("score"))
        .select(col("doc_id"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
        .filter(col("score4") >= 5000)
      val q = scored.writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: NB model serving via stream-static join ──────────
    // THE OTHER serving shape at 100 TB (VERDICT r12 item 6): where
    // q_stream_score ships the LR model as plan literals (zero
    // shuffle, bounded by literal size), NB's model is a vocab-sized
    // weight TABLE — no plan-literal ceiling — served to the stream
    // through a stream-static equi-join (broadcast when the vocab
    // fits; Spark's threshold decides). Per-(doc, token) tfs are
    // built ROWWISE (array_distinct + a filter count per token — no
    // second streaming aggregation, which Spark disallows), so the
    // per-doc score summands are the IDENTICAL tf·w products the
    // batch scorer sums, merely in a different order — absorbed by
    // the 1e-4 grid exactly as the batch gate's own partial-agg
    // order already is. One streaming groupBy(doc_id) in complete
    // mode makes the final scored table hash-checkable; production
    // serving bounds that state with a watermark or scores per
    // micro-batch via foreachBatch (each doc arrives whole).
    "q_stream_nb" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val m = EntryVector.nbModelShared(s, dir)
      val arrivals = docFeed(s, dir).filter(_._1 % 4 == 0)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val toks = split(col("text"), " ")
      val scored = source.toDF()
        .select(col("doc_id"), explode(
          transform(array_distinct(toks), t => struct(
            t.as("token"),
            size(filter(toks, e => e === t)).cast("long").as("tf"))))
          .as("__te"))
        .select(col("doc_id"), col("__te.token").as("token"),
          col("__te.tf").as("tf"))
        .join(m.weights.select(col("token"), col("w")), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg((sum(col("tf") * coalesce(col("w"), lit(m.oovW)))
          + lit(m.bias)).as("logOdds"))
        .select(col("doc_id"),
          floor(col("logOdds") * 10000.0 + 0.5).cast("long").as("score4"))
        .withColumn("pred", col("score4") > 0)
      val q = scored.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: stream-stream attribution join, driver-gated ─────
    // The last streaming topology under the hash gate: BOTH sides
    // unbounded (clicks ⋈ purchases on user + a 5-minute event-time
    // band), watermark-bounded buffer state on each. Inner-join
    // append emits pairs as both sides arrive; feeding the two
    // time-sorted feeds in aligned chunks means every match is
    // present by the final batch — the pair set equals the batch
    // range join, which is the oracle.
    "q_stream_join" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._1, e._2, e._3, e._4)).sortBy(_._2)
      val clicks = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
      val purchases = ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
      // 2 batches (VERDICT r11 item 2): both-sides-buffered matching
      // across a batch boundary is fully exercised with one boundary;
      // the third batch only re-paid the rig's per-batch state cost
      val nb = 2
      def chunks(a: Array[(Long, Long, Long)]) = {
        val per = math.max(1, (a.length + nb - 1) / nb)
        a.grouped(per).toSeq.padTo(nb, Array.empty[(Long, Long, Long)])
      }
      val cSrc = MemoryStream[(Long, Long, Long)]
      val pSrc = MemoryStream[(Long, Long, Long)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.attributionJoin(
          cSrc.toDF().toDF("event_id", "ts", "user_id"),
          pSrc.toDF().toDF("event_id", "ts", "user_id"),
          windowMicros = 300000000L, watermark = "10 minutes")
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try chunks(clicks).zip(chunks(purchases)).foreach { case (cb, pb) =>
        if (cb.nonEmpty) cSrc.addData(cb.toSeq)
        if (pb.nonEmpty) pSrc.addData(pb.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: running per-user totals, driver-gated ────────────
    // The custom-keyed-state running aggregate (mapGroupsWithState,
    // two longs per user, exact cents) — EventStream's last ungated
    // transform. Update-mode sink accumulates one row per (user,
    // batch); totals only grow, so max n_events (after distinct)
    // selects each user's final state — the same final-state
    // selection contract q_stream_kmv uses. Sum order can't matter:
    // the fold adds exact integer cents.
    // ── streaming: FILE-SOURCE JSONL ingest ─────────────────────────
    // The one non-MemoryStream source row: DocIO-written shards
    // stream in at one file per micro-batch (maxFilesPerTrigger = 1,
    // so the 4 shards drive 4 real file-discovery triggers — the
    // production ingest topology, a watched landing directory), and
    // the complete-mode per-source aggregate must equal the batch
    // GROUP BY over the original parquet — the oracle replays it
    // verbatim, so file streaming sits under the HASH gate.
    "q_stream_jsonl" -> ((s, dir) => withStreamRigConf(s) {
      val docs = Tables(s, dir, "documents")
      // session-unique (the q_lr_persist convention, extended r13):
      // concurrent gate layouts must not overwrite each other's shards
      // mid-scan
      val tmp = sessionTmpDir(s, "stream_jsonl", dir)
      graft.sources.DocIO.writeJsonl(docs, tmp, shards = 4)
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val agg = s.readStream
        .schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .json(tmp)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
      val q = agg.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).select("source", "n_docs", "sum_chars")
    }),


    // ── streaming: checkpointed FILE SINK (exactly-once JSONL out) ──
    // The output half of the ingest story: a MemoryStream of document
    // rows lands in an append-mode json file sink across 3 micro-
    // batches with a checkpoint; the batch read-back goes through the
    // sink's _spark_metadata commit log (only committed files are
    // visible — the exactly-once contract), and must equal the plain
    // projection of the source table, which the oracle replays. The
    // sink+checkpoint dirs are wiped per call: offsets in a stale
    // checkpoint pin to a prior MemoryStream instance and would
    // replay nothing.
    "q_stream_filesink" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val docs = docFeed(s, dir).map(d => (d._1, d._3, d._4))
      val base = sessionTmpDir(s, "stream_filesink", dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val source = MemoryStream[(Long, String, Long)]
      val q = source.toDF().toDF("doc_id", "source", "n_chars")
        .writeStream.format("json")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/chk")
        .outputMode("append").start()
      val perBatch = math.max(1, (docs.length + 2) / 3)
      try docs.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      s.read.schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("source", StringType),
          StructField("n_chars", LongType))))
        .json(s"$base/out")
    }),


    "q_stream_totals" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._1, e._3, e._5))
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val source = MemoryStream[(Long, Long, Double)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.runningUserTotals(
          source.toDF().toDF("event_id", "user_id", "value"))
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try ev.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_events").desc)
      s.table(qn).distinct()
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("user_id"), col("n_events"), col("sum_cents"))
    }),


    // ── streaming: chained-stateful WAU (dedup → windowed agg) ──────
    // The CHAINED stateful pattern under the hash gate — two state
    // stores in one query (dropDuplicates on (user, window), then the
    // windowed count), the only multi-operator state topology the
    // engine uses that wasn't yet driver-gated. Sliding 7-day windows
    // anchor per day, so each (user, day) feeds 7 anchors — identical
    // period math to the batch rollingActiveUsers (q_active_users'
    // oracle applies VERBATIM). Sentinel batches (+30d/+60d, user −1)
    // drive the watermark past every real window's end; sentinel
    // windows land ≥30 periods past the last real anchor and are cut
    // by the period bound, which is exactly the batch operator's
    // anchor range (last active day + 6).
    "q_stream_wau" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._2, e._3)).sortBy(_._1)
      // 2 real batches (+2 sentinels — VERDICT r11 item 2): chained
      // dedup+window state folds across one boundary either way
      val perBatch = math.max(1, (ev.length + 1) / 2)
      val dayNs = 86400L * 1000000000L
      val maxPeriod = ev.map(_._1 / dayNs).max
      val source = MemoryStream[(Long, Long)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.activeUsers(source.toDF().toDF("ts", "user_id"),
          widthSeconds = 86400L, windowPeriods = 7, watermark = "1 hour")
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        ev.grouped(perBatch).foreach { b =>
          source.addData(b.toSeq); q.processAllAvailable()
        }
        Seq(30L, 60L).foreach { d =>
          source.addData(Seq((ev.last._1 + d * dayNs, -1L))); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(qn).filter(col("period") <= maxPeriod + 6L)
    }),


    // ── streaming: within-watermark exact dedup, driver-gated ──────
    // The TTL'd dedup state path (dropDuplicatesWithinWatermark)
    // under the hash gate: every 5th event of each micro-batch is
    // RE-SENT in the following batch, so the feed carries ~20%
    // duplicates that only cross-batch state can collapse — append
    // mode emits each event_id's first arrival exactly once. The
    // 365-day horizon exceeds the data span, so nothing is late and
    // no state evicts: the guaranteed-dedup regime, where the output
    // set is exactly the distinct input (the oracle); shorter
    // horizons trade state for best-effort, which is a capacity
    // decision, not a correctness gate.
    "q_stream_dedup_wm" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._1, e._2, e._4)).sortBy(_._2)
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val batches = ev.grouped(perBatch).toSeq
      val source = MemoryStream[(Long, Long, String)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val in = source.toDF().toDF("event_id", "ts", "event_type")
        .withColumn("ets", Events.tsFromNanos(col("ts")))
      val q = streaming.DedupStream
        .dropExactDuplicates(in, "ets", Seq("event_id"), watermark = "365 days")
        .select(col("event_id"), col("event_type"))
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try batches.zipWithIndex.foreach { case (b, i) =>
        val dupes = if (i == 0) Seq.empty[(Long, Long, String)] else
          batches(i - 1).zipWithIndex.collect { case (r, j) if j % 5 == 0 => r }.toSeq
        source.addData(b.toSeq ++ dupes); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: native session_window sessions, driver-gated ────
    // The WATERMARK-DRIVEN emission path under the hash gate: unlike
    // q_stream_window (complete mode — state re-emitted every batch)
    // and q_stream_cap/q_stream_kmv (custom state), session rows in
    // append mode emit exactly once, when the watermark passes the
    // session's end — merging session_window state until then. Two
    // far-future sentinel batches (user −1, +2d/+4d) advance the
    // watermark past every real session (the watermark used by batch
    // N is computed from batch N−1, hence TWO nudges); the sentinel's
    // own never-closed session is filtered out. Boundary semantics
    // differ from batch sessionize ON PURPOSE: session_window merges
    // only on strict overlap, so a gap of EXACTLY 30 min starts a new
    // session here (>= in the oracle's islands) where the batch
    // operator's strict-> keeps it — both are real product semantics;
    // the oracle pins this one exactly. Output bounds are
    // unix_timestamp's second floor; t_end = last event + gap.
    "q_stream_session" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._2, e._3)).sortBy(_._1)
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val maxTs = ev.last._1
      val dayNs = 86400L * 1000000000L
      val source = MemoryStream[(Long, Long)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.sessionCounts(source.toDF().toDF("ts", "user_id"),
          gap = "30 minutes", watermark = "10 minutes")
        .writeStream.format("memory").queryName(qn).outputMode("append").start()
      try {
        ev.grouped(perBatch).foreach { b =>
          source.addData(b.toSeq); q.processAllAvailable()
        }
        Seq(2L, 4L).foreach { d =>
          source.addData(Seq((maxTs + d * dayNs, -1L))); q.processAllAvailable()
        }
      } finally q.stop()
      s.table(qn).filter(col("user_id") =!= -1L)
    }),


    // ── streaming: per-key KMV distinct sketch, driver-gated ────────
    // The UPDATE-mode state path under the hash gate (q_stream_cap is
    // append-mode flatMapGroups; this is mapGroupsWithState): each
    // source's K-Minimum-Values sketch (k=16 longs) folds across 3
    // micro-batches. The memory sink accumulates one row per (key,
    // batch) update, so the query selects each key's FINAL state:
    // within a key the state is totally ordered (n_sketch grows to k,
    // then kth_min only shrinks — same size below k means the same
    // set, deduped by distinct()), so (n_sketch desc, kth_min asc)
    // picks it uniquely. The exactness contract (emission ≡ batch
    // kmvDistinct over rows seen so far — merging is set-union of
    // minima, arrival-order-free) makes the batch q_kmv_distinct
    // oracle apply verbatim.
    "q_stream_kmv" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = docFeed(s, dir)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = streaming.CurationStream
        .kmvDistinct(source.toDF(), "source", "text", k = 16)
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("n_sketch").desc, col("kth_min").asc_nulls_last)
      s.table(qn).distinct()
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("key").as("source"), col("n_sketch"), col("kth_min"), col("est"))
    }),


    // ── streaming: Count-Min heavy-hitter counters, driver-gated ────
    // The q_stream_kmv symmetry for the OTHER bounded sketch (VERDICT
    // r13 item 5): CMS merge IS elementwise addition of exact integer
    // counters, so the batch cmsTable plan — a rowwise depth-way
    // expansion into one grouped count — runs UNCHANGED over the
    // stream; its entire state is the ≤ depth×width counter table
    // (bounded whatever the stream length), and the complete-mode
    // emission after batch N equals the batch table over everything
    // fed so far, arrival-split-free by commutativity of integer
    // addition. The gate then serves point estimates for the exact
    // top-20 terms THROUGH the streamed counters: the oracle is
    // q_cms_topk's replay verbatim, so a dropped micro-batch, a
    // double-counted row, or any counter drift hash-mismatches.
    "q_stream_cms" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = docFeed(s, dir)
        .map { case (id, text, source, _) => StreamDoc(id, text, source) }
      val perBatch = math.max(1, (arrivals.length + 2) / 3)
      val source = MemoryStream[StreamDoc]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val toks = source.toDF().select(explode(split(col("text"), " ")).as("token"))
      val q = Curation.cmsTable(toks, "token", depth = 4, width = 512)
        .writeStream.format("memory").queryName(qn).outputMode("complete").start()
      try arrivals.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      val docs = Tables(s, dir, "documents")
      val top = TextAnalysis.topTerms(docs, "text", 20)
        .select(col("term"), col("cnt").as("exact_n"))
      Curation.cmsEstimate(s.table(qn), top, "term", depth = 4, width = 512)
        .join(top, Seq("term"))
        .select(col("term"), col("exact_n"), col("cms_n"))
    }),


    // ── streaming: ANN serving from a persisted IVF-PQ index ────────
    // The last trained artifact not yet served from a stream (VERDICT
    // r14 item 7): probe vectors arrive as 3 MemoryStream
    // micro-batches and are scored stream-static against the
    // persisted IVF-PQ index — nprobe cell ranking ROWWISE from the
    // plan-literal coarse centroids (a streaming relation cannot
    // offer the batch path's driver collect), stream-static equi-join
    // on cell, per-candidate ADC from the plan-literal codebook, ONE
    // complete-mode top-k aggregation (state = probes·k rows). The
    // fed probes are q_ivfpq_topk's 5, so the oracle is its SQL
    // verbatim: a wrong rowwise cell pick, a dropped micro-batch, or
    // cross-batch top-k state loss all hash-mismatch against the
    // batch serve. (The probe collect here is the MemoryStream
    // FIXTURE; the serving topology itself never collects — see
    // Similarity.ivfPqTopKStream for the 100 TB posture.)
    "q_stream_ann" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "stream_ann", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index")
      val arrivals = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").cast("long"),
          VectorOps.toDouble(col("embedding")))
        .as[(Long, Seq[Double])].collect()
        .map { case (id, v) => StreamProbe(id, v) }
      val source = MemoryStream[StreamProbe]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val scored = Similarity.ivfPqTopKStream(s, s"$base/index",
        source.toDF(), "vec_id", "embedding", cents, model,
        nprobe = 2, k = 10)
      val q = scored.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try arrivals.grouped(2).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: FILTERED ANN serving of a probe stream ───────────
    // The filtered twin of q_stream_ann (round 18 — VERDICT r17 item
    // 1 extended to the streaming surface): the index carries the
    // label column (metaCols) and the stream-static serve pushes the
    // predicate into the static-side scan, so every micro-batch ranks
    // only qualifying candidates — before ADC, exactly like the batch
    // serve. Oracle = q_ivfpq_filtered's SQL verbatim: the streamed
    // filtered serve must equal the batch filtered serve row for row.
    "q_stream_ann_filtered" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "stream_ann_flt", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index", metaCols = Seq("label"))
      val arrivals = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").cast("long"),
          VectorOps.toDouble(col("embedding")))
        .as[(Long, Seq[Double])].collect()
        .map { case (id, v) => StreamProbe(id, v) }
      val source = MemoryStream[StreamProbe]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val scored = Similarity.ivfPqTopKStream(s, s"$base/index",
        source.toDF(), "vec_id", "embedding", cents, model,
        nprobe = 2, k = 10, filter = Some(col("label") % 2 === 0))
      val q = scored.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try arrivals.grouped(2).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: OPQ-rotated ANN serving of a probe stream ────────
    // The rotated twin of q_stream_ann (r17): probes arrive RAW on
    // the stream and rotate ROWWISE through the same kernel the build
    // used (a pure projection — streaming-safe), then cell-rank, ADC,
    // and top-k run entirely in rotated space against the rotated
    // persisted index. Must equal the batch rotated indexed serve —
    // the oracle is q_opq_refresh's SQL verbatim, so a mixed-space
    // slip on the streaming path hash-mismatches.
    "q_stream_ann_opq" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val emb = Tables(s, dir, "embeddings")
      val rot = EntryVector.opqTestRotation(64)
      val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
      val cents = KMeans.initCentroids(re, "vec_id", "r", KMeans.FirstK(8))
      val pq = Similarity.trainPQ(re, "vec_id", "r", d = 64, m = 4, k = 16,
        maxIter = 0)
      val lm = Similarity.OpqIvfModel(rot, cents, pq)
      val base = sessionTmpDir(s, "stream_ann_opq", dir)
      Similarity.buildIvfPqIndexRotated(emb, "vec_id", "embedding", lm,
        s"$base/index")
      val arrivals = emb.orderBy("vec_id").limit(5)
        .select(col("vec_id").cast("long"),
          VectorOps.toDouble(col("embedding")))
        .as[(Long, Seq[Double])].collect()
        .map { case (id, v) => StreamProbe(id, v) }
      val source = MemoryStream[StreamProbe]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val scored = Similarity.ivfPqTopKStreamRotated(s, s"$base/index",
        source.toDF(), "vec_id", "embedding", lm, nprobe = 2, k = 10)
      val q = scored.writeStream.format("memory").queryName(qn)
        .outputMode("complete").start()
      try arrivals.grouped(2).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      s.table(qn)
    }),


    // ── streaming: funnel state machine, batch-parity gated ─────────
    // Per-user furthest-step state folded across 3 micro-batches; the
    // sink's final steps aggregate to counts that must equal the
    // BATCH funnel exactly (the oracle is q_funnel's SQL verbatim).
    "q_stream_funnel" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val steps = Seq("view", "click", "purchase")
      val ev = eventFeed(s, dir).map(e => (e._3, e._1, e._2, e._4))
        .sortBy(e => (Math.floorDiv(e._3, 1000L), e._2))
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val source = MemoryStream[(Long, Long, Long, String)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.funnelProgress(
          source.toDF().toDF("user_id", "event_id", "ts", "event_type"), steps)
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try ev.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      val fin = s.table(qn).groupBy("user_id").agg(max("step").as("__step"))
      val sums = steps.indices.map(i =>
        sum(when(col("__step") >= i + 1, 1L).otherwise(0L)).as(s"__n${i + 1}"))
      fin.agg(sums.head, sums.tail: _*)
        .select(explode(array(steps.zipWithIndex.map { case (t, i) =>
          struct(lit(i + 1).cast("int").as("step"), lit(t).as("event_type"),
            col(s"__n${i + 1}").cast("long").as("n_users"))
        }: _*)).as("__p"))
        .select(col("__p.step").as("step"), col("__p.event_type").as("event_type"),
          col("__p.n_users").as("n_users"))
    }),


    // ── streaming: SCD current-state via mapGroupsWithState ────────
    // The incremental twin of q_scd2's OPEN row: per-user run state
    // folded across 3 micro-batches; the sink's latest row per user
    // must equal the batch operator's is_current row exactly (the
    // oracle is the batch SCD SQL filtered to the open run).
    "q_stream_scd" -> ((s, dir) => withStreamRigConf(s) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = eventFeed(s, dir).map(e => (e._1, e._2, e._3, e._4))
        .sortBy(e => (Math.floorDiv(e._2, 1000L), e._1))
      val perBatch = math.max(1, (ev.length + 2) / 3)
      val source = MemoryStream[(Long, Long, Long, String)]
      val qn = s"graft_stream_sink_${streamSinkId.incrementAndGet()}"
      val q = EventStream.scdCurrentState(
          source.toDF().toDF("event_id", "ts", "user_id", "event_type"))
        .writeStream.format("memory").queryName(qn).outputMode("update").start()
      try ev.grouped(perBatch).foreach { b =>
        source.addData(b.toSeq); q.processAllAvailable()
      } finally q.stop()
      val w = Window.partitionBy("user_id")
        .orderBy(col("version").desc, col("n_events").desc)
      s.table(qn).distinct()
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("user_id"), col("version"), col("event_type"),
          col("valid_from_us"), col("n_events"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // the streamed IVF-PQ serve must equal the batch serve over the
    // same probes: q_ivfpq_topk's replay verbatim
    "q_stream_ann" -> EntryVector.sqlIvfPqTopK,
    "q_stream_ann_filtered" -> EntryVector.sqlIvfPqFiltered,
    "q_stream_ann_opq" -> EntryVector.sqlOpqRefresh,

    // the file sink's committed output must be exactly the projection
    "q_stream_filesink" ->
      """SELECT doc_id, source, n_chars FROM documents""".stripMargin,

    // the batch twin of the file-source ingest: streaming's final
    // complete-mode state must equal this GROUP BY exactly
    "q_stream_jsonl" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    "q_stream_dedup" ->
      """WITH idx AS (SELECT DISTINCT md5(text) AS h FROM documents
        |             WHERE doc_id % 4 <> 0),
        |b AS (SELECT * FROM documents WHERE doc_id % 4 = 0)
        |SELECT doc_id, source FROM b ANTI JOIN idx ON md5(b.text) = idx.h""".stripMargin,


    // the stateless streaming filter admits exactly the batch chain's
    // >= 0.5 quantized scores over the arriving slice (EntryVector's
    // full 8-iteration GD replay; rowwise features are integer-sum
    // bit-equal to the batch builder)
    "q_stream_score" ->
      s"""${EntryVector.sqlLrChain},
         |mf AS (SELECT x.doc_id,
         |         1.0/(1.0 + exp(-(sum(w.w * x.v) + (SELECT b FROM b8)))) AS p
         |       FROM x JOIN w8 w USING (pos) GROUP BY x.doc_id)
         |SELECT doc_id, CAST(floor(p * 10000 + 0.5) AS BIGINT) AS score4
         |FROM mf
         |WHERE doc_id % 4 = 0
         |  AND CAST(floor(p * 10000 + 0.5) AS BIGINT) >= 5000""".stripMargin,


    // the stream-static NB serving join reproduces the batch scorer
    // over the arriving slice: q_nb_score's replay + the slice filter
    "q_stream_nb" ->
      s"""WITH ${EntryVector.sqlNbChain},
         |pri AS (SELECT ln(CAST(sum(y) AS DOUBLE))
         |             - ln(CAST(sum(1 - y) AS DOUBLE)) AS bias FROM lab),
         |oov AS (SELECT ln(t0 + 1.0 * v) - ln(t1 + 1.0 * v) AS w FROM tot),
         |sc AS (SELECT tfc.doc_id,
         |         sum(tfc.tf * coalesce(wt.w, (SELECT w FROM oov)))
         |           + (SELECT bias FROM pri) AS s
         |       FROM tfc LEFT JOIN wt USING (token) GROUP BY tfc.doc_id)
         |SELECT doc_id,
         |       CAST(floor(s * 10000 + 0.5) AS BIGINT) AS score4,
         |       CAST(floor(s * 10000 + 0.5) AS BIGINT) > 0 AS pred
         |FROM sc WHERE doc_id % 4 = 0""".stripMargin,


    "q_stream_window" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS bucket, event_type,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,


    // a doc is admitted iff no band bucket is shared with a LOWER
    // doc_id (the feed's arrival order) — sig-bearing docs only
    "q_stream_neardup" ->
      s"""WITH $sqlMinhash,
         |coll AS (
         |  SELECT DISTINCT y.doc_id
         |  FROM bb x JOIN bb y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |)
         |SELECT s.doc_id FROM sig s ANTI JOIN coll c ON s.doc_id = c.doc_id""".stripMargin,


    // the batch hopping oracle minus the value sum — the streaming
    // window() slide produces the identical step-aligned start set
    "q_stream_hop" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
        |f AS (SELECT (t - ((t % 900000000) + 900000000) % 900000000) // 900000000
        |             AS fd, event_type FROM e),
        |x AS (SELECT unnest(generate_series(fd - 3, fd)) AS w, event_type FROM f)
        |SELECT w * 900 AS bucket, event_type, count(*) AS n
        |FROM x GROUP BY 1, 2""".stripMargin,


    "q_stream_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn <= 10""".stripMargin,


    // duplicates exist only in the FEED (re-sent rows), so guaranteed
    // within-watermark dedup must reproduce the distinct base table
    "q_stream_dedup_wm" ->
      "SELECT event_id, event_type FROM events",


    // the batch range-join pair set: click within [purchase − 5 min,
    // purchase] on the same user, exact-µs band on both engines
    "q_stream_join" ->
      """WITH c AS (SELECT event_id AS c_id, user_id, epoch_us(ts) AS cus
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS pus
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.p_id, c.c_id
        |FROM c JOIN p USING (user_id)
        |WHERE c.cus >= p.pus - 300000000 AND c.cus <= p.pus""".stripMargin,


    "q_stream_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(round(value * 100)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1""".stripMargin,


    // verbatim q_active_users oracle: the streaming sliding windows
    // anchor at the same trailing periods the batch explode emits
    "q_stream_wau" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS p FROM events
        |),
        |w AS (SELECT DISTINCT u, p + d AS period FROM active CROSS JOIN range(0, 7) t(d))
        |SELECT period, count(*) AS n_active FROM w GROUP BY 1""".stripMargin,


    // islands with the session_window boundary rule: a gap of exactly
    // the 30-min threshold STARTS a new session (>=, strict-overlap
    // merge), unlike q_sessions' batch > semantics; bounds floor to
    // seconds (unix_timestamp), t_end = last event + gap
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |s AS (SELECT user_id, ts_us,
        |         CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |              WHEN ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1
        |              ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (SELECT user_id, ts_us,
        |         sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM s)
        |SELECT user_id, min(ts_us) // 1000000 AS t_start,
        |       (max(ts_us) + 1800000000) // 1000000 AS t_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,


    // identical to q_kmv_distinct's oracle: the stream's final state
    // IS the batch sketch (set-union merge, arrival-order-free)
    "q_stream_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT source,
        |         CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS hv
        |  FROM documents),
        |r AS (
        |  SELECT source, hv,
        |         row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
        |         count(*) OVER (PARTITION BY source) AS nd
        |  FROM h)
        |SELECT source,
        |       CAST(least(nd, 16) AS BIGINT) AS n_sketch,
        |       CASE WHEN nd >= 16 THEN hv END AS kth_min,
        |       CASE WHEN nd < 16 THEN CAST(nd AS DOUBLE)
        |            ELSE CAST(64424509440 AS DOUBLE) / hv END AS est
        |FROM r WHERE rn = least(nd, 16)""".stripMargin,


    // identical to q_cms_topk's oracle: the stream's final counter
    // table IS the batch table (elementwise integer addition,
    // arrival-split-free)
    "q_stream_cms" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |cmst AS (
        |  SELECT t.i AS row,
        |         CAST(concat('0x', substr(md5(t.i || ':' || token), 1, 8))
        |           AS BIGINT) % 512 AS bucket,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM tok CROSS JOIN range(0, 4) t(i) GROUP BY 1, 2),
        |topt AS (SELECT term, cnt FROM (
        |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM (
        |    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
        |      SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |    GROUP BY 1))
        |  WHERE rn <= 20),
        |est AS (
        |  SELECT topt.term, min(coalesce(cmst.n, 0)) AS cms_n
        |  FROM topt CROSS JOIN range(0, 4) t(i)
        |  LEFT JOIN cmst ON cmst.row = t.i
        |    AND cmst.bucket = CAST(concat('0x', substr(md5(t.i || ':' || topt.term), 1, 8))
        |                        AS BIGINT) % 512
        |  GROUP BY 1)
        |SELECT topt.term, topt.cnt AS exact_n, est.cms_n
        |FROM topt JOIN est USING (term)""".stripMargin,


    // the BATCH funnel oracle, verbatim — stream/batch parity
    "q_stream_funnel" ->
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


    "q_stream_scd" ->
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
        |SELECT user_id, version, event_type, valid_from_us, n_events
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                                   ORDER BY version DESC) AS rn
        |      FROM runs)
        |WHERE rn = 1""".stripMargin,
  )
}
