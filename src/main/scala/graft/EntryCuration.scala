package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Corpus curation: splits and sampling, mixture rebalance, packing, gating, sharding, privacy.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryCuration {

  import KMeans.{FirstK, ExplicitIds}

  /** The q_corpus_e2e chain up to the packed table — shared by the
    * driver query and PlanShapeSpec (which pins its join/window
    * shapes without paying the output write). Stages and their
    * standalone gates: JSONL landing + permissive ingest
    * (q_jsonl_roundtrip), exact dedup (q_dedup_kept), near-dup
    * cluster keep-best (q_cluster_best, with q_pipeline's maxBucket
    * skew cap), quality gate (q_quality/q_pipeline), PII scrub
    * (q_scrub), token-budget packing (q_pack). */
  private[graft] def corpusE2ePacked(s: SparkSession, dir: String,
                                     base: String): DataFrame = {
    import graft.sources.DocIO
    // raw crawl: constant contact-info plant (see q_corpus_e2e doc)
    val raw = Tables(s, dir, "documents").select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user@example.com or https://ex.com/d/x tel 555-0100-321"))
        .as("text"),
      col("source"), col("n_chars"))
    DocIO.writeJsonl(raw, s"$base/landing", shards = 4)
    // one malformed line: the permissive capture path must cost ONE
    // audit row, not the run (and a silently-parsed poison row would
    // poison the hash downstream)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/landing", "part-poison.txt"),
      "{\"doc_id\": -1, \"text\": unterminated\n")
    val parsed = DocIO.readJsonl(s, s"$base/landing", raw.schema)
    val (nClean, nCorrupt) = DocIO.ingestAudit(parsed)
    require(nCorrupt == 1L && nClean > 0L,
      s"ingest audit: want (clean>0, corrupt=1), got ($nClean, $nCorrupt)")
    val clean = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    // exact dedup, pinned: the deduped table feeds the near-dup
    // signature build, the component-member join, AND the untouched
    // anti-join — unpinned, the json scan + window would run 3×
    val exact = Dedup.pin(Dedup.dropExactDuplicates(clean, "doc_id", Seq("text")))
    // near-dup clusters keep the LONGEST copy; md5-parity chain with
    // q_pipeline's maxBucket=50 skew cap (the oracle replays the cap)
    val best = Dedup.dropNearDupClustersKeepBest(exact, "doc_id", "text",
      scoreCol = "n_chars", n = 3, h = 16, b = 8, minSim = 0.5,
      parity = true, maxBucket = 50)
    // quality gate (same fused scorer + threshold as q_pipeline),
    // pinned: scrubPii and the source join-back both consume it —
    // unpinned, the keep-best aggregation + scorer would run twice
    val gated = Dedup.pin(TextAnalysis.curationScores(best, "text", LangProfiles)
      .filter(col("quality") >= 0.75))
    // PII scrub; the packer tokenizes the REDACTED text
    val scrubbed = TextAnalysis.scrubPii(gated, "doc_id", "text")
      .join(gated.select("doc_id", "source"), Seq("doc_id"))
    Curation.packByTokenBudget(
        scrubbed.select(col("doc_id"), col("source"), col("clean_text")),
        "source", "doc_id", "clean_text", budget = 512L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── curation: deterministic training-order interleave ───────────
    // Deficit round-robin over three sources at 3:2:1 — every prefix
    // of the schedule holds ≈ the target mix.
    "q_interleave" -> ((s, dir) => {
      Curation.interleaveMix(Tables(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 3.0, "src1" -> 2.0, "src2" -> 1.0))
        .select(col("doc_id"), col("source"), col("vtime"), col("order_pos"))
    }),


    // ── curation: quantile normalization across sources ─────────────
    // Each doc's n_chars is replaced by the global n_chars at its
    // within-source quantile — exact integer rank arithmetic.
    "q_quantile_norm" -> ((s, dir) => {
      Curation.quantileNormalize(Tables(s, dir, "documents"), "source", "n_chars", "doc_id")
    }),


    // ── curation: materialized packed training sequences ────────────
    // The emit step of q_pack: one row per (source, shard) with the
    // member docs joined in id order at an EOS separator.
    "q_packed_seqs" -> ((s, dir) => {
      Curation.materializePacked(Tables(s, dir, "documents"), "source", "doc_id",
        "text", budget = 512L)
    }),


    // ── capstone: the full curation pipeline, composed ──────────────
    // quality filter → language filter → exact dedup → near-dup
    // removal (MinHash-LSH verified, drop the higher id of each pair)
    // → deterministic train/test split. Every stage is one of the
    // engine's operators; the oracle replays the identical chain in
    // SQL. This is the "a user could run their whole workflow" claim
    // in one query.
    "q_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // fused single-pass gate: quality + language in ONE scan of
      // documents (the join-of-three-scans form triple-reads the
      // corpus — at 100 TB the repeated scan dominates everything
      // downstream). Bit-equal to the unfused operators, so the
      // oracle's join-shaped replay still hash-matches.
      val kept = TextAnalysis.curationScores(docs, "text", LangProfiles)
        .filter(col("quality") >= 0.75 && col("lang_pred") === "en")
        .select("doc_id", "text")
      // pinned: the exact-deduped table feeds BOTH the near-dup
      // signature build and the final anti-join + split — without the
      // pin the whole scan→gate→window chain executes once per
      // consumer. Released by Bench/Verify via Dedup.releaseCaches().
      val exact = Dedup.pin(Dedup.dropExactDuplicates(kept, "doc_id", Seq("text")))
      // maxBucket = 50 (~1% of the sf0.1 corpus): the banded-LSH skew
      // guard the standalone q_neardup_fast path demonstrates — one
      // boilerplate-heavy (band, bucket) of m docs otherwise puts m²
      // rows in a single task at scale. The oracle replays the cap.
      val deduped = Dedup.dropNearDuplicates(exact, "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.5, parity = true, maxBucket = 50)
      Sampling.trainTestSplit(deduped, "doc_id", testFrac = 0.2)
        .select(col("doc_id"), col("split"))
    }),


    // ── capstone 2: training-set PREP pipeline, composed ────────────
    // The post-dedup half of the story: exact-5-gram decontamination
    // against the 20 lowest-id "benchmark" docs → deterministic cut
    // to a 60k-token budget (global prefix sum in salted-hash order)
    // → 4 curriculum shards by length. Every stage is one of the
    // engine's operators; the oracle replays the identical chain.
    "q_prep_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val probes = docs.orderBy(col("doc_id")).limit(20)
        .select(col("doc_id"), col("text"))
      val contaminated = Curation.ngramContamination(docs, "doc_id", "text",
          probes, "doc_id", "text", n = 5, minShared = 1)
        .filter(col("doc_id") =!= col("probe_id"))
        .select("doc_id").distinct()
      val clean = docs.join(contaminated, Seq("doc_id"), "left_anti")
      val cut = Curation.sampleToTokenBudget(clean, "doc_id", "n_chars",
        budget = 60000L, seed = 42L)
      Curation.curriculumShards(
          cut.select(col("doc_id"), col("n_chars"), col("cum_tokens")),
          "n_chars", "doc_id", nShards = 4)
        .select(col("doc_id"), col("cum_tokens"), col("curriculum_rank"), col("shard"))
    }),


    // ── capstone 3: the END-TO-END corpus run (VERDICT r11 item 3) ──
    // What a user of this library actually executes, as ONE gated
    // composition: land the raw crawl as sharded JSONL → schema'd
    // PERMISSIVE ingest + corrupt-line audit (a planted poison line
    // proves the capture path — a broken ingest surfaces as a crash
    // or a NULL-id row in the hash) → exact dedup → near-dup cluster
    // dedup keeping each cluster's longest copy → quality gate → PII
    // scrub → per-source token-budget packing → sharded JSONL out,
    // read BACK so the gate hashes what landed on disk. The raw text
    // carries a constant planted contact string (constant, so exact-
    // dup structure survives; per-doc plants would make every text
    // unique and let a broken dedup pass vacuously) that the scrub
    // stage must redact — token counts downstream see the redacted
    // text, so the oracle replays the whole chain end to end.
    "q_corpus_e2e" -> ((s, dir) => {
      // session-unique path (the q_lr_persist convention — ADVICE
      // r12): concurrent gate layouts on one host must not race each
      // other's landing/output directories
      val base = sessionTmpDir(s, "corpus_e2e", dir)
      val packed = corpusE2ePacked(s, dir, base)
      graft.sources.DocIO.writeJsonl(packed, s"$base/out", shards = 4)
      graft.sources.DocIO.readJsonl(s, s"$base/out", packed.schema)
        .filter(col("_corrupt_record").isNull)
        .select("doc_id", "source", "n_tokens", "shard")
    }),


    // ── curation: deterministic train/test split (contamination-safe)
    "q_split" -> ((s, dir) => {
      Sampling.trainTestSplit(Tables(s, dir, "documents"), "doc_id", testFrac = 0.2)
        .select(col("doc_id"), col("split"))
    }),


    // ── curation: per-stratum deterministic down-sampling ───────────
    "q_stratified" -> ((s, dir) => {
      Sampling.stratifiedSample(Tables(s, dir, "documents"), "doc_id", "lang",
        rates = Map("en" -> 0.5, "de" -> 1.0), defaultRate = 0.25)
        .select(col("doc_id"), col("lang"))
    }),


    // ── curation: leakage-safe grouped split (side chosen by source
    // hash, so every doc of a source — and the near-dups that cluster
    // within it — lands on one side) ─────────────────────────────────
    "q_group_split" -> ((s, dir) => {
      Sampling.groupSplit(Tables(s, dir, "documents"), "source", testFrac = 0.25)
        .select(col("doc_id"), col("source"), col("split"))
    }),


    // ── curation: rebalance to target source proportions ────────────
    "q_rebalance" -> ((s, dir) => {
      Curation.rebalanceSources(Tables(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select(col("doc_id"), col("source"))
    }),


    // ── curation: up-sample to target mix (epoch-repeat) ────────────
    // The complement of q_rebalance: under-represented sources repeat
    // across epochs instead of over-represented ones being cut.
    "q_upsample" -> ((s, dir) => {
      Curation.upsampleToMix(Tables(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select(col("doc_id"), col("source"), col("epoch"))
    }),


    // ── curation: temperature-scaled mixture plan (share ∝ n^0.5) ───
    // The multilingual-sampling rule as a planning table: natural vs
    // temperature-flattened share per source + the epoch multiplier
    // to realize it. alpha limited to sqrt-composable values — pow()
    // is not cross-engine bit-exact; sqrt is. Denominator folds in
    // UTF-8 key order (the sorted-fold contract), replayed by the
    // oracle's list_reduce over the same ordered list.
    "q_temp_mix" -> ((s, dir) => {
      Curation.temperatureShares(Tables(s, dir, "documents"), "source", alpha = 0.5)
    }),


    // ── curation: robust per-source outlier gate (median ± 2·MAD) ───
    "q_mad_gate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      Curation.madOutlierGate(docs, "source", "doc_id", "n_tokens", nMads = 2.0)
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),


    // ── curation: per-source length-distribution profile ────────────
    "q_source_profile" -> ((s, dir) => {
      Curation.sourceProfile(Tables(s, dir, "documents"), "source", "doc_id", "text")
    }),


    // ── curation: Z-order (Morton) layout index ─────────────────────
    // The multi-dim clustering key a data-skipping writer sorts by:
    // exact integer scaling + bit interleave of (partkey, suppkey).
    "q_zorder" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select(
        (col("l_orderkey") * 10L + col("l_linenumber")).as("row_id"),
        col("l_partkey"), col("l_suppkey"))
      Curation.zOrderIndex(li, "row_id", "l_partkey", "l_suppkey",
        bits = 16, nBuckets = 64)
    }),


    // ── curation: per-source KMV distinct-count sketch ──────────────
    // k=16 < the 25 distinct texts per source, so every sketch is
    // full and the (k−1)/u_k estimator path (not the exact fallback)
    // is what the gate replays.
    "q_kmv_distinct" -> ((s, dir) => {
      Curation.kmvDistinct(Tables(s, dir, "documents"), "source", "text", k = 16)
    }),


    // ── curation: deterministic global shuffle + shard assignment ───
    "q_shard" -> ((s, dir) => {
      Curation.shuffleShards(Tables(s, dir, "documents"), "doc_id", nShards = 16)
        .select(col("doc_id"), col("shuffle_key"), col("shard"))
    }),


    // ── sources: CSV metadata-table round trip, hash-gated ──────────
    // The flat-table interchange twin of q_jsonl_roundtrip: customer
    // (strings + a double money column) written as headered CSV and
    // read back schema'd must hash-equal the original parquet — the
    // quoting and the double format/parse round trip both sit under
    // the gate. Splittable by construction (no multiLine).
    "q_csv_roundtrip" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      // session-unique (the q_lr_persist convention, extended r13)
      val tmp = sessionTmpDir(s, "csv", dir)
      graft.sources.DocIO.writeCsv(cust, tmp, shards = 4)
      graft.sources.DocIO.readCsv(s, tmp, cust.schema)
        .filter(col("_corrupt_record").isNull)
        .select(cust.columns.map(col).toSeq: _*)
    }),


    // ── sources: JSONL corpus interchange round trip, hash-gated ────
    // Write ALL of documents as JSONL (the standard LLM training-data
    // exchange format), read it back schema'd, and gate the parsed
    // table — text via md5, the byte-for-byte escaping proof —
    // against the ORIGINAL parquet in DuckDB: the whole
    // escape/serialize/parse path sits under the hash gate. One
    // rowwise to_json projection + one splittable text scan; the only
    // shuffle is the fixed 4-shard repartition.
    "q_jsonl_roundtrip" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // session-unique (the q_lr_persist convention, extended r13)
      val tmp = sessionTmpDir(s, "jsonl", dir)
      graft.sources.DocIO.writeJsonl(docs, tmp, shards = 4)
      graft.sources.DocIO.readJsonl(s, tmp, docs.schema)
        .filter(col("_corrupt_record").isNull)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
    }),


    // ── curation: stable pseudonymization of user ids ───────────────
    // Salted md5 replacement — joins/group-bys on the pseudonym still
    // work; rowwise, no shuffle.
    "q_pseudonymize" -> ((s, dir) => {
      Curation.pseudonymize(Tables(s, dir, "events")
        .select(col("event_id"), col("user_id")), Seq("user_id"), salt = "graft-r7")
    }),


    // ── curation: drop each source's shortest 20% (quantile gate) ───
    // Exact integer rank rule (rank > ceil(0.2·n) per source), never
    // an FP threshold compare; one window shuffle on the key.
    "q_quantile_gate" -> ((s, dir) => {
      Curation.filterByQuantile(Tables(s, dir, "documents"),
        "source", "doc_id", "n_chars", q = 0.2)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),


    // ── curation: ≤N documents per source (domain cap) ──────────────
    "q_source_cap" -> ((s, dir) => {
      Curation.capPerKey(Tables(s, dir, "documents"), "source", "doc_id", 20)
        .select(col("doc_id"), col("source"))
    }),


    // ── curation: token-budget sequence packing per source ──────────
    // shard = exclusive-prefix-sum(tokens) div budget, in doc_id
    // order per source — ONE partitioned running-sum window (never a
    // global single-partition window), exact integer arithmetic.
    "q_pack" -> ((s, dir) => {
      Curation.packByTokenBudget(Tables(s, dir, "documents"),
        "source", "doc_id", "text", budget = 512L)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
    }),


    // ── curation: distribution drift between corpus versions ────────
    // Mix-shift audit over `source` between the corpus and a version
    // with doc_id%3=0 removed — per-key counts, fractions, |Δfrac|.
    "q_drift" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.distributionDrift(docs, docs.filter(col("doc_id") % 3 =!= 0), "source")
    }),


    // ── curation: uniform deterministic k-per-key sample ────────────
    // 10 docs per source, ranked by salted id hash (unbiased, unlike
    // capPerKey's first-n-by-id crawl-order bias).
    "q_sample_k" -> ((s, dir) => {
      Curation.sampleKPerKey(Tables(s, dir, "documents"), "source", "doc_id",
        k = 10, seed = 42L).select(col("doc_id"), col("source"))
    }),


    // ── curation: curriculum shards (score-ordered ranking cut) ─────
    "q_curriculum" -> ((s, dir) => {
      Curation.curriculumShards(Tables(s, dir, "documents"), "n_chars", "doc_id",
        nShards = 7).select(col("doc_id"), col("curriculum_rank"), col("shard"))
    }),


    // ── curation: total-token-budget cut (global prefix sum) ────────
    // Keep docs in salted-hash order while the running n_chars sum
    // stays ≤ 75k (≈ half the sf0.01 corpus) — the "exactly-≤N-token
    // corpus" cut, via the range-exchange prefix-sum primitive, never
    // a single-partition window.
    "q_token_budget" -> ((s, dir) => {
      Curation.sampleToTokenBudget(Tables(s, dir, "documents"), "doc_id", "n_chars",
        budget = 75000L, seed = 42L)
        .select(col("doc_id"), col("n_chars"), col("cum_tokens"))
    }),


    // ── LLM-pipeline: one-pass filter-funnel audit ──────────────────
    // Survivor counts for each prefix of the length → token-count →
    // type-token-ratio cascade in ONE corpus scan (per-stage counts
    // would re-scan per stage); ratio compares are exact integer
    // cross-multiplications.
    "q_curation_funnel" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Curation.filterFunnel(Tables(s, dir, "documents"), Seq(
        "len" -> (col("n_chars") >= 200),
        "tokens" -> (size(toks) >= 30),
        "ttr" -> (size(array_distinct(toks)) * 10 >= size(toks) * 3)))
    }),


    // ── documents: per-source corpus profile (source column) ────────
    "q_source_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_chars"))
    }),


    // ── curation: k-anonymity audit on generalized quasi-identifiers ─
    "q_kanon" -> ((s, dir) => {
      val quasi = Tables(s, dir, "customer").select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      Curation.kAnonymityAudit(quasi,
        Seq("c_nationkey", "c_mktsegment", "bal_bucket"), k = 5L)
    }),


    // ── sampling: weighted without replacement (E-S keys) ───────────
    // Weight = n_chars; the pow key is dropped from the output (libm
    // last-ulp), the rank is the contract.
    "q_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSample(
        Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"), col("source")),
        "doc_id", "n_chars", k = 100)
    }),


    // ── sampling: weighted k PER KEY via bounded partial agg ────────
    // The per-domain weighted twin: A-ES exponential race −ln(u)/w,
    // k smallest per source, shipped through TopKAgg (≤ k pairs per
    // key per task — never a per-key window sort). Rank-only output
    // (the weightedSample libm convention).
    "q_weighted_key_sample" -> ((s, dir) => {
      Sampling.weightedSampleKPerKey(
        Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"), col("source")),
        "source", "doc_id", "n_chars", k = 5)
    }),


    // ── LLM-pipeline: split-balance χ² audit ────────────────────────
    // Is the deterministic md5 split accidentally correlated with
    // source? Exact contingency table (zero cells materialized),
    // pinned expected-count arithmetic, sorted-fold term sum.
    "q_split_chi2" -> ((s, dir) => {
      Sampling.splitBalanceChi2(Tables(s, dir, "documents"), "doc_id", "source",
        testFrac = 0.2)
    }),


    // ── LLM-pipeline: group-safe k-fold cross-validation folds ──────
    // Folds keyed on source: every doc of a source shares a fold, so
    // holding out fold i never evals against same-source boilerplate.
    "q_kfold" -> ((s, dir) => {
      Sampling.kFoldGroups(Tables(s, dir, "documents"), "source", k = 5)
        .select(col("doc_id"), col("source"), col("fold"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q_interleave" ->
      """WITH w AS (SELECT * FROM (VALUES ('src0', 3.0), ('src1', 2.0), ('src2', 1.0)) t(source, wt)),
        |r AS (
        |  SELECT d.doc_id, d.source,
        |         (CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS DOUBLE)
        |          - 0.5) / w.wt AS vtime
        |  FROM documents d JOIN w USING (source)
        |)
        |SELECT doc_id, source, vtime,
        |       CAST(row_number() OVER (ORDER BY vtime, source, doc_id) AS BIGINT) AS order_pos
        |FROM r""".stripMargin,


    "q_quantile_norm" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY n_chars, doc_id) AS BIGINT) AS r,
        |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS m
        |  FROM documents
        |),
        |g AS (SELECT n_chars AS gs,
        |             CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS gr
        |      FROM documents),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |x AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN m > 1 THEN 1 + ((r - 1) * (n - 1)) // (m - 1)
        |              ELSE 1 + (n - 1) // 2 END AS tr
        |  FROM k CROSS JOIN t
        |)
        |SELECT x.doc_id, x.source, x.n_chars, g.gs AS score_norm
        |FROM x JOIN g ON g.gr = x.tr""".stripMargin,


    "q_packed_seqs" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, source, text, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
        |  FROM t
        |)
        |SELECT source, CAST(cum // 512 AS BIGINT) AS shard,
        |       string_agg(text, ' <|eos|> ' ORDER BY doc_id) AS sequence,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM c GROUP BY 1, 2""".stripMargin,


    "q_mad_gate" ->
      """WITH d AS (
        |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |r1 AS (
        |  SELECT source, doc_id, n_tokens,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_tokens NULLS FIRST, doc_id NULLS FIRST) AS rn,
        |         count(*) OVER (PARTITION BY source) AS cnt
        |  FROM d
        |),
        |m1 AS (
        |  SELECT source, doc_id, n_tokens, cnt,
        |         max(CASE WHEN rn <= CAST(ceil(cnt / 2.0) AS BIGINT) THEN n_tokens END)
        |           OVER (PARTITION BY source) AS med
        |  FROM r1
        |),
        |m2 AS (
        |  SELECT source, doc_id, n_tokens, cnt, abs(n_tokens - med) AS dev
        |  FROM m1
        |),
        |r2 AS (
        |  SELECT source, doc_id, n_tokens, cnt, dev,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY dev NULLS FIRST, doc_id NULLS FIRST) AS rn2
        |  FROM m2
        |),
        |m3 AS (
        |  SELECT source, doc_id, n_tokens, dev,
        |         max(CASE WHEN rn2 <= CAST(ceil(cnt / 2.0) AS BIGINT) THEN dev END)
        |           OVER (PARTITION BY source) AS mad
        |  FROM r2
        |)
        |SELECT doc_id, source, n_tokens FROM m3 WHERE dev <= 2.0 * mad""".stripMargin,


    "q_pipeline" ->
      s"""WITH qd AS (
         |  SELECT doc_id, string_split(text, ' ') AS qtoks,
         |         ['the', 'a', 'and', 'of', 'to', 'in'] AS sw
         |  FROM documents
         |),
         |qr AS (
         |  SELECT doc_id,
         |         CAST(len(qtoks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter(qtoks, t -> list_contains(sw, t))) AS DOUBLE)
         |           / CAST(len(qtoks) AS DOUBLE) AS stop_token_ratio,
         |         CAST(len(list_distinct(qtoks)) AS DOUBLE)
         |           / CAST(len(qtoks) AS DOUBLE) AS type_token_ratio
         |  FROM qd
         |),
         |good AS (
         |  SELECT doc_id FROM qr
         |  WHERE (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN stop_token_ratio > 0.05 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN type_token_ratio > 0.2 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN type_token_ratio < 0.95 THEN 0.25 ELSE 0.0 END) >= 0.75
         |),
         |langs AS (
         |  SELECT * FROM (VALUES
         |    ('de', ['der', 'die', 'und', 'das']),
         |    ('en', ['the', 'a', 'and', 'of']),
         |    ('es', ['el', 'la', 'los', 'y']),
         |    ('fr', ['le', 'les', 'des', 'et']),
         |    ('zh', ['zhe', 'shi', 'bu', 'wo'])) l(lang, words)
         |),
         |lscores AS (
         |  SELECT d.doc_id, l.lang,
         |         CAST(len(list_filter(d.ltoks, t -> list_contains(l.words, t))) AS DOUBLE)
         |           / CAST(len(d.ltoks) AS DOUBLE) AS score
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ltoks FROM documents) d
         |  CROSS JOIN langs l
         |),
         |en AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, lang,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |    FROM lscores)
         |  WHERE rn = 1 AND lang = 'en'
         |),
         |kept AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN good USING (doc_id) JOIN en USING (doc_id)
         |),
         |ex AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM kept)
         |  WHERE rn = 1
         |),
         |${sqlMinhashOn("ex")},
         |bbh AS (SELECT band, bucket FROM bb GROUP BY 1, 2 HAVING count(*) > 50),
         |bbc AS (SELECT bb.* FROM bb ANTI JOIN bbh USING (band, bucket)),
         |ndcand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bbc x JOIN bbc y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |),
         |nd AS (
         |  SELECT DISTINCT id2 AS doc_id FROM (
         |    SELECT c.id1, c.id2,
         |           CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
         |           CAST(len(s1.sh) + len(s2.sh) - len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) AS sim
         |    FROM ndcand c
         |    JOIN sh s1 ON s1.doc_id = c.id1
         |    JOIN sh s2 ON s2.doc_id = c.id2)
         |  WHERE sim >= 0.5
         |)
         |SELECT doc_id,
         |       CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |                 / 4294967296.0 < 0.2
         |            THEN 'test' ELSE 'train' END AS split
         |FROM ex
         |WHERE doc_id NOT IN (SELECT doc_id FROM nd)""".stripMargin,


    // the full corpus run replayed stage by stage: plant → exact dedup
    // → capped minhash LSH → component closure → keep-best → quality
    // gate → scrub → pack (each fragment is its standalone gate's SQL)
    "q_corpus_e2e" ->
      s"""WITH RECURSIVE raw AS (
         |  SELECT doc_id,
         |         text || ' contact user@example.com or https://ex.com/d/x tel 555-0100-321' AS text,
         |         source, n_chars
         |  FROM documents
         |),
         |ex AS (
         |  SELECT doc_id, text, source, n_chars FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM raw)
         |  WHERE rn = 1
         |),
         |${sqlMinhashOn("ex")},
         |bbh AS (SELECT band, bucket FROM bb GROUP BY 1, 2 HAVING count(*) > 50),
         |bbc AS (SELECT bb.* FROM bb ANTI JOIN bbh USING (band, bucket)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bbc x JOIN bbc y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |),
         |simpairs AS (
         |  SELECT c.id1, c.id2,
         |         CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
         |         CAST(len(s1.sh) + len(s2.sh) - len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) AS sim
         |  FROM cand c
         |  JOIN sh s1 ON s1.doc_id = c.id1
         |  JOIN sh s2 ON s2.doc_id = c.id2
         |),
         |pairs AS (SELECT id1, id2 FROM simpairs WHERE sim >= 0.5),
         |edges AS (
         |  SELECT id1 AS a, id2 AS b FROM pairs
         |  UNION
         |  SELECT id2 AS a, id1 AS b FROM pairs
         |),
         |reach(id, comp) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
         |),
         |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |bst AS (
         |  SELECT doc_id FROM (
         |    SELECT e.doc_id,
         |           row_number() OVER (PARTITION BY c.component
         |                              ORDER BY e.n_chars DESC, e.doc_id) AS rn
         |    FROM ex e JOIN comp c ON e.doc_id = c.id)
         |  WHERE rn = 1
         |),
         |kept AS (
         |  SELECT * FROM ex
         |  WHERE doc_id IN (SELECT doc_id FROM bst)
         |     OR doc_id NOT IN (SELECT id FROM comp)
         |),
         |qr AS (
         |  SELECT doc_id,
         |         CAST(len(qtoks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter(qtoks, t -> list_contains(sw, t))) AS DOUBLE)
         |           / CAST(len(qtoks) AS DOUBLE) AS stop_token_ratio,
         |         CAST(len(list_distinct(qtoks)) AS DOUBLE)
         |           / CAST(len(qtoks) AS DOUBLE) AS type_token_ratio
         |  FROM (SELECT doc_id, string_split(text, ' ') AS qtoks,
         |               ['the', 'a', 'and', 'of', 'to', 'in'] AS sw
         |        FROM kept)
         |),
         |good AS (
         |  SELECT doc_id FROM qr
         |  WHERE (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN stop_token_ratio > 0.05 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN type_token_ratio > 0.2 THEN 0.25 ELSE 0.0 END
         |         + CASE WHEN type_token_ratio < 0.95 THEN 0.25 ELSE 0.0 END) >= 0.75
         |),
         |g AS (SELECT k.doc_id, k.source, k.text FROM kept k JOIN good USING (doc_id)),
         |sc1 AS (SELECT doc_id, source,
         |               regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g') AS no_url
         |        FROM g),
         |sc2 AS (SELECT doc_id, source,
         |               regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |                              '<EMAIL>', 'g') AS no_email
         |        FROM sc1),
         |sc3 AS (SELECT doc_id, source,
         |               regexp_replace(no_email, '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUM>', 'g') AS clean
         |        FROM sc2),
         |tk AS (SELECT doc_id, source,
         |              CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tokens
         |       FROM sc3),
         |cm AS (
         |  SELECT doc_id, source, n_tokens,
         |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
         |  FROM tk)
         |SELECT doc_id, source, n_tokens, CAST(cum // 512 AS BIGINT) AS shard
         |FROM cm""".stripMargin,


    "q_split" ->
      """SELECT doc_id,
        |       CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                 / 4294967296.0 < 0.2
        |            THEN 'test' ELSE 'train' END AS split
        |FROM documents""".stripMargin,


    "q_group_split" ->
      """SELECT doc_id, source,
        |       CASE WHEN CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT)
        |                 / 4294967296.0 < 0.25
        |            THEN 'test' ELSE 'train' END AS split
        |FROM documents""".stripMargin,


    "q_rebalance" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |tgt AS (SELECT * FROM (VALUES
        |  ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |  ('src2', CAST(0.2 AS DOUBLE))) t(source, w)),
        |nt AS (SELECT min(n / w) AS ntarget FROM cnt JOIN tgt USING (source)),
        |rates AS (
        |  SELECT c.source, least(CAST(1.0 AS DOUBLE), t.w * nt.ntarget / c.n) AS rate
        |  FROM cnt c JOIN tgt t USING (source) CROSS JOIN nt)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN rates r USING (source)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < r.rate""".stripMargin,


    "q_upsample" ->
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |tgt AS (SELECT * FROM (VALUES
        |  ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |  ('src2', CAST(0.2 AS DOUBLE))) t(source, w)),
        |tt AS (SELECT max(n / w) AS t FROM cnt JOIN tgt USING (source)),
        |mult AS (
        |  SELECT c.source, greatest(CAST(1.0 AS DOUBLE), t.w * tt.t / c.n) AS m
        |  FROM cnt c JOIN tgt t USING (source) CROSS JOIN tt),
        |reps AS (
        |  SELECT d.doc_id, d.source,
        |         CAST(floor(coalesce(m.m, 1.0)) AS BIGINT) +
        |         CASE WHEN CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                   / 4294967296.0
        |                 < coalesce(m.m, 1.0) - floor(coalesce(m.m, 1.0))
        |              THEN 1 ELSE 0 END AS r
        |  FROM documents d LEFT JOIN mult m USING (source))
        |SELECT doc_id, source, CAST(unnest(range(r)) AS INTEGER) AS epoch FROM reps""".stripMargin,


    // Denominator replays the builder's UTF-8-key-ordered left fold:
    // list_reduce seeds with the first element, the driver seeds with
    // 0.0 — identical bits since 0.0 + x == x exactly. sqrt and the
    // divisions are correctly-rounded IEEE on both engines; max is
    // order-free; epochs' op order (w·tmax)/n matches the plan.
    "q_temp_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |d AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |             list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
        |                         (acc, e) -> acc + e) AS denom
        |      FROM c),
        |w AS (SELECT c.source, c.n_docs,
        |             CAST(c.n_docs AS DOUBLE) / CAST(d.total AS DOUBLE) AS share,
        |             sqrt(CAST(c.n_docs AS DOUBLE)) / d.denom AS temp_weight
        |      FROM c CROSS JOIN d),
        |m AS (SELECT max(CAST(n_docs AS DOUBLE) / temp_weight) AS tmax FROM w)
        |SELECT source, n_docs, share, temp_weight,
        |       temp_weight * m.tmax / CAST(n_docs AS DOUBLE) AS epochs
        |FROM w CROSS JOIN m""".stripMargin,


    "q_zorder" ->
      """WITH li AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS row_id, l_partkey, l_suppkey
        |  FROM lineitem),
        |b AS (SELECT CAST(min(l_partkey) AS BIGINT) AS minx,
        |             CAST(max(l_partkey) AS BIGINT) AS maxx,
        |             CAST(min(l_suppkey) AS BIGINT) AS miny,
        |             CAST(max(l_suppkey) AS BIGINT) AS maxy FROM li),
        |s AS (SELECT row_id, l_partkey, l_suppkey,
        |             ((l_partkey - minx) * 65535) // greatest(1, maxx - minx) AS xi,
        |             ((l_suppkey - miny) * 65535) // greatest(1, maxy - miny) AS yi
        |      FROM li CROSS JOIN b),
        |z AS (SELECT row_id, l_partkey, l_suppkey,
        |             CAST(list_sum(
        |               [((xi >> i) & 1) * (1::BIGINT << (2*i))
        |                + ((yi >> i) & 1) * (1::BIGINT << (2*i+1))
        |                for i in range(0, 16)]) AS BIGINT) AS zvalue
        |      FROM s)
        |SELECT row_id, l_partkey, l_suppkey, zvalue,
        |       zvalue >> 26 AS zbucket FROM z""".stripMargin,


    "q_kmv_distinct" ->
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


    "q_source_profile" ->
      """WITH d AS (
        |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents
        |),
        |r AS (
        |  SELECT source, n,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n NULLS FIRST, doc_id NULLS FIRST) AS rn,
        |         count(*) OVER (PARTITION BY source) AS cnt
        |  FROM d
        |)
        |SELECT source,
        |       CAST(max(cnt) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS total_tokens,
        |       max(CASE WHEN rn <= CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS p50_tokens,
        |       max(CASE WHEN rn <= CAST(ceil(0.9 * cnt) AS BIGINT) THEN n END) AS p90_tokens,
        |       max(CASE WHEN rn <= CAST(ceil(0.99 * cnt) AS BIGINT) THEN n END) AS p99_tokens
        |FROM r GROUP BY source""".stripMargin,


    "q_shard" ->
      """SELECT doc_id,
        |       md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |       CAST(floor(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |                  / 4294967296.0 * 16) AS INTEGER) AS shard
        |FROM documents""".stripMargin,

    // the oracle reads the ORIGINAL parquet — CSV equality proves the
    // quote/format/parse chain is lossless for the flat table
    "q_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    // the oracle reads the ORIGINAL parquet — equality proves the
    // JSONL serialize/escape/parse chain is byte-lossless (text is
    // compared via md5 on both engines, UTF-8 bytes each)
    "q_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents""".stripMargin,


    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           / 4294967296.0 AS h,
        |         CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 ELSE 0.25 END AS rate
        |  FROM documents)
        |WHERE h < rate""".stripMargin,


    "q_pseudonymize" ->
      """SELECT event_id,
        |       CASE WHEN user_id IS NOT NULL
        |            THEN md5('graft-r7' || ':' || CAST(user_id AS VARCHAR))
        |       END AS user_id
        |FROM events""".stripMargin,


    "q_quantile_gate" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars ASC NULLS FIRST,
        |                                     doc_id ASC NULLS FIRST) AS rn,
        |         count(*) OVER (PARTITION BY source) AS cnt
        |  FROM documents)
        |WHERE rn > ceil(0.2 * cnt)""".stripMargin,


    "q_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,


    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, CAST(cum // 512 AS BIGINT) AS shard
        |FROM c""".stripMargin,


    "q_drift" ->
      """WITH oc AS (SELECT source, count(*) AS n_old FROM documents GROUP BY 1),
        |nc AS (SELECT source, count(*) AS n_new FROM documents
        |       WHERE doc_id % 3 <> 0 GROUP BY 1),
        |j AS (SELECT COALESCE(oc.source, nc.source) AS source,
        |             COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
        |      FROM oc FULL OUTER JOIN nc ON oc.source = nc.source),
        |t AS (SELECT CAST(sum(n_old) AS BIGINT) AS tot_o,
        |             CAST(sum(n_new) AS BIGINT) AS tot_n FROM j)
        |SELECT source, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
        |       CASE WHEN tot_o > 0 THEN CAST(n_old AS DOUBLE) / CAST(tot_o AS DOUBLE) END AS frac_old,
        |       CASE WHEN tot_n > 0 THEN CAST(n_new AS DOUBLE) / CAST(tot_n AS DOUBLE) END AS frac_new,
        |       abs(COALESCE(CASE WHEN tot_n > 0 THEN CAST(n_new AS DOUBLE) / CAST(tot_n AS DOUBLE) END, 0)
        |           - COALESCE(CASE WHEN tot_o > 0 THEN CAST(n_old AS DOUBLE) / CAST(tot_o AS DOUBLE) END, 0)) AS drift
        |FROM j CROSS JOIN t""".stripMargin,


    "q_sample_k" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY md5('42:' || doc_id), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10""".stripMargin,


    "q_curriculum" ->
      """WITH r AS (SELECT doc_id,
        |                  row_number() OVER (ORDER BY n_chars, doc_id) AS curriculum_rank
        |           FROM documents),
        |t AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, curriculum_rank,
        |       CAST(((curriculum_rank - 1) * 7) // n AS INTEGER) AS shard
        |FROM r CROSS JOIN t""".stripMargin,


    "q_token_budget" ->
      """SELECT doc_id, n_chars, cum_tokens FROM (
        |  SELECT doc_id, n_chars,
        |         CAST(sum(n_chars) OVER (ORDER BY md5('42:' || doc_id), doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |WHERE cum_tokens <= 75000""".stripMargin,


    "q_prep_pipeline" ->
      """WITH ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |cg AS (
        |  SELECT doc_id,
        |         unnest(list_distinct([md5(array_to_string(toks[i:i+4], ' '))
        |                               for i in range(1, len(toks)-3)])) AS g
        |  FROM ct WHERE len(toks) >= 5
        |),
        |pr AS (SELECT doc_id AS probe_id, string_split(text, ' ') AS toks
        |       FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 20)),
        |pg AS (
        |  SELECT probe_id,
        |         unnest(list_distinct([md5(array_to_string(toks[i:i+4], ' '))
        |                               for i in range(1, len(toks)-3)])) AS g
        |  FROM pr WHERE len(toks) >= 5
        |),
        |bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN pg USING (g)
        |        WHERE cg.doc_id <> pg.probe_id),
        |clean AS (SELECT d.doc_id, d.n_chars FROM documents d ANTI JOIN bad USING (doc_id)),
        |cut AS (
        |  SELECT doc_id, n_chars, cum_tokens FROM (
        |    SELECT doc_id, n_chars,
        |           CAST(sum(n_chars) OVER (ORDER BY md5('42:' || doc_id), doc_id
        |                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |    FROM clean)
        |  WHERE cum_tokens <= 60000
        |),
        |t AS (SELECT count(*) AS n FROM cut),
        |r AS (SELECT doc_id, cum_tokens, n_chars,
        |             row_number() OVER (ORDER BY n_chars, doc_id) AS curriculum_rank
        |      FROM cut)
        |SELECT doc_id, cum_tokens, curriculum_rank,
        |       CAST(((curriculum_rank - 1) * 4) // n AS INTEGER) AS shard
        |FROM r CROSS JOIN t""".stripMargin,


    "q_source_stats" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT lang) AS n_langs,
        |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY source""".stripMargin,


    "q_curation_funnel" ->
      """WITH f AS (
        |  SELECT n_chars >= 200 AS s1,
        |         n_chars >= 200 AND len(string_split(text, ' ')) >= 30 AS s2,
        |         n_chars >= 200 AND len(string_split(text, ' ')) >= 30
        |           AND len(list_distinct(string_split(text, ' '))) * 10
        |               >= len(string_split(text, ' ')) * 3 AS s3
        |  FROM documents),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |      FROM f)
        |SELECT CAST(1 AS BIGINT) AS stage, 'len' AS label, n0 AS n_in, n1 AS n_out,
        |       CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) AS kept FROM a
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'tokens', n1, n2,
        |       CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM a
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'ttr', n2, n3,
        |       CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) FROM a""".stripMargin,


    "q_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |       CAST(count(*) AS BIGINT) AS class_size,
        |       count(*) < 5 AS at_risk
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,


    // the pow key is recomputed, ranked, and DISCARDED (libm last-ulp
    // differences survive in the value, not the rank)
    "q_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars, source,
        |         pow(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |               / 4294967296.0,
        |             CAST(1 AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS k
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
        |),
        |r AS (SELECT doc_id, n_chars, source,
        |             CAST(row_number() OVER (ORDER BY k DESC, doc_id) AS BIGINT)
        |               AS sample_rank
        |      FROM keyed)
        |SELECT doc_id, n_chars, source, sample_rank FROM r
        |WHERE sample_rank <= 100""".stripMargin,

    // same rank-not-priority convention: −ln(u)/w is replayed, ranked
    // per source, and the priority value discarded; u = (md5+1)/2^32
    // keeps ln away from 0 on both engines
    "q_weighted_key_sample" ->
      """WITH base AS (
        |  SELECT source, doc_id AS id, CAST(n_chars AS DOUBLE) AS w,
        |         (CAST(concat('0x', substr(md5('42:' || doc_id), 1, 8)) AS BIGINT) + 1)
        |           / 4294967296.0 AS u
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
        |),
        |r AS (SELECT source, id,
        |             CAST(row_number() OVER (PARTITION BY source
        |                                     ORDER BY -ln(u) / w, id) AS BIGINT) AS rank
        |      FROM base)
        |SELECT source, id, rank FROM r WHERE rank <= 5""".stripMargin,


    "q_split_chi2" ->
      """WITH a AS (SELECT source AS g,
        |                  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |                            AS BIGINT) / 4294967296.0 < 0.2
        |                       THEN 'test' ELSE 'train' END AS split
        |           FROM documents),
        |cell AS (SELECT g, split, CAST(count(*) AS BIGINT) AS o FROM a GROUP BY 1, 2),
        |gt AS (SELECT g, CAST(sum(o) AS BIGINT) AS ng FROM cell GROUP BY 1),
        |st AS (SELECT split, CAST(sum(o) AS BIGINT) AS ns FROM cell GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cell),
        |grid AS (SELECT gt.g, st.split, gt.ng, st.ns, coalesce(cell.o, 0) AS o
        |         FROM gt CROSS JOIN st
        |         LEFT JOIN cell ON cell.g = gt.g AND cell.split = st.split),
        |terms AS (
        |  SELECT (CAST(o AS DOUBLE)
        |          - CAST(ng AS DOUBLE) * CAST(ns AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |         * (CAST(o AS DOUBLE)
        |            - CAST(ng AS DOUBLE) * CAST(ns AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |         / (CAST(ng AS DOUBLE) * CAST(ns AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS t
        |  FROM grid CROSS JOIN nn)
        |SELECT nn.n AS n_rows, g2.k AS n_groups,
        |       (g2.k - 1) * (s2.k - 1) AS dof, ch.chi2
        |FROM nn
        |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS k FROM gt) g2
        |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS k FROM st) s2
        |CROSS JOIN (SELECT list_reduce(list_sort(list(t)), (x, y) -> x + y) AS chi2
        |            FROM terms) ch""".stripMargin,


    "q_kfold" ->
      """SELECT doc_id, source,
        |       least(CAST(floor(CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT)
        |                        / 4294967296.0 * 5) AS BIGINT), 4) AS fold
        |FROM documents""".stripMargin,
  )
}
