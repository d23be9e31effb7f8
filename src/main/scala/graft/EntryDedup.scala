package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Deduplication and decontamination: exact, MinHash/SimHash/embedding near-dup, components, passage dedup, incremental index, budget sweeps.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryDedup {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── LLM-pipeline: exact dedup (content-hash group-by) ───────────
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(Tables(s, dir, "documents"), "doc_id", Seq("text"))
    }),


    // ── LLM-pipeline: MinHash LSH band buckets ──────────────────────
    // Integer universal-hash minima over one md5-derived base hash per
    // trigram shingle (parity mode — bit-exact in DuckDB), banded 8×2.
    // The bucket table IS the scale-path data structure: near-dup
    // candidates come from joining it to itself per (band, bucket) —
    // never an all-pairs product.
    "q_minhash_bands" -> ((s, dir) => {
      Dedup.minhashBuckets(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, parity = true)
    }),


    // ── LLM-pipeline: near-dup candidates + exact-Jaccard verify ────
    "q_neardup_pairs" -> ((s, dir) => {
      Dedup.nearDuplicates(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.0, parity = true)
    }),


    // ── LLM-pipeline: near-dup clusters via connected components ────
    // Pairs (Jaccard ≥ 0.5) → transitive closure: each doc labeled
    // with its cluster's minimum id — the one-representative-per-
    // cluster semantics that per-pair dropping can't express.
    "q_components" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Dedup.connectedComponents(pairs)
    }),


    // ── LLM-pipeline: cluster-level dedup (components anti-join) ────
    "q_cluster_dedup" -> ((s, dir) => {
      Dedup.dropNearDupClusters(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.5, parity = true)
        .select(col("doc_id"), col("lang"), col("source"))
    }),


    // ── LLM-pipeline: quality-aware cluster dedup (keep best copy) ──
    // Same component closure as q_cluster_dedup, but each dup cluster
    // keeps its LONGEST document (max n_chars, min doc_id tie) — the
    // keep-the-best-copy rule real curation uses — via the max_by
    // partial agg, never a ranking window over the corpus.
    "q_cluster_best" -> ((s, dir) => {
      Dedup.dropNearDupClustersKeepBest(Tables(s, dir, "documents"), "doc_id", "text",
        scoreCol = "n_chars", n = 3, h = 16, b = 8, minSim = 0.5, parity = true)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),


    // ── LLM-pipeline: per-source duplication audit ──────────────────
    // Docs / distinct contents / dup overhead / content shared with
    // other sources, one row per source; everything shuffled is
    // (source, md5) counts — text never leaves the scan stage.
    "q_dedup_report" -> ((s, dir) => {
      Dedup.dedupReport(Tables(s, dir, "documents"), Seq("text"), "source")
    }),


    // ── LLM-pipeline: snapshot diff (corpus version delta audit) ────
    // "New crawl" derived deterministically from documents: docs with
    // doc_id%7=0 dropped, text of doc_id%5=0 revised, and a fresh id
    // block added for doc_id%11=0 — the diff must report exactly the
    // removed/changed/added deltas (mirrored in the oracle).
    "q_snapshot_diff" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val cur = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Curation.snapshotDiff(docs, cur, "doc_id", Seq("text"))
    }),


    // ── LLM-pipeline: incremental dedup — batch vs corpus index ─────
    // Continuous ingestion: docs with doc_id % 4 == 0 arrive as a new
    // batch and are deduped against an INDEX of the already-admitted
    // corpus (the other 3/4) — exact content hashes first, then a
    // minhash-signature near-dup join (agreement ≥ 0.5), never
    // re-scanning corpus text. The kept doc_ids are what a full
    // re-dedup would admit from the batch.
    "q_incremental" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val b1 = Dedup.dropSeenExact(batch, Dedup.exactIndex(corpus, Seq("text")), Seq("text"))
      Dedup.dropSeenNearDup(b1,
        Dedup.minhashIndex(corpus, "doc_id", "text", n = 3, h = 16, parity = true),
        "doc_id", "text", n = 3, h = 16, b = 8,
        minAgree = 0.5, parity = true, maxBucket = 100)
        .select(col("doc_id"), col("source"))
    }),


    // ── LLM-pipeline: PERSISTED MinHash index (build → append → load
    // → serve — VERDICT r13 item 3, the last persistence artifact
    // without a gate row). Two-thirds of the admitted corpus is the
    // initial writeMinhashIndex; the rest arrives as an
    // appendMinhashIndex batch signed with the index's own STORED
    // hash family; the new batch is then deduped through
    // readMinhashIndex (freshness gate: family match + row count) —
    // and must admit EXACTLY what the in-memory minhashIndex over the
    // full corpus admits, which is what the oracle replays: a lost
    // append row, a family drift, or a signature fidelity loss in the
    // parquet round trip all surface as a hash mismatch.
    "q_minhash_persist" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val path = sessionTmpDir(s, "minhash_idx", dir)
      Dedup.writeMinhashIndex(corpus.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text", path, n = 3, h = 16, parity = true)
      Dedup.appendMinhashIndex(s, corpus.filter(col("doc_id") % 3 === 0),
        "doc_id", "text", path)
      // compaction under the hash gate (VERDICT r15 item 5): the
      // write-aside + rename swap must serve byte-identically — a
      // lost row, a doubled row, or meta drift through the swap all
      // hash-mismatch here
      Dedup.compactMinhashIndex(s, path)
      val idx = Dedup.readMinhashIndex(s, path, n = 3, h = 16, parity = true)
      Dedup.dropSeenNearDup(batch, idx, "doc_id", "text", n = 3, h = 16, b = 8,
        minAgree = 0.5, parity = true, maxBucket = 100)
        .select(col("doc_id"), col("source"))
    }),


    // ── LLM-pipeline: MinHash index DELETION (VERDICT r16 item 2) ──
    // The takedown lifecycle for the near-dup index: tombstone-delete
    // a third of the indexed corpus (deleted docs stop VETOING batch
    // docs immediately — 'masked' phase), compact (tombstoned
    // signatures drop physically), re-append half the deleted docs
    // (legal re-admission), dedup again ('final' phase). The oracle
    // replays both phases against the respective surviving index
    // sides; a leaky mask, a compaction dropping the wrong rows, or a
    // failed re-append all hash-mismatch.
    "q_minhash_delete" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val path = sessionTmpDir(s, "minhash_del", dir)
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", path,
        n = 3, h = 16, parity = true)
      Dedup.deleteFromMinhashIndex(s,
        corpus.filter(col("doc_id") % 3 === 1).select("doc_id"), "doc_id", path)
      def serve() = Dedup.dropSeenNearDup(batch,
          Dedup.readMinhashIndex(s, path, n = 3, h = 16, parity = true),
          "doc_id", "text", n = 3, h = 16, b = 8,
          minAgree = 0.5, parity = true, maxBucket = 100)
        .select(col("doc_id"), col("source"))
      // pin the masked verdicts BEFORE compact swaps the data files —
      // batch-sized, driver-bounded
      val masked = serve().withColumn("phase", lit("masked"))
        .localCheckpoint(eager = true)
      Dedup.compactMinhashIndex(s, path)
      Dedup.appendMinhashIndex(s, corpus.filter(col("doc_id") % 6 === 1),
        "doc_id", "text", path)
      masked.unionByName(serve().withColumn("phase", lit("final")))
        .select("phase", "doc_id", "source")
    }),


    // ── LLM-pipeline: cross-corpus overlap audit ────────────────────
    // "Is the new dataset actually new?" — fraction of the batch
    // already present (by content hash) in the corpus, before paying
    // for a merge+dedup. Hashes shuffle; text never moves.
    "q_overlap" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.overlapStats(
        docs.filter(col("doc_id") % 4 =!= 0), Seq("text"),
        docs.filter(col("doc_id") % 4 === 0), Seq("text"))
    }),


    // ── LLM-pipeline: near-dup, xxhash64 scale path (default mode) ──
    // Same banded-LSH shape with the Spark-only masked-xxhash64 base
    // hash — the production default (no md5 at all). The hash family
    // itself is not SQL-expressible, so the driver gate rides the
    // hash-family-FREE invariant: docs with IDENTICAL distinct
    // shingle sets get identical MinHash signatures whatever the base
    // hash, every band collides, and banded LSH finds the pair with
    // recall 1 (maxBucket is sized above the corpus, so no bucket is
    // dropped). `sim` is the exact verification Jaccard — never an
    // estimate — so sim = 1.0 selects exactly the set-equal pairs,
    // which the oracle recomputes by direct set equality with no
    // MinHash at all. A planted block of exact copies (+10^6 id
    // offset, clear of ScaleUp's 10^7 replica stride) keeps the gate
    // non-vacuous: a broken signature, banding, bucket join, or
    // verification join all surface as missing/extra rows here. The
    // full candidate+verify work still runs — the invariant is a
    // post-filter, not a shortcut.
    "q_neardup_fast" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val planted = docs.filter(col("doc_id") % 25 === 3)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      Dedup.nearDuplicates(docs.unionByName(planted), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.0, parity = false, maxBucket = 10000)
        .filter(col("sim") === 1.0)
        .select(col("id1"), col("id2"))
    }),


    // ── LLM-pipeline: edit-distance-verified near-dup pairs ─────────
    // Same md5-parity LSH candidates as q_neardup_pairs, verified by
    // normalized Levenshtein instead of n-gram Jaccard — the
    // character-churn policy. O(len²) work rides only the bucketed
    // candidate pair table.
    "q_edit_neardup" -> ((s, dir) => {
      Dedup.editNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.8, parity = true)
    }),


    // ── LLM-pipeline: EXACT Jaccard set-similarity self-join ────────
    // Prefix-filtered AllPairs over trigram shingle sets (no false
    // negatives — the exact complement to the MinHash path; the
    // brute-force oracle catches any missed pair). Planted positives:
    // every 20th doc re-enters with its first token dropped (shingle
    // Jaccard stays high), so the gate can't pass vacuously.
    "q_jaccard_join" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text"))
      Dedup.jaccardJoin(docs.unionByName(variants), "doc_id", "text",
        minSim = 0.6, n = 3)
    }),


    // ── LLM-pipeline: 64-bit SimHash document fingerprints ──────────
    "q_simhash" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash(Dedup.tokens(col("text"))).as("fp"))
    }),


    // ── LLM-pipeline: SimHash near-dup via banded Hamming LSH ───────
    // Pigeonhole: ≤3 differing bits over 4 bands ⇒ one band matches
    // exactly, so the band join has perfect recall at the threshold.
    // maxBucket = 100 (~2% of the sf0.1 corpus) drops (band,
    // substring) keys shared by boilerplate fingerprint clusters —
    // the m² skew guard, mirrored in the oracle's hot-bucket CTE.
    "q_simhash_neardup" -> ((s, dir) => {
      Dedup.simhashNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, maxBucket = 100)
    }),


    // ── LLM-pipeline: embedding-cosine near-dup (dense-vector dedup) ─
    // Candidates from the hyperplane-LSH bucket self-join, verified
    // with exact cosine ≥ 0.3. Two scale guards, both active:
    //  - bits = autoBits(n): bucket space grows with the corpus so
    //    expected bucket size (and candidates per vector) stays
    //    constant — 4 bits at the sf0.01 gate, 6 at sf0.1, 10 at sf1
    //    instead of going quadratic. The oracle (sqlAnnIndexAuto)
    //    replays the SAME integer bits derivation from count(*), so
    //    the gate stays hash-exact at any verify scale. Costs one
    //    count() at plan time.
    //  - maxBucket = 400: the hot-cluster blacklist (identical
    //    vectors share EVERY table-bucket regardless of bits),
    //    mirrored in the oracle's anti-join CTE; with autoBits
    //    holding buckets near 32 the fixed cap stays ~12× the
    //    expected size at every corpus scale — only pathological
    //    clusters trip it.
    "q_embed_neardup" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val bits = Dedup.autoBits(emb.count(), targetBucket = 32, minBits = 4)
      Dedup.embeddingNearDup(emb, "vec_id", "embedding",
        minSim = 0.3, tables = 8, bits = bits, d = 64, maxBucket = 400)
    }),


    // ── LLM-pipeline: SemDeDup semantic near-dup (K-Means-pruned) ───
    // The data-dependent twin of q_embed_neardup: candidates come
    // from a K-Means cell partition instead of random hyperplanes —
    // pairs are verified (exact cosine ≥ 0.3) only within a cluster,
    // so the pair space is Σ cluster², with the maxCluster blacklist
    // guarding skewed cells (mirrored in the oracle's HAVING CTE).
    // FirstK(8) centroids keep the assignment deterministic for the
    // oracle; at scale train centroids on a sample with k ≈ n/target.
    "q_semdedup" -> ((s, dir) => {
      Dedup.semanticNearDup(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        cents8(s, dir), minSim = 0.3, maxCluster = 200)
    }),


    // ── LLM-pipeline: passage-level exact dedup (C4-style spans) ────
    // 8-token passages; first corpus-wide occurrence wins (partial
    // MIN agg on an integer encoding — no window on the passage key).
    "q_passage_dedup" -> ((s, dir) => {
      Dedup.dedupPassages(Tables(s, dir, "documents"), "doc_id", "text", width = 8)
    }),


    // ── LLM-pipeline: winnowing fingerprints (local-overlap dedup) ──
    "q_winnow" -> ((s, dir) => {
      TextAnalysis.winnow(Tables(s, dir, "documents"), "doc_id", "text", k = 5, w = 4)
    }),


    // ── LLM-pipeline: winnow-based near-dup (shared-passage pairs) ──
    // maxDocsPerFp=100 drops the common-gram fingerprints that carry
    // ~ALL the join volume and no signal (at sf0.1 they account for
    // 678M of 678.4M join rows); pairs then share RARE fingerprints
    // only, which is the discriminative signal.
    "q_winnow_pairs" -> ((s, dir) => {
      Dedup.winnowNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4, minShared = 10, maxDocsPerFp = 100)
    }),


    // ── LLM-pipeline: rolling-hash document fingerprint ─────────────
    "q_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    }),


    // ── LLM-pipeline: split-leakage audit ───────────────────────────
    // Near-dup pairs straddling a per-row train/test split — the
    // eval-contamination measurement that motivates groupSplit. The
    // synthetic corpus HAS near-dups, so a per-doc_id split leaks;
    // the audit must list exactly the crossing pairs.
    "q_leakage" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = nearDupPairs05(s, dir)
      Sampling.splitLeakage(pairs, "id1", "id2",
        Sampling.trainTestSplit(docs, "doc_id", testFrac = 0.2), "doc_id")
    }),


    // ── LLM-pipeline: split repair — drop leaked test docs ──────────
    // The fix for what q_leakage measures: remove every test doc that
    // near-dup-pairs across the split (removal cannot create new
    // leaks; train is untouched). Output: surviving assignment rows.
    "q_split_clean" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val pairs = nearDupPairs05(s, dir)
      Sampling.dropLeakedTest(
          Sampling.trainTestSplit(docs, "doc_id", testFrac = 0.2), "doc_id",
          pairs, "id1", "id2")
        .select(col("doc_id"), col("split"))
    }),


    // ── curation: best document per (source, lang) — argmax keep ────
    // max_by partial aggregate (one candidate per key per task), not
    // a ranking window; longest doc wins, lowest doc_id breaks ties.
    "q_keep_best" -> ((s, dir) => {
      Curation.keepBestPerKey(Tables(s, dir, "documents"),
        Seq("source", "lang"), "n_chars", "doc_id")
    }),


    // ── curation: benchmark decontamination (winnow fp overlap) ─────
    // Corpus docs sharing ≥10 winnow fingerprints with any of the 5
    // lowest-id "benchmark" docs; probe side broadcast, corpus never
    // shuffled. Identity matches excluded (probes live in the corpus
    // here).
    "q_contamination" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val probes = docs.orderBy(col("doc_id")).limit(5)
        .select(col("doc_id"), col("text"))
      Curation.winnowContamination(docs, "doc_id", "text",
        probes, "doc_id", "text", k = 5, w = 4, minShared = 10)
        .filter(col("doc_id") =!= col("probe_id"))
    }),


    // ── curation: exact n-gram decontamination (13-gram standard) ───
    // Corpus docs sharing any exact word 5-gram with one of the 20
    // lowest-id "benchmark" docs; grams md5-compressed, probe side
    // broadcast. Identity matches excluded (probes live in the
    // corpus here).
    "q_ngram_decontam" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val probes = docs.orderBy(col("doc_id")).limit(20)
        .select(col("doc_id"), col("text"))
      Curation.ngramContamination(docs, "doc_id", "text",
        probes, "doc_id", "text", n = 5, minShared = 1)
        .filter(col("doc_id") =!= col("probe_id"))
    }),


    // ── dedup: the DROP operator (keep lowest id per content) ───────
    "q_dedup_kept" -> ((s, dir) => {
      Dedup.dropExactDuplicates(Tables(s, dir, "documents"), "doc_id", Seq("text"))
        .select(col("doc_id"))
    }),


    // ── graph: connected components via large-star/small-star ───────
    // Same output contract as q_components (min-id label per node),
    // run against the IDENTICAL oracle SQL — the O(log²) alternation
    // path for graphs whose diameter would stall min-label
    // propagation.
    "q_components_star" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Dedup.componentsStar(pairs)
    }),


    // ── curation: Bloom-prefiltered exact decontamination ───────────
    // Probe set = every 23rd doc's text (a stand-in eval set); the
    // bloom clears the definitely-clean slice without a join, the
    // might-contain sliver pays the exact verification anti-join.
    "q_bloom_decontam" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val probe = docs.filter(pmod(col("doc_id"), lit(23L)) === 0L).select(col("text"))
      Curation.bloomDecontaminate(docs, "text", probe, "text",
        expectedItems = 4096L, fpp = 0.01)
        .select(col("doc_id"), col("source"))
    }),


    // ── dedup: MinHash estimate-vs-exact calibration audit ──────────
    // |est − exact| per candidate pair — the sketch-accuracy twin of
    // q_ann_recall, on the md5-parity signature chain.
    "q_minhash_calib" -> ((s, dir) => {
      Dedup.minhashCalibration(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, parity = true)
    }),


    // ── LLM-pipeline: cross-source duplication matrix ───────────────
    // Which sources near-duplicate into which (unordered source
    // pairs, diagonal = within-source dup pressure) — the syndication
    // map that decides per-source dedup policy. Pair fixture + two
    // compact-key joins.
    "q_dup_matrix" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id1"), col("source").as("__s1")), "id1")
        .join(src.select(col("doc_id").as("id2"), col("source").as("__s2")), "id2")
        .groupBy(least(col("__s1"), col("__s2")).as("source_a"),
          greatest(col("__s1"), col("__s2")).as("source_b"))
        .agg(count(lit(1)).cast("long").as("n_pairs"))
    }),


    // ── LLM-pipeline: near-dup similarity threshold sweep ───────────
    // Surviving pair counts at each Jaccard cutoff over the shared
    // pair fixture — the "how aggressive is this dedup recipe" dial,
    // read next to q_lsh_budget's candidate bill. One pass, all
    // thresholds in one aggregate.
    "q_threshold_sweep" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir)
      val ts = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
      val sums = ts.map(t =>
        sum(when(col("sim") >= t, 1L).otherwise(0L)).cast("long")
          .as(s"__n${(t * 10).toInt}"))
      pairs.agg(sums.head, sums.tail: _*)
        .select(explode(array(ts.map(t =>
          struct(lit(t).as("min_sim"),
            col(s"__n${(t * 10).toInt}").as("n_pairs"))): _*)).as("__p"))
        .select(col("__p.min_sim").as("min_sim"), col("__p.n_pairs").as("n_pairs"))
    }),


    // ── LLM-pipeline: LSH parameter-sweep candidate budget ──────────
    // The (b, r) tuning table: bucket counts + candidate-pair join
    // cost per band config, measured on the real corpus (md5 parity
    // mode so the oracle replays the signature chain bit-for-bit).
    "q_lsh_budget" -> ((s, dir) => {
      Dedup.lshBudget(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, bs = Seq(4, 8, 16), parity = true)
    }),


    // ── LLM-pipeline: eval-contamination containment score ──────────
    // Lee-et-al-style setwise coverage: what fraction of each probe
    // doc's distinct 13-token grams the corpus contains anywhere —
    // the decision number for a "drop evals above τ" rule, where
    // ngramContamination reports the pairwise WHO.
    "q_containment" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.containmentScore(docs.filter(col("doc_id") % 10 =!= 0), "text",
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", n = 13)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q_passage_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |u AS (SELECT doc_id, toks, n,
        |             unnest(range(1, greatest(1, n) + 1, 8)) AS s FROM t),
        |c AS (SELECT doc_id, CAST((s - 1) // 8 AS BIGINT) AS chunk_id,
        |             array_to_string(list_slice(toks, s, s + 7), ' ') AS chunk_text
        |      FROM u),
        |w AS (SELECT chunk_text, min(doc_id * 1048576 + chunk_id) AS win
        |      FROM c GROUP BY 1),
        |k AS (SELECT c.doc_id, c.chunk_id, c.chunk_text FROM c
        |      JOIN w ON c.chunk_text = w.chunk_text
        |            AND c.doc_id * 1048576 + c.chunk_id = w.win),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM c GROUP BY 1),
        |kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |                string_agg(chunk_text, ' ' ORDER BY chunk_id) AS clean_text
        |         FROM k GROUP BY 1)
        |SELECT tot.doc_id,
        |       coalesce(kept.clean_text, '') AS clean_text,
        |       coalesce(kept.n_kept, 0) AS n_kept,
        |       tot.n_chunks - coalesce(kept.n_kept, 0) AS n_dropped
        |FROM tot LEFT JOIN kept USING (doc_id)""".stripMargin,


    "q_winnow" ->
      s"""WITH $sqlWinnowMins
         |SELECT doc_id, array_to_string(list_sort(list_distinct(mins)), ',') AS fps
         |FROM mins""".stripMargin,


    "q_winnow_pairs" ->
      s"""WITH $sqlWinnowMins,
         |fp0 AS (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM mins),
         |hot AS (SELECT f FROM fp0 GROUP BY f HAVING count(*) > 100),
         |fp AS (SELECT * FROM fp0 WHERE f NOT IN (SELECT f FROM hot))
         |SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n_shared
         |FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
         |GROUP BY 1, 2
         |HAVING count(*) >= 10""".stripMargin,


    "q_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')],
        |                   (acc, c) -> (acc * 31 + c) % 2147483647) AS fp
        |FROM documents""".stripMargin,


    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,


    "q_minhash_bands" ->
      s"""WITH $sqlMinhash
         |SELECT doc_id, band, bucket FROM bb""".stripMargin,


    "q_neardup_pairs" ->
      s"""WITH $sqlMinhash,
         |$sqlCandJaccard
         |SELECT id1, id2, sim FROM simpairs""".stripMargin,


    "q_edit_neardup" ->
      s"""WITH $sqlMinhash,
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |),
         |scored AS (
         |  SELECT c.id1, c.id2,
         |         CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS lev,
         |         CASE WHEN greatest(len(d1.text), len(d2.text)) = 0 THEN 1.0
         |              ELSE 1.0 - CAST(levenshtein(d1.text, d2.text) AS DOUBLE)
         |                         / CAST(greatest(len(d1.text), len(d2.text)) AS DOUBLE) END AS edit_sim
         |  FROM cand c
         |  JOIN documents d1 ON d1.doc_id = c.id1
         |  JOIN documents d2 ON d2.doc_id = c.id2
         |)
         |SELECT id1, id2, lev, edit_sim FROM scored WHERE edit_sim >= 0.8""".stripMargin,


    // Brute-force twin of the prefix-filtered exact join: the engine
    // prunes with rarity prefixes + length bounds; the oracle checks
    // ALL pairs — any missed pair (false negative) hash-fails.
    "q_jaccard_join" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 20 = 0
        |),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM base),
        |s AS (
        |  SELECT doc_id,
        |         list_distinct([array_to_string(t[i : i + 2], ' ')
        |                        for i in range(1, len(t) - 1)]) AS sh
        |  FROM toks WHERE len(t) >= 3
        |),
        |s2 AS (SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS n
        |       FROM s WHERE len(sh) > 0),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |         CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
        |         a.n AS la, b.n AS lb
        |  FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
        |)
        |SELECT id1, id2, CAST(inter AS DOUBLE) / (la + lb - inter) AS jaccard
        |FROM p WHERE inter > 0
        |  AND CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.6""".stripMargin,


    // Hash-family-free gate for the xxhash64 scale path: the TRUE
    // set-equal pairs (guaranteed-recall slice of any MinHash LSH),
    // computed by direct shingle-set equality — no MinHash chain.
    "q_neardup_fast" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 3
        |),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM u),
        |sh AS (
        |  SELECT doc_id,
        |         list_sort(list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])) AS s
        |  FROM toks WHERE len(toks) >= 3
        |)
        |SELECT a.doc_id AS id1, b.doc_id AS id2
        |FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id""".stripMargin,


    "q_split_clean" ->
      s"""WITH $sqlMinhash,
         |$sqlCandJaccard,
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |                   / 4294967296.0 < 0.2
         |              THEN 'test' ELSE 'train' END AS split
         |  FROM documents
         |),
         |cx AS (
         |  SELECT p.id1, p.id2, s1.split AS split1, s2.split AS split2
         |  FROM simpairs p
         |  JOIN sp s1 ON s1.doc_id = p.id1
         |  JOIN sp s2 ON s2.doc_id = p.id2
         |  WHERE p.sim >= 0.5 AND s1.split <> s2.split
         |),
         |doomed AS (
         |  SELECT id1 AS doc_id FROM cx WHERE split1 = 'test'
         |  UNION
         |  SELECT id2 FROM cx WHERE split2 = 'test'
         |)
         |SELECT sp.doc_id, sp.split FROM sp ANTI JOIN doomed USING (doc_id)""".stripMargin,


    "q_leakage" ->
      s"""WITH $sqlMinhash,
         |$sqlCandJaccard,
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |                   / 4294967296.0 < 0.2
         |              THEN 'test' ELSE 'train' END AS split
         |  FROM documents
         |)
         |SELECT p.id1, p.id2, s1.split AS split1, s2.split AS split2
         |FROM simpairs p
         |JOIN sp s1 ON s1.doc_id = p.id1
         |JOIN sp s2 ON s2.doc_id = p.id2
         |WHERE p.sim >= 0.5 AND s1.split <> s2.split""".stripMargin,


    "q_components" ->
      s"""WITH $sqlNearDupReach
         |SELECT id, min(comp) AS component FROM reach GROUP BY id""".stripMargin,


    "q_cluster_dedup" ->
      s"""WITH $sqlNearDupReach,
         |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)""".stripMargin,


    "q_cluster_best" ->
      s"""WITH $sqlNearDupReach,
         |comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |best AS (
         |  SELECT doc_id FROM (
         |    SELECT d.doc_id,
         |           row_number() OVER (PARTITION BY c.component
         |                              ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |    FROM documents d JOIN comp c ON d.doc_id = c.id)
         |  WHERE rn = 1
         |)
         |SELECT doc_id, source, n_chars FROM documents
         |WHERE doc_id IN (SELECT doc_id FROM best)
         |   OR doc_id NOT IN (SELECT id FROM comp)""".stripMargin,


    "q_dedup_report" ->
      """WITH gh AS (
        |  SELECT source, md5(text) AS h, count(*) AS n
        |  FROM documents GROUP BY 1, 2
        |),
        |spread AS (SELECT h, count(*) AS n_groups FROM gh GROUP BY h)
        |SELECT gh.source,
        |       CAST(sum(gh.n) AS BIGINT) AS docs,
        |       CAST(count(*) AS BIGINT) AS distinct_keys,
        |       CAST(sum(gh.n) - count(*) AS BIGINT) AS dup_docs,
        |       CAST(sum(CASE WHEN spread.n_groups > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_keys
        |FROM gh JOIN spread USING (h)
        |GROUP BY gh.source""".stripMargin,


    "q_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
        |cur0 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
        |),
        |cur AS (SELECT doc_id, md5(text) AS h FROM cur0)
        |SELECT COALESCE(old.doc_id, cur.doc_id) AS doc_id,
        |       CASE WHEN old.h IS NULL THEN 'added'
        |            WHEN cur.h IS NULL THEN 'removed'
        |            WHEN old.h <> cur.h THEN 'changed' END AS status
        |FROM old FULL OUTER JOIN cur ON old.doc_id = cur.doc_id
        |WHERE (old.h IS NULL OR cur.h IS NULL OR old.h <> cur.h)""".stripMargin,


    "q_overlap" ->
      """WITH av AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 4 <> 0),
        |bv AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 4 = 0),
        |j AS (SELECT bv.h, CASE WHEN av.h IS NOT NULL THEN 1 ELSE 0 END AS hit
        |      FROM bv LEFT JOIN av USING (h))
        |SELECT CAST(count(*) AS BIGINT) AS n_b,
        |       CAST(sum(hit) AS BIGINT) AS n_exact,
        |       CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_exact
        |FROM j""".stripMargin,


    "q_incremental" ->
      s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
         |idx AS (SELECT DISTINCT md5(text) AS h FROM corpus),
         |b0 AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
         |b1 AS (SELECT b0.* FROM b0 ANTI JOIN idx ON md5(b0.text) = idx.h),
         |${sqlSigChainOn("corpus", "c")},
         |${sqlSigChainOn("b1", "b")},
         |hot AS (SELECT band, bucket FROM cbb GROUP BY 1, 2 HAVING count(*) > 100),
         |cbbc AS (SELECT cbb.* FROM cbb ANTI JOIN hot USING (band, bucket)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS bid, y.doc_id AS cid
         |  FROM bbb x JOIN cbbc y USING (band, bucket)
         |),
         |agr AS (
         |  SELECT cand.bid,
         |         CAST(list_sum(list_transform(list_zip(bs.sig, cs.sig),
         |                       p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE)
         |           / 16.0 AS agree
         |  FROM cand JOIN bsig bs ON bs.doc_id = cand.bid
         |            JOIN csig cs ON cs.doc_id = cand.cid
         |),
         |doomed AS (SELECT DISTINCT bid FROM agr WHERE agree >= 0.5)
         |SELECT doc_id, source FROM b1 ANTI JOIN doomed ON b1.doc_id = doomed.bid""".stripMargin,


    // q_incremental's near-dup stage with NO exact pre-filter: the
    // persisted build+append+load index must serve exactly what the
    // in-memory full-corpus signature table serves.
    "q_minhash_persist" ->
      s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
         |b0 AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
         |${sqlSigChainOn("corpus", "c")},
         |${sqlSigChainOn("b0", "b")},
         |hot AS (SELECT band, bucket FROM cbb GROUP BY 1, 2 HAVING count(*) > 100),
         |cbbc AS (SELECT cbb.* FROM cbb ANTI JOIN hot USING (band, bucket)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS bid, y.doc_id AS cid
         |  FROM bbb x JOIN cbbc y USING (band, bucket)
         |),
         |agr AS (
         |  SELECT cand.bid,
         |         CAST(list_sum(list_transform(list_zip(bs.sig, cs.sig),
         |                       p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE)
         |           / 16.0 AS agree
         |  FROM cand JOIN bsig bs ON bs.doc_id = cand.bid
         |            JOIN csig cs ON cs.doc_id = cand.cid
         |),
         |doomed AS (SELECT DISTINCT bid FROM agr WHERE agree >= 0.5)
         |SELECT doc_id, source FROM b0 ANTI JOIN doomed ON b0.doc_id = doomed.bid""".stripMargin,


    // the delete lifecycle: masked phase dedups against the corpus
    // minus the deleted third (doc_id % 3 = 1); final phase (post-
    // compact + re-append of the % 6 = 1 half) against the corpus
    // minus doc_id % 6 = 4 — both replayed as independent index sides
    "q_minhash_delete" ->
      s"""WITH corpus1 AS (SELECT * FROM documents WHERE doc_id % 4 <> 0 AND doc_id % 3 <> 1),
         |corpus2 AS (SELECT * FROM documents WHERE doc_id % 4 <> 0 AND doc_id % 6 <> 4),
         |b0 AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
         |${sqlSigChainOn("corpus1", "m")},
         |${sqlSigChainOn("corpus2", "f")},
         |${sqlSigChainOn("b0", "b")},
         |mhot AS (SELECT band, bucket FROM mbb GROUP BY 1, 2 HAVING count(*) > 100),
         |mbbc AS (SELECT mbb.* FROM mbb ANTI JOIN mhot USING (band, bucket)),
         |mcand AS (
         |  SELECT DISTINCT x.doc_id AS bid, y.doc_id AS cid
         |  FROM bbb x JOIN mbbc y USING (band, bucket)
         |),
         |magr AS (
         |  SELECT mcand.bid,
         |         CAST(list_sum(list_transform(list_zip(bs.sig, cs.sig),
         |                       p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE)
         |           / 16.0 AS agree
         |  FROM mcand JOIN bsig bs ON bs.doc_id = mcand.bid
         |             JOIN msig cs ON cs.doc_id = mcand.cid
         |),
         |mdoomed AS (SELECT DISTINCT bid FROM magr WHERE agree >= 0.5),
         |fhot AS (SELECT band, bucket FROM fbb GROUP BY 1, 2 HAVING count(*) > 100),
         |fbbc AS (SELECT fbb.* FROM fbb ANTI JOIN fhot USING (band, bucket)),
         |fcand AS (
         |  SELECT DISTINCT x.doc_id AS bid, y.doc_id AS cid
         |  FROM bbb x JOIN fbbc y USING (band, bucket)
         |),
         |fagr AS (
         |  SELECT fcand.bid,
         |         CAST(list_sum(list_transform(list_zip(bs.sig, cs.sig),
         |                       p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END)) AS DOUBLE)
         |           / 16.0 AS agree
         |  FROM fcand JOIN bsig bs ON bs.doc_id = fcand.bid
         |             JOIN fsig cs ON cs.doc_id = fcand.cid
         |),
         |fdoomed AS (SELECT DISTINCT bid FROM fagr WHERE agree >= 0.5)
         |SELECT 'masked' AS phase, doc_id, source
         |FROM b0 ANTI JOIN mdoomed ON b0.doc_id = mdoomed.bid
         |UNION ALL
         |SELECT 'final' AS phase, doc_id, source
         |FROM b0 ANTI JOIN fdoomed ON b0.doc_id = fdoomed.bid""".stripMargin,


    "q_simhash" ->
      s"""WITH $sqlSimhashFp
         |SELECT doc_id, fp FROM fpt""".stripMargin,


    "q_simhash_neardup" ->
      s"""WITH $sqlSimhashFp,
         |bx0 AS (
         |  SELECT doc_id, fp, bi, substr(fp, bi*4+1, 4) AS bk
         |  FROM fpt CROSS JOIN range(0, 4) t(bi)
         |),
         |bxh AS (SELECT bi, bk FROM bx0 GROUP BY 1, 2 HAVING count(*) > 100),
         |bx AS (SELECT bx0.* FROM bx0 ANTI JOIN bxh USING (bi, bk)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, x.fp AS fp1, y.doc_id AS id2, y.fp AS fp2
         |  FROM bx x JOIN bx y ON x.bi = y.bi AND x.bk = y.bk AND x.doc_id < y.doc_id
         |),
         |hm AS (
         |  SELECT id1, id2,
         |         CAST(list_sum([bit_count(xor(CAST(concat('0x', substr(fp1, p, 1)) AS BIGINT),
         |                                      CAST(concat('0x', substr(fp2, p, 1)) AS BIGINT)))
         |                        for p in range(1, 17)]) AS INTEGER) AS hamming
         |  FROM cand
         |)
         |SELECT id1, id2, hamming FROM hm WHERE hamming <= 3""".stripMargin,


    "q_embed_neardup" ->
      s"""WITH $sqlAnnIndexAuto,
         |bkh AS (SELECT tbl, bucket FROM bk GROUP BY 1, 2 HAVING count(*) > 400),
         |bkc AS (SELECT bk.* FROM bk ANTI JOIN bkh USING (tbl, bucket)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id1, y.vec_id AS id2
         |  FROM bkc x JOIN bkc y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
         |),
         |s AS (
         |  SELECT c.id1, c.id2,
         |         ${sqlCosine("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS sim
         |  FROM cand c
         |  JOIN embeddings a ON a.vec_id = c.id1
         |  JOIN embeddings b ON b.vec_id = c.id2
         |)
         |SELECT id1, id2, sim FROM s WHERE sim >= 0.3""".stripMargin,


    "q_semdedup" ->
      s"""WITH $sqlCents8,
         |hot AS (SELECT cluster FROM a GROUP BY cluster HAVING count(*) > 200),
         |af AS (SELECT a.vec_id, a.cluster FROM a ANTI JOIN hot USING (cluster)),
         |p AS (
         |  SELECT x.cluster, x.vec_id AS id1, y.vec_id AS id2,
         |         ${sqlCosine("ea.embedding::DOUBLE[]", "eb.embedding::DOUBLE[]")} AS sim
         |  FROM af x
         |  JOIN af y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  JOIN embeddings ea ON ea.vec_id = x.vec_id
         |  JOIN embeddings eb ON eb.vec_id = y.vec_id
         |)
         |SELECT cluster, id1, id2, sim FROM p WHERE sim >= 0.3""".stripMargin,


    "q_keep_best" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source, lang
        |                               ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,


    "q_contamination" ->
      s"""WITH $sqlWinnowMins,
         |fp0 AS (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM mins),
         |pid AS (SELECT doc_id AS probe_id FROM documents ORDER BY doc_id LIMIT 5),
         |pf AS (SELECT probe_id, f FROM fp0 JOIN pid ON fp0.doc_id = pid.probe_id)
         |SELECT c.doc_id, p.probe_id, count(*) AS n_shared
         |FROM fp0 c JOIN pf p ON c.f = p.f
         |WHERE c.doc_id != p.probe_id
         |GROUP BY 1, 2 HAVING count(*) >= 10""".stripMargin,


    "q_ngram_decontam" ->
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
        |)
        |SELECT cg.doc_id, pg.probe_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM cg JOIN pg USING (g)
        |WHERE cg.doc_id <> pg.probe_id
        |GROUP BY 1, 2""".stripMargin,


    "q_dedup_kept" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,


    // identical closure to q_components: the star alternation must
    // land on the same min-id labels as min-label propagation
    "q_components_star" ->
      s"""WITH $sqlNearDupReach
         |SELECT id, min(comp) AS component FROM reach GROUP BY id""".stripMargin,


    "q_bloom_decontam" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents p
        |                  WHERE p.doc_id % 23 = 0 AND p.text = d.text)""".stripMargin,


    // est = agreeing signature positions / h; exact = the simpairs
    // shingle Jaccard — both divisions of exact ints
    "q_minhash_calib" ->
      s"""WITH $sqlMinhash,
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |  FROM bb x JOIN bb y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |),
         |ee AS (
         |  SELECT c.id1, c.id2,
         |         CAST(list_sum(list_transform(list_zip(g1.sig, g2.sig),
         |              q -> CASE WHEN q[1] = q[2] THEN 1 ELSE 0 END)) AS DOUBLE)
         |           / CAST(len(g1.sig) AS DOUBLE) AS est,
         |         CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
         |         CAST(len(s1.sh) + len(s2.sh)
         |              - len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) AS jac
         |  FROM cand c
         |  JOIN sig g1 ON g1.doc_id = c.id1 JOIN sig g2 ON g2.doc_id = c.id2
         |  JOIN sh s1 ON s1.doc_id = c.id1 JOIN sh s2 ON s2.doc_id = c.id2
         |)
         |SELECT id1, id2, est, jac, abs(est - jac) AS abs_err FROM ee""".stripMargin,


    "q_dup_matrix" ->
      s"""WITH $sqlMinhash,
         |$sqlCandJaccard,
         |pr AS (SELECT id1, id2 FROM simpairs WHERE sim >= 0.5)
         |SELECT least(d1.source, d2.source) AS source_a,
         |       greatest(d1.source, d2.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pr JOIN documents d1 ON d1.doc_id = pr.id1
         |        JOIN documents d2 ON d2.doc_id = pr.id2
         |GROUP BY 1, 2""".stripMargin,


    "q_threshold_sweep" ->
      s"""WITH $sqlMinhash,
         |$sqlCandJaccard
         |SELECT CAST(t AS DOUBLE) / 10.0 AS min_sim,
         |       CAST(sum(CASE WHEN sim >= CAST(t AS DOUBLE) / 10.0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pairs
         |FROM simpairs CROSS JOIN generate_series(5, 9) g(t)
         |WHERE sim >= 0.5
         |GROUP BY 1""".stripMargin,


    "q_lsh_budget" ->
      s"""WITH $sqlMinhash,
         |cfg AS (SELECT unnest([4, 8, 16]) AS b),
         |bands AS (
         |  SELECT CAST(c.b AS BIGINT) AS b, CAST(16 // c.b AS BIGINT) AS r,
         |         t.bi AS band,
         |         array_to_string(s.sig[(t.bi-1)*(16//c.b)+1 : t.bi*(16//c.b)], ',')
         |           AS bucket
         |  FROM sig s CROSS JOIN cfg c CROSS JOIN generate_series(1, 16) t(bi)
         |  WHERE t.bi <= c.b
         |),
         |occ AS (SELECT b, r, band, bucket, CAST(count(*) AS BIGINT) AS m
         |        FROM bands GROUP BY 1, 2, 3, 4)
         |SELECT b, r, CAST(count(*) AS BIGINT) AS n_buckets,
         |       CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_candidates
         |FROM occ GROUP BY 1, 2""".stripMargin,


    "q_containment" ->
      """WITH corp AS (SELECT text FROM documents WHERE doc_id % 10 <> 0),
        |prb AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |ct AS (SELECT string_split(text, ' ') AS toks FROM corp),
        |cg AS (SELECT DISTINCT md5(g) AS g
        |       FROM (SELECT unnest([array_to_string(toks[i:i+12], ' ')
        |                            for i in range(1, len(toks)-11)]) AS g
        |             FROM ct WHERE len(toks) >= 13)),
        |pt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM prb),
        |pg AS (SELECT doc_id,
        |              unnest(list_distinct([array_to_string(toks[i:i+12], ' ')
        |                                    for i in range(1, len(toks)-11)])) AS g
        |       FROM pt WHERE len(toks) >= 13),
        |pgm AS (SELECT doc_id, md5(g) AS g FROM pg),
        |per AS (SELECT pgm.doc_id, count(*) AS n_grams,
        |               CAST(coalesce(sum(CASE WHEN cg.g IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_matched
        |        FROM pgm LEFT JOIN cg USING (g) GROUP BY 1)
        |SELECT p.doc_id AS probe_id, coalesce(per.n_grams, 0) AS n_grams,
        |       coalesce(per.n_matched, 0) AS n_matched,
        |       CASE WHEN per.n_grams IS NOT NULL
        |            THEN CAST(per.n_matched AS DOUBLE) / CAST(per.n_grams AS DOUBLE) END AS containment
        |FROM prb p LEFT JOIN per USING (doc_id)""".stripMargin,
  )
}
