package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, NaiveBayes, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Embedding / vector-search queries: exact and approximate top-k (LSH, IVF, PQ), quantization, projections, mining, geometry audits.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryVector {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── LLM-pipeline: exact cosine top-k (TopKAgg partial-agg path) ─
    "q_topk_cosine" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.topKCosine(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding", k = 10)
    }),


    // ── ML: two-NN distance-ratio quantiles (geometry audit) ────────
    // Per probe the d2/d1 nearest-neighbor distance ratio (the Facco
    // et al. two-NN statistic, log-free form): ratios hugging 1 mean
    // high intrinsic dimension — distances concentrate and ANN recall
    // degrades. Quartiles over 100 probes via the exact type-7
    // machinery; TopKAgg (score = −sqdist) bounds the per-task state.
    "q_twonn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.orderBy("vec_id").limit(100)
      val scored = emb
        .select(col("vec_id").cast("long").as("__id"),
          VectorOps.toDouble(col("embedding")).as("__v"))
        .crossJoin(broadcast(probes.select(col("vec_id").cast("long").as("probe_id"),
          VectorOps.toDouble(col("embedding")).as("__pv"))))
        .filter(col("__id") =!= col("probe_id"))
        .select(col("probe_id"), col("__id"),
          (-VectorOps.sqDist(col("__v"), col("__pv"))).as("__ns"))
      val mu = scored.groupBy("probe_id")
        .agg(graft.functions.TopKAgg.topK(2, col("__id"), col("__ns")).as("__top"))
        .select(col("probe_id"), posexplode(col("__top")).as(Seq("__r0", "__p")))
        .select(col("probe_id"), (col("__r0") + 1).as("__rn"),
          sqrt(-col("__p._2")).as("__d"))
        .groupBy("probe_id")
        .agg(max(when(col("__rn") === 1, col("__d"))).as("__d1"),
          max(when(col("__rn") === 2, col("__d"))).as("__d2"))
        .filter(col("__d1") > 0.0)
        .select(lit("all").as("__k"), (col("__d2") / col("__d1")).as("mu"))
      Curation.quantilesByKey(mu, "__k", "mu", Seq(0.25, 0.5, 0.75))
        .select(col("p"), col("q"))
    }),


    // ── ML: hubness histogram (curse-of-dimensionality audit) ───────
    // How many probes' top-10 lists each point appears in, then the
    // point-count per occurrence level — a heavy hub tail means
    // similarity lists collapse onto a few points (Radovanović et
    // al.), the failure mode LSH/IVF budgets must plan for.
    "q_hubness" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.orderBy("vec_id").limit(100)
      Similarity.topKCosine(emb, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 10)
        .groupBy(col("vec_id")).agg(count(lit(1)).cast("long").as("n_lists"))
        .groupBy(col("n_lists")).agg(count(lit(1)).cast("long").as("n_points"))
    }),


    // ── ML: filtered vector search (metadata predicate + top-k) ─────
    // The modern ANN shape: exact cosine top-k restricted to rows
    // passing a metadata filter — the filter prunes BEFORE scoring,
    // so the corpus pass only reads qualifying vectors.
    "q_ann_filtered" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.topKCosine(emb.filter(col("label") % 2 === 0),
        "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding", k = 10)
    }),


    // ── recsys: market-basket item-pair cosine ──────────────────────
    // Items co-purchased in the same order, cosine-normalized by the
    // item marginals — the item-item collaborative-filtering table.
    // coOccurrence's per-basket self-join is bounded by basket size;
    // the head is a TakeOrdered on (support desc, pair).
    "q_basket_pairs" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val pairs = Events.coOccurrence(li, "l_orderkey", "l_partkey", minUsers = 1)
        .withColumnRenamed("n_users", "n_baskets")
      val items = li.distinct()
        .groupBy(col("l_partkey").as("__i"))
        .agg(count(lit(1)).cast("long").as("__ni"))
      pairs
        .join(items.select(col("__i").as("item1"), col("__ni").as("__n1")), Seq("item1"))
        .join(items.select(col("__i").as("item2"), col("__ni").as("__n2")), Seq("item2"))
        .withColumn("cosine", col("n_baskets").cast("double")
          / sqrt((col("__n1") * col("__n2")).cast("double")))
        .orderBy(col("n_baskets").desc, col("item1"), col("item2")).limit(50)
        .select("item1", "item2", "n_baskets", "cosine")
    }),


    // ── ML: k-NN majority-vote label prediction (embedding audit) ───
    // 20 probes classified by their 10 exact-cosine neighbors' labels;
    // the `correct` flag against each probe's own label makes this the
    // "do labels cluster in this space" audit in one query.
    "q_knn_label" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.orderBy("vec_id").limit(20)
      Similarity.knnPredict(emb, "vec_id", "embedding", "label", probes, k = 10)
        .join(broadcast(probes.select(col("vec_id").as("probe_id"),
          col("label").as("true_label"))), Seq("probe_id"))
        .withColumn("correct", (col("pred_label") === col("true_label")).cast("int"))
    }),


    // ── ML: contrastive triplet mining (hard negatives) ─────────────
    // (anchor, nearest same-label, nearest different-label) rows from
    // the exact cosine top-50 — the triplet-loss training feed with
    // negatives mined hard, not sampled.
    "q_triplets" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.mineTriplets(emb, "vec_id", "embedding", "label",
        emb.orderBy("vec_id").limit(10), k = 50)
    }),


    // ── ML: signed random projection (±1 JL sketch, 64 → 8 dims) ────
    // Rowwise DotExpr dots against md5-derived plan-literal sign
    // vectors — no side input, no shuffle, oracle regenerates the
    // matrix bit-for-bit. The 8 components are emitted as SCALAR
    // double columns (not array<double>): the driver's comparator
    // sorts cells with pandas, which cannot hash array values
    // (CORRECTNESS_r10 q_rand_proj err).
    "q_rand_proj" -> ((s, dir) => {
      val r = Similarity.randomProjection(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", inDim = 64, outDim = 8)
      r.select(col("vec_id") +:
        (0 until 8).map(j => element_at(col("proj"), j + 1).as(s"proj_$j")): _*)
    }),


    // ── LLM-pipeline: product-quantization encode (m=4 × k=16) ──────
    // Codebooks in the oracle-checkable maxIter=0 configuration
    // (codewords = the 16 lowest-vec_id rows' subvectors, FirstK);
    // training parity itself is q_kmeans_fit2's job. The encode is
    // the K-Means argmin per subspace — rowwise, no shuffle.
    "q_pq_encode" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      Similarity.encodePQ(emb, "embedding", model)
        .select(col("vec_id"),
          array_join(transform(col("codes"), c => c.cast("string")), ",").as("codes"))
    }),


    // ── LLM-pipeline: PQ asymmetric-distance top-k over codes ───────
    "q_pq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val codes = Similarity.encodePQ(emb, "embedding", model).select("vec_id", "codes")
      Similarity.pqTopK(codes, "vec_id", "codes",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding", model, k = 10)
    }),


    // ── LLM-pipeline: PQ codebooks persisted (freeze → load → ADC) ──
    // The codebook is the tokenizer of the vector world: codes
    // written by a different codebook are silently garbage at ADC
    // time, so it freezes as a versioned artifact (m·k codeword rows
    // + a meta commit row; loud refusals on geometry / row-count /
    // codeword-id drift) and BOTH encode and ADC serve through the
    // loaded model. Oracle = q_pq_topk verbatim.
    "q_pq_persist" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val path = sessionTmpDir(s, "pq_model", dir)
      Similarity.savePQ(s, path, model)
      val lm = Similarity.loadPQ(s, path)
      val codes = Similarity.encodePQ(emb, "embedding", lm).select("vec_id", "codes")
      Similarity.pqTopK(codes, "vec_id", "codes",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding", lm, k = 10)
    }),


    // ── LLM-pipeline: PQ shortlist + exact re-rank ──────────────────
    // ADC picks 50 candidates per probe from codes alone; only those
    // 250 rows touch the float table for the exact final top-10.
    "q_pq_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val codes = Similarity.encodePQ(emb, "embedding", model).select("vec_id", "codes")
      Similarity.pqTopKRerank(emb, "vec_id", "embedding",
        codes, "vec_id", "codes",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        model, k = 10, shortlist = 50)
    }),


    // ── LLM-pipeline: IVF-PQ top-k (cells prune, codes rank) ────────
    "q_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents8(s, dir), model, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: PERSISTED IVF-PQ serving (the full disk stack)
    // The production billion-vector shape end to end: the codebook is
    // frozen and LOADED (savePQ/loadPQ), the (id, codes) table lands
    // partitioned by coarse cell (buildIvfPqIndex — floats never
    // stored), and the query prunes to nprobe cell partitions and
    // ranks on codes via broadcast ADC tables. Both provenances
    // (coarse quantizer + codebook fingerprints) gate the serve.
    // Oracle = q_ivfpq_topk verbatim: a drifted codebook, a lost
    // partition, or wrong-cell pruning all hash-mismatch.
    "q_ivfpq_persist" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val base = sessionTmpDir(s, "ivfpq", dir)
      Similarity.savePQ(s, s"$base/pq", model)
      val lm = Similarity.loadPQ(s, s"$base/pq")
      val cents = cents8(s, dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, lm,
        s"$base/index")
      Similarity.ivfPqTopKIndexed(s, s"$base/index",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, lm, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: PERSISTED IVF-PQ index maintenance (build →
    // append → serve — VERDICT r13 item 2, the q_ivf_refresh symmetry
    // for the code table). Two-thirds of the corpus is the initial
    // build; the rest arrives as an incremental append assigned under
    // the index's STORED coarse centroids and encoded under the SAME
    // frozen codebook (appendIvfPqIndex refuses a drifted one by
    // fingerprint — without append, a growing corpus forces a full
    // rebuild per ingest batch). The serve must return EXACTLY what
    // the in-memory IVF-PQ search computes over the full corpus: the
    // oracle is q_ivfpq_topk's SQL verbatim, so a lost append row, a
    // double-written cell partition, or a drifted assignment all
    // surface as a hash mismatch.
    "q_ivfpq_refresh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val base = sessionTmpDir(s, "ivfpq_refresh", dir)
      Similarity.savePQ(s, s"$base/pq", model)
      val lm = Similarity.loadPQ(s, s"$base/pq")
      val cents = cents8(s, dir)
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", cents, lm, s"$base/index")
      Similarity.appendIvfPqIndex(s, emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", lm, s"$base/index")
      // compaction under the hash gate (VERDICT r15 item 5): build →
      // append → COMPACT → serve; the swap protocol now sits under
      // the DuckDB hash like every other lifecycle step
      Similarity.compactIvfPqIndex(s, s"$base/index")
      Similarity.ivfPqTopKIndexed(s, s"$base/index",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, lm, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: IVF-PQ shortlist + exact re-rank ──────────────
    // The COMPLETE billion-vector query recipe: cells prune, ADC over
    // codes picks 50 candidates per probe (floats never read), and
    // only those 250 rows touch the float table for the exact final
    // top-10 — the q_pq_rerank pattern composed with the IVF pruning
    // stage, which is what a production IVF-PQ deployment actually
    // answers queries with.
    "q_ivfpq_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      Similarity.ivfPqTopKRerank(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents8(s, dir), model, nprobe = 2, k = 10, shortlist = 50)
    }),


    // ── LLM-pipeline: shortlist + re-rank from the PERSISTED index ──
    // The at-rest production query path (review r15): the in-memory
    // rerank above re-assigns and re-encodes the corpus inside every
    // query (57 s/query at the 1M-vector stress); this one shortlists
    // from the STORED cell-partitioned codes — no assignment, no
    // encode — and touches floats only for the probes × shortlist
    // exact re-rank rows. Must return exactly what the in-memory
    // recipe returns: oracle = q_ivfpq_rerank's SQL verbatim, so a
    // stale partition, a drifted codebook, or a shortlist divergence
    // all hash-mismatch.
    "q_ivfpq_rerank_idx" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "ivfpq_rr", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index")
      Similarity.ivfPqTopKIndexedRerank(s, s"$base/index",
        emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 10, shortlist = 50)
    }),


    // ── LLM-pipeline: RESIDUAL IVF-PQ (IVF-ADC proper — VERDICT r15
    // item 1). Codebooks train on x − c(x) (the coarse-cell residual,
    // Jégou et al. TPAMI'11), codes quantize residuals, and each
    // probe ADCs with q − c(cell) per probed cell — the 8-byte budget
    // then covers within-cell variance, the recall lever raw mode
    // leaves on the table. maxIter=0 keeps it oracle-checkable:
    // residual codewords = the 16 lowest-vec_id rows' RESIDUAL
    // subvectors. The oracle replays the subtraction end to end.
    "q_ivfpq_residual" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      val model = Similarity.trainPQResidual(emb, "vec_id", "embedding",
        d = 64, cents, m = 4, k = 16, maxIter = 0)
      Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: residual IVF-PQ full persisted lifecycle ──────
    // savePQ/loadPQ round-trips the v2 artifact (residual provenance
    // included), build takes 2/3 of the corpus, append the rest under
    // the frozen residual codebook, COMPACT swaps the layout
    // (VERDICT r15 item 5), and the serve must equal the in-memory
    // residual search over the full corpus — oracle =
    // q_ivfpq_residual verbatim, so a lost append row, a drifted
    // residual convention, or a swap corruption all hash-mismatch.
    "q_ivfpq_res_refresh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      val model = Similarity.trainPQResidual(emb, "vec_id", "embedding",
        d = 64, cents, m = 4, k = 16, maxIter = 0)
      val base = sessionTmpDir(s, "ivfpq_res", dir)
      Similarity.savePQ(s, s"$base/pq", model)
      val lm = Similarity.loadPQ(s, s"$base/pq")
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", cents, lm, s"$base/index")
      Similarity.appendIvfPqIndex(s, emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", lm, s"$base/index")
      Similarity.compactIvfPqIndex(s, s"$base/index")
      Similarity.ivfPqTopKIndexed(s, s"$base/index",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, lm, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: residual shortlist + exact re-rank from the
    // persisted index — the production query path in residual mode:
    // stored residual codes shortlist 50 candidates per probe, only
    // those rows touch the float table for the exact final top-10.
    "q_ivfpq_res_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      val model = Similarity.trainPQResidual(emb, "vec_id", "embedding",
        d = 64, cents, m = 4, k = 16, maxIter = 0)
      val base = sessionTmpDir(s, "ivfpq_res_rr", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index")
      Similarity.ivfPqTopKIndexedRerank(s, s"$base/index",
        emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 10, shortlist = 50)
    }),


    // ── LLM-pipeline: OPQ rotate-then-quantize plumbing (Ge et al.
    // CVPR'13). The LEARNED rotation trains via driver-side Procrustes
    // SVD (engine-only, like PCA's eigendecomposition — spec'd with a
    // hand case + an MSE-improvement pin, measured in AnnStress); this
    // row hash-gates the SERVE PLUMBING with a deterministic
    // md5-derived permutation+sign rotation (orthogonal by
    // construction, replayable in SQL like q_rand_proj's matrix):
    // corpus and probes rotate through the SAME rotateVectors path a
    // learned R uses, codebooks train in rotated space, ADC ranks
    // rotated codes — mixed-space bugs, a wrong column order, or a
    // sign slip all hash-mismatch.
    "q_opq_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val rot = opqTestRotation(64)
      val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
      val model = Similarity.trainPQ(re, "vec_id", "r",
        d = 64, m = 4, k = 16, maxIter = 0)
      val codes = Similarity.encodePQ(re, "r", model).select("vec_id", "codes")
      Similarity.pqTopK(codes, "vec_id", "codes",
        re.orderBy("vec_id").limit(5), "vec_id", "r", model, k = 10)
    }),


    // ── LLM-pipeline: OPQ persisted lifecycle (VERDICT r16 item 1) ──
    // The rotation freezes with its quantizer and codebooks
    // (saveOpqIvf), LOADS (loadOpqIvf — fingerprint battery), the
    // index builds ROTATED (rotation provenance in the meta), appends
    // and compacts under it, and serves RAW probes through the
    // rotated entry. The deterministic md5 perm+sign rotation keeps
    // it oracle-replayable (the q_opq_topk convention); cents =
    // FirstK(8) in ROTATED space so the oracle regenerates them from
    // the rotated relation. A lost append row, a swap corruption, a
    // drifted rotation, or probes rotated with the wrong matrix all
    // hash-mismatch.
    "q_opq_refresh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val rot = opqTestRotation(64)
      val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
      val cents = KMeans.initCentroids(re, "vec_id", "r", FirstK(8))
      val pq = Similarity.trainPQ(re, "vec_id", "r", d = 64, m = 4, k = 16,
        maxIter = 0)
      val base = sessionTmpDir(s, "opq_refresh", dir)
      Similarity.saveOpqIvf(s, s"$base/opq",
        Similarity.OpqIvfModel(rot, cents, pq))
      val lm = Similarity.loadOpqIvf(s, s"$base/opq")
      Similarity.buildIvfPqIndexRotated(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", lm, s"$base/index")
      Similarity.appendIvfPqIndexRotated(s, emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", lm, s"$base/index")
      Similarity.compactIvfPqIndex(s, s"$base/index")
      Similarity.ivfPqTopKIndexedRotated(s, s"$base/index",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        lm, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: IVF-PQ index DELETION (VERDICT r16 item 2) ────
    // The takedown lifecycle a 100 TB training-data pipeline is
    // legally forced to run, without the full rebuild it used to
    // cost: tombstone-delete a seventh of the corpus (the serve masks
    // it IMMEDIATELY — 'masked' phase), compact (the rows drop
    // physically into a fresh generation, tombstones clear), then
    // RE-APPEND half the deleted ids (legal re-admission) and serve
    // again ('final' phase). The oracle replays both candidate sets;
    // a no-op delete, a leaky mask, a compaction that dropped the
    // wrong rows, or a failed re-append all hash-mismatch.
    "q_ivfpq_delete" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "ivfpq_del", dir)
      val idx = s"$base/index"
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, idx)
      Similarity.deleteFromIvfPqIndex(s,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", idx)
      // pin the masked serve BEFORE the compact retires its
      // generation — 50 rows, driver-bounded
      val masked = Similarity.ivfPqTopKIndexed(s, idx,
          emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
          cents, model, nprobe = 2, k = 10)
        .withColumn("phase", lit("masked"))
        .localCheckpoint(eager = true)
      Similarity.compactIvfPqIndex(s, idx)
      Similarity.appendIvfPqIndex(s, emb.filter(col("vec_id") % 14 === 3),
        "vec_id", "embedding", model, idx)
      val fin = Similarity.ivfPqTopKIndexed(s, idx,
          emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
          cents, model, nprobe = 2, k = 10)
        .withColumn("phase", lit("final"))
      masked.unionByName(fin)
        .select("phase", "probe_id", "vec_id", "rank", "adist")
    }),


    // ── LLM-pipeline: FILTERED ANN on the persisted IVF-PQ index
    // (VERDICT r17 item 1 — the highest-leverage serving gap): real
    // vector queries at 100 TB carry a metadata predicate (source,
    // license, date), so the index build carries the filterable
    // column (metaCols) and the serve pushes the predicate INSIDE the
    // pruned cell scan, before ADC, composed with partition pruning —
    // never a post-filtered top-k (recall loss) or an exact-scan
    // fallback. The oracle replays the mask on the candidate set, so
    // a filter applied at the wrong stage (after top-k) or dropped
    // appended metadata hash-mismatches.
    "q_ivfpq_filtered" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "ivfpq_filt", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index", metaCols = Seq("label"))
      Similarity.ivfPqTopKIndexed(s, s"$base/index",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 10,
        filter = Some(col("label") % 2 === 0))
    }),


    // ── LLM-pipeline: filtered shortlist + exact re-rank from the
    // persisted index — the SHORTLIST-SIZED-POST-FILTER contract under
    // the hash: a selective predicate (label % 4 = 1, ~25%) filters
    // candidates BEFORE the 50-slot shortlist, so all 50 slots hold
    // qualifying rows and the exact re-rank's final 10 cannot lose
    // recall to filtered-out slots the way post-filtering would.
    "q_ivfpq_filtered_rr" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "ivfpq_filt_rr", dir)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        s"$base/index", metaCols = Seq("label"))
      Similarity.ivfPqTopKIndexedRerank(s, s"$base/index",
        emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 10, shortlist = 50,
        filter = Some(col("label") % 4 === 1))
    }),


    // ── LLM-pipeline: filtered ANN on the persisted FLOAT IVF index —
    // the q_ivfpq_filtered contract for the float table (build carries
    // the label column; the predicate lands inside the pruned scan
    // next to the partition filter).
    "q_ivf_filtered" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      val path = sessionTmpDir(s, "ivf_filt", dir)
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, path,
        metaCols = Seq("label"))
      Similarity.ivfTopKIndexed(s, path,
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, nprobe = 2, k = 10, filter = Some(col("label") % 2 === 0))
    }),


    // ── LLM-pipeline: BLUE/GREEN quantizer retrain (VERDICT r17 item
    // 3) — the maintenance operation drift eventually forces. The
    // index builds under cents8, then RETRAINS under a fresh FirstK(4)
    // quantizer through the generational machinery: generation 1 is
    // written beside generation 0 and the meta pointer + provenance
    // fingerprints flip only after the copy verifies — the index never
    // goes offline and a mid-stream reader keeps its old-quantizer
    // snapshot (StreamDuringRetrainSpec). The serve after the flip
    // must equal the in-memory IVF-PQ search under the NEW quantizer;
    // stale cells, old fingerprints, or a torn generation all
    // hash-mismatch.
    "q_ivfpq_retrain" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val base = sessionTmpDir(s, "ivfpq_retrain", dir)
      val idx = s"$base/index"
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
        cents8(s, dir), model, idx)
      val cents4 = KMeans.initCentroids(emb, "vec_id", "embedding", FirstK(4))
      Similarity.retrainIvfPqIndex(s, emb, "vec_id", "embedding",
        cents4, model, idx)
      Similarity.ivfPqTopKIndexed(s, idx,
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents4, model, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: persisted serving sweep + budget pick (VERDICT
    // r17 item 5). The (nprobe, shortlist) recall grid is measured
    // against the exact top-10 on the index's own serves, persisted
    // NEXT TO the index bound by its provenance fingerprints
    // (saveServingSweep — a retrain invalidates it loudly), loaded
    // back, and the deployer's pick (cheapest point meeting the
    // midpoint target) is made from the STORED sweep. Recall values
    // and the chosen flag are both under the hash. Costs are fixed
    // literals (wall-clock is not hashable); real measured seconds
    // come from AnnStress --sweep.
    "q_sweep_pick" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = Similarity.trainPQ(emb, "vec_id", "embedding",
        d = 64, m = 4, k = 16, maxIter = 0)
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "sweep_pick", dir)
      val idx = s"$base/index"
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, idx)
      val probes = emb.orderBy("vec_id").limit(5)
      val exact = Similarity.topKCosine(emb, "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10)
      def recallAt(np: Int): Double =
        Similarity.annRecall(
            Similarity.ivfPqTopKIndexedRerank(s, idx, emb, "vec_id", "embedding",
              probes, "vec_id", "embedding", cents, model,
              nprobe = np, k = 10, shortlist = 50),
            exact)
          .agg((sum(col("n_hit")).cast("double")
            / sum(col("n_exact")).cast("double")).as("r"))
          .head().getDouble(0)
      val sweep = Seq(
        Similarity.ServingBudget(1, 50, recallAt(1), 1.0),
        Similarity.ServingBudget(2, 50, recallAt(2), 2.0))
      Similarity.saveServingSweep(s, idx, sweep)
      val loaded = Similarity.loadServingSweep(s, idx)
      val target = (loaded.map(_.recall).min + loaded.map(_.recall).max) / 2.0
      val pick = Similarity.pickServingBudgetIndexed(s, idx, target).get
      import s.implicits._
      loaded.map(b => (b.nprobe, b.shortlist, b.recall, b.seconds,
          b.nprobe == pick.nprobe && b.shortlist == pick.shortlist))
        .toDF("nprobe", "shortlist", "recall", "seconds", "chosen")
    }),


    // ── LLM-pipeline: OPQ rotated shortlist + exact re-rank from the
    // persisted index — the complete production OPQ query path: raw
    // probes rotate once, stored rotated codes shortlist 50 per probe
    // through the cell-pruned ADC, and only the probes × shortlist
    // float rows (semi-join-pruned BEFORE rotation) re-rank with the
    // exact cosine in rotated space. Oracle replays shortlist + the
    // rotated-space cosine bit-for-bit.
    "q_opq_rerank" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val rot = opqTestRotation(64)
      val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
      val cents = KMeans.initCentroids(re, "vec_id", "r", FirstK(8))
      val pq = Similarity.trainPQ(re, "vec_id", "r", d = 64, m = 4, k = 16,
        maxIter = 0)
      val lm = Similarity.OpqIvfModel(rot, cents, pq)
      val base = sessionTmpDir(s, "opq_rerank", dir)
      Similarity.buildIvfPqIndexRotated(emb, "vec_id", "embedding", lm,
        s"$base/index")
      Similarity.ivfPqTopKIndexedRerankRotated(s, s"$base/index",
        emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        lm, nprobe = 2, k = 10, shortlist = 50)
    }),


    // ── LLM-pipeline: float-IVF index DELETION — the q_ivfpq_delete
    // lifecycle over the float table: tombstone-delete ('masked'
    // serve), compact (physical drop via the root swap — the
    // tombstone set retires with the swapped-away root), re-append
    // half the deleted ids, serve again ('final').
    "q_ivf_delete" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      val base = sessionTmpDir(s, "ivf_del", dir)
      val idx = s"$base/index"
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, idx)
      Similarity.deleteFromIvfIndex(s,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", idx)
      val masked = Similarity.ivfTopKIndexed(s, idx,
          emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
          cents, nprobe = 2, k = 10)
        .withColumn("phase", lit("masked"))
        .localCheckpoint(eager = true)
      Similarity.compactIvfIndex(s, idx)
      Similarity.appendIvfIndex(s, emb.filter(col("vec_id") % 14 === 3),
        "vec_id", "embedding", idx)
      val fin = Similarity.ivfTopKIndexed(s, idx,
          emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
          cents, nprobe = 2, k = 10)
        .withColumn("phase", lit("final"))
      masked.unionByName(fin)
        .select("phase", "probe_id", "vec_id", "rank", "sim")
    }),


    // ── LLM-pipeline: int8 embedding quantization ───────────────────
    // The 4×-smaller storage form for billion-vector corpora; codes
    // emitted as a comma-joined string so the compare hashes scalars.
    "q_quantize" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          VectorOps.quantizeInt8(VectorOps.toDouble(col("embedding"))).as("q"))
        .select(col("vec_id"),
          array_join(transform(col("q.codes"), c => c.cast("string")), ",").as("codes"),
          col("q.lo").as("lo"), col("q.hi").as("hi"))
    }),


    // ── LLM-pipeline: random-hyperplane LSH index buckets ───────────
    "q_ann_buckets" -> ((s, dir) => {
      Similarity.lshBuckets(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        tables = 8, bits = 4, d = 64)
    }),


    // ── LLM-pipeline: full ANN top-k via LSH bucket candidates ──────
    // Candidates = corpus vectors sharing ANY of the probe's 8
    // table-buckets, then exact cosine rank among candidates only —
    // the complete sublinear query path (index build + bucket join +
    // verify), not just the index table.
    "q_ann_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.annTopK(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        k = 10, tables = 8, bits = 4, d = 64)
    }),


    // ── LLM-pipeline: IVF ANN with K-Means coarse quantizer ─────────
    "q_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents8(s, dir), nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: PERSISTED IVF index maintenance (build→append→
    // serve — VERDICT r11 item 5). Two-thirds of the corpus is the
    // initial build; the rest arrives as an incremental append signed
    // by the index's STORED quantizer (appendIvfIndex rejects drift
    // by construction); the query then serves through the freshness
    // gate (quantizer fingerprint + row-count check) and must return
    // EXACTLY what the in-memory ivfTopK computes over the full
    // corpus — the oracle is q_ivf_topk's SQL verbatim, so a lost
    // append row, a double-written partition, or a drifted cell
    // assignment all surface as a hash mismatch.
    "q_ivf_refresh" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      // session-unique path (the q_lr_persist convention — ADVICE
      // r12): concurrent gate layouts (4- and 32-core runs) on one
      // host must not interleave build/overwrite/append/serve on one
      // index directory
      val path = sessionTmpDir(s, "ivf_refresh", dir)
      val cents = cents8(s, dir)
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", cents, path)
      Similarity.appendIvfIndex(s, emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", path)
      Similarity.ivfTopKIndexed(s, path,
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
        cents, nprobe = 2, k = 10)
    }),


    // ── LLM-pipeline: per-group embedding centroids ─────────────────
    // ORACLE TWIN (sorted-fold, the q_centroid_update convention): a
    // distributed VectorMeanAgg sum is partition-order-dependent in
    // the last ulp, so the gated query pins the fold order by sorting
    // each (label, pos) group's values before summing — bit-equal to
    // DuckDB's list_reduce(list_sort(...)). The SCALE path is
    // Similarity.groupCentroids (d+1 doubles per group per task),
    // equality pinned in SimilaritySpec.
    "q_group_centroids" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("p0", "v")))
        .select(col("label"), (col("p0") + 1).cast("int").as("pos"),
          col("v").cast("double").as("v"))
        .groupBy("label", "pos")
        // count(col), not count(*): collect_list silently drops NULL
        // elements, so the divisor must be the non-null count or a
        // null-carrying group's mean silently shifts
        .agg(count(col("v")).cast("long").as("n"),
          (VectorOps.foldSum(sort_array(collect_list(col("v")))) / count(col("v"))).as("val"))
        .select(col("label"), col("n"), col("pos"), col("val"))
    }),


    // ── curation: distribution matching (rejection to a reference) ──
    // The largest even-id subsample whose length-bin histogram
    // matches the odd-id slice's — λ = min(s_i/t_i) scales the
    // reference histogram, per-bin rates keep (t_i·λ)/s_i by id hash.
    "q_dist_match" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("bin", expr("n_chars DIV 200"))
      Curation.matchDistribution(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "bin")
        .select(col("doc_id"), col("bin"))
    }),


    // ── curation: deterministic negative sampling (contrastive) ─────
    // 3 negatives per doc via rank + md5 modular shift — never the
    // anchor, reproducible, replayed exactly by the oracle.
    "q_negatives" -> ((s, dir) => {
      Curation.negativeSamples(Tables(s, dir, "documents"), "doc_id", k = 3, seed = 42L)
    }),


    // ── curation: hard negatives from the anchor's K-Means cell ─────
    "q_hard_negatives" -> ((s, dir) => {
      Curation.hardNegatives(Tables(s, dir, "embeddings"), "vec_id", "embedding",
        cents8(s, dir), k = 2, seed = 42L)
    }),


    // ── retrieval: hybrid sparse+dense reciprocal-rank fusion ───────
    // Sparse list: global BM25 top-100 (TakeOrdered bounds the sort,
    // then the ≤100 survivors rank in one trivial partition). Dense
    // list: per-probe exact cosine top-100 (TopKAgg bounded partial
    // agg). Fusion: Similarity.rrfFuse — rank-only arithmetic, one
    // (probe, id) hash join over top-bounded inputs.
    "q_rrf" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      val sparse = TextAnalysis.bm25Score(docs, "doc_id", "text",
        terms = Seq("table", "spark", "value"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id").as("id"), col("rank"))
      val dense = Similarity.topKCosine(emb, "vec_id", "embedding",
        emb.orderBy("vec_id").limit(5), "vec_id", "embedding", k = 100)
        .select(col("probe_id"), col("vec_id").as("id"), col("rank"))
      val sparsePerProbe = dense.select("probe_id").distinct().crossJoin(sparse)
      Similarity.rrfFuse(sparsePerProbe, dense, "probe_id", "id", topK = 20)
    }),


    // ── curation: greedy k-center coreset selection (Gonzalez) ──────
    // 8 maximally-diverse exemplars from the first-100 embedding pool,
    // with the covering-radius sequence; the oracle replays the greedy
    // loop as a recursive CTE over the pairwise distance matrix.
    "q_kcenter" -> ((s, dir) => {
      val pool = Tables(s, dir, "embeddings").filter(col("vec_id") < 100)
      Similarity.kCenterGreedy(pool, "vec_id", "embedding", k = 8)
        .withColumnRenamed("id", "vec_id")
    }),


    // ── retrieval: MMR-diversified top-k (λ=0.5) ────────────────────
    // Dense top-20 for the lowest-id probe re-ranked by Maximal
    // Marginal Relevance down to 5 — the diversity-aware slate; the
    // oracle replays the greedy loop as a recursive CTE over the
    // candidate pairwise-cosine matrix.
    "q_mmr" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probe = emb.orderBy("vec_id").limit(1)
      val cands = Similarity.topKCosine(emb, "vec_id", "embedding",
        probe, "vec_id", "embedding", k = 20)
        .select(col("vec_id"), col("sim"))
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      Similarity.mmrSelect(cands, "vec_id", "embedding", "sim", k = 5)
        .withColumnRenamed("id", "vec_id")
    }),


    // ── embeddings: snapshot drift over the shared centroid cells ───
    // The corpusDrift idea in embedding space: both halves assign to
    // the FIXED cents8 cells; per-cell share gap is a rational of
    // exact longs (|na·Tb − nb·Ta| / (Ta·Tb)) — no FP fractions.
    "q_embed_drift" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = cents8(s, dir)
      def cellCounts(half: DataFrame, out: String) =
        KMeans.assign(half, "embedding", cents)
          .groupBy("cluster").agg(count(lit(1)).cast("long").as(out))
      val j = cellCounts(emb.filter(col("vec_id") % 2 === 0), "na")
        .join(cellCounts(emb.filter(col("vec_id") % 2 =!= 0), "nb"),
          Seq("cluster"), "full_outer")
        .select(col("cluster"), coalesce(col("na"), lit(0L)).as("na"),
          coalesce(col("nb"), lit(0L)).as("nb"))
      val tot = j.agg(sum(col("na")).cast("long").as("__ta"),
        sum(col("nb")).cast("long").as("__tb"))
      j.crossJoin(broadcast(tot))
        .select(col("cluster"), col("na"), col("nb"),
          (abs(col("na") * col("__tb") - col("nb") * col("__ta")).cast("double")
            / (col("__ta") * col("__tb")).cast("double")).as("share_gap"))
    }),


    // ── LLM-pipeline: hashing-trick sparse features (COO form) ──────
    // Vocabulary-free fixed-width vectorizer: md5 bucket + signed
    // second hash, one hash-agg on (doc, bucket). The linear-
    // classifier feature path that needs no vocab build at 100 TB.
    "q_feat_hash" -> ((s, dir) => {
      TextAnalysis.featureHash(Tables(s, dir, "documents"), "doc_id", "text",
        dim = 64)
    }),


    // ── LLM-pipeline: trained quality classifier (logistic reg) ─────
    // Batch-GD logistic regression over standardized hashed-text
    // features — the fastText/CCNet-style model-based filter. The
    // label is an exact integer predicate on token composition
    // (technical-term count beats filler count), so both engines
    // derive it bit-identically and the trainer must REDISCOVER it
    // through 64 signed hash buckets (~95% accuracy at 8 iterations).
    // Weights are quantized to the exact-integer 1e-4 grid (the
    // q_pca_moments contract: every step is continuous arithmetic —
    // no ordering/tie decisions — so cross-engine noise is O(1e-12),
    // eight orders below the grid). pos 0..63 = weights, 64 = bias.
    "q_lr_train" -> ((s, dir) => {
      val m = lrModel(s, dir)._3
      import s.implicits._
      def q4(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong
      (m.weights.toSeq.zipWithIndex.map { case (w, i) => (i, q4(w)) }
        :+ ((64, q4(m.bias))))
        .toDF("pos", "w4")
    }),


    // ── LLM-pipeline: classifier scoring + admission gate ───────────
    // σ(b + w·z) per doc from the q_lr_train model, quantized to the
    // 1e-4 grid; `admitted` derives from the QUANTIZED score so the
    // flag is exactly reproducible. The scoring side is a zero-shuffle
    // map projection (weights are plan literals).
    "q_lr_score" -> ((s, dir) => {
      val (z, _, m) = lrModelShared(s, dir)
      Classifier.scoreLogReg(z, "z", m, "score")
        .select(col("doc_id"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
        .withColumn("admitted", col("score4") >= 5000)
    }),


    // ── LLM-pipeline: classifier evaluation (confusion + AUC) ───────
    // Held-model quality report over the q_lr_score outputs: exact
    // integer confusion counts at the 0.5 admission threshold, plus
    // tie-corrected ROC-AUC on the 1e-6 grid — computed as an exact
    // integer fraction from average-rank sums over the QUANTIZED
    // score (10⁴ grid), so both engines agree bit-for-bit: every
    // input to the AUC arithmetic is an integer, division is
    // integral. One row out.
    "q_lr_eval" -> ((s, dir) => {
      val (z, _, m) = lrModelShared(s, dir)
      val sc = Classifier.scoreLogReg(z, "z", m, "score")
        .select(col("y"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("s4"))
      evalReport(sc, col("s4") >= 5000)
    }),


    // ── LLM-pipeline: classifier calibration (reliability bins) ─────
    // Ten score-decile bins over the quantized q_lr_score output,
    // each an exact-integer triple (n, positives, score-sum) — the
    // audit that says whether σ-scores can be thresholded as
    // probabilities (the CCNet-style pipelines cut on calibrated
    // quality scores). Pure integer arithmetic end to end.
    "q_lr_calibration" -> ((s, dir) => {
      val (z, _, m) = lrModelShared(s, dir)
      val sc = Classifier.scoreLogReg(z, "z", m, "score")
        .select(col("y"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("s4"))
      Classifier.calibrationBins(sc, "y", "s4", binWidth = 1000L, numBins = 10)
    }),


    // ── LLM-pipeline: held-out classifier evaluation (no leakage) ───
    // The full supervised workflow: contamination-safe 80/20 split
    // (`Sampling.trainTestSplit` — the exact md5-unit predicate the
    // oracle replays), standardizer FIT ON TRAIN ONLY, 8 GD
    // iterations over train, then confusion + AUC on the unseen test
    // side. The honest generalization number beside q_lr_eval's
    // in-sample one.
    "q_lr_holdout" -> ((s, dir) => {
      val sp = Sampling.trainTestSplit(lrLabeled(s, dir), "doc_id", 0.2)
      val train = sp.filter(col("split") === "train")
      val st = Classifier.fitStandardizer(train, "features")
      def z(df: DataFrame) = df.select(col("doc_id"),
        Classifier.standardizeColumn(col("features"), st).as("z"), col("y"))
      val m = Classifier.trainLogReg(z(train), "z", "y", iters = 8, lr = 1.0)
      val sc = Classifier.scoreLogReg(
          z(sp.filter(col("split") === "test")), "z", m, "score")
        .select(col("y"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("s4"))
      evalReport(sc, col("s4") >= 5000)
    }),


    // ── LLM-pipeline: Naive Bayes trainer (one-pass, count-based) ───
    // The OTHER classic corpus-filter model: multinomial NB with
    // add-1 smoothing on the same exact-integer label as q_lr_train.
    // Training is one groupBy(token) pass; the emitted model is the
    // per-token class counts (exact integers) plus the binary
    // log-odds on the 1e-4 grid (continuous arithmetic only — the
    // q_pca_moments contract).
    "q_nb_train" -> ((s, dir) => {
      val m = nbModel(s, dir)
      m.weights.select(col("token"), col("c1"), col("c0"),
        floor(col("w") * 10000.0 + 0.5).cast("long").as("w4"))
    }),


    // ── LLM-pipeline: Naive Bayes scoring (weight-table join) ───────
    // Per-doc log-odds via the LEFT join against the vocab-sized
    // weight table + one partial-agg sum — the no-plan-literal-
    // ceiling scoring shape (a 100M-token vocab works where an array
    // literal would not). `pred` derives from the QUANTIZED score.
    "q_nb_score" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      NaiveBayes.scoreLogOdds(docs, "doc_id", "text", nbModelShared(s, dir))
        .select(col("doc_id"),
          floor(col("logOdds") * 10000.0 + 0.5).cast("long").as("score4"))
        .withColumn("pred", col("score4") > 0)
    }),


    // ── LLM-pipeline: persisted-model serving (train once, load,
    // score) ────────────────────────────────────────────────────────
    // The q_ivf_refresh pattern for the classifier: persist the
    // trained model + standardizer as a versioned one-row parquet
    // artifact, load it back (loud refusals on version/dim/finite
    // drift), and serve the corpus THROUGH THE LOADED ARTIFACT.
    // Doubles round-trip bit-exactly through parquet, so the oracle
    // is q_lr_score's replay verbatim — any loss of fidelity in the
    // save/load path would hash-mismatch.
    "q_lr_persist" -> ((s, dir) => {
      val (_, st, m) = lrModelShared(s, dir)
      // session-unique path: concurrent gate layouts (4- and 32-core
      // runs) on one host must not race each other's overwrite
      val path = sessionTmpDir(s, "lr_model", dir)
      Classifier.saveLogReg(s, path, st, m)
      val (lst, lm) = Classifier.loadLogReg(s, path)
      val docs = Tables(s, dir, "documents")
      docs.select(col("doc_id"),
          Classifier.scoreColumn(
            Classifier.standardizeColumn(
              Classifier.hashedFeaturesRowwise(col("text"), dim = 64), lst), lm)
            .as("score"))
        .select(col("doc_id"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
        .withColumn("admitted", col("score4") >= 5000)
    }),


    // ── LLM-pipeline: NB evaluation (confusion + AUC) ───────────────
    // The same exact-integer eval harness as q_lr_eval, over the NB
    // log-odds scores (threshold 0 instead of σ's 0.5): confusion
    // counts plus tie-corrected Mann-Whitney AUC from rank sums on
    // the quantized grid — head-to-head model comparison is just two
    // one-row reports sharing one metric definition.
    "q_nb_eval" -> ((s, dir) => {
      val labeled = labeledDocs(s, dir)
      val sc = NaiveBayes.scoreLogOdds(labeled, "doc_id", "text",
          nbModelShared(s, dir))
        .join(labeled.select(col("doc_id"), col("y")), Seq("doc_id"))
        .select(col("y"),
          floor(col("logOdds") * 10000.0 + 0.5).cast("long").as("s4"))
      evalReport(sc, col("s4") > 0)
    }),


    // ── LLM-pipeline: multiclass NB (predict source from text) ──────
    // The multiclass task on this corpus: which source does a doc's
    // text come from. One groupBy(token, class) pass to a dense
    // vocab×classes weight table; per-(doc, class) log-posteriors,
    // quantized. NO argmax here — emitting every class's score keeps
    // the gate free of cross-class FP comparisons (the decision row
    // below derives from these integers). Honesty note: the synthetic
    // corpus's sources share one token distribution, so the model's
    // lift over the 1/|classes| prior is small — these rows gate the
    // operator's mechanics and exactness, not model quality (the
    // binary family above is where the label is genuinely learnable).
    "q_nb_classes" -> ((s, dir) => {
      val m = nbMcModelShared(s, dir)
      NaiveBayes.scoreMulticlass(Tables(s, dir, "documents"),
          "doc_id", "text", m)
        .select(col("doc_id"), col("cls"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
    }),


    // ── LLM-pipeline: multiclass NB decision (exact argmax) ─────────
    // The predicted class per doc: argmax over the QUANTIZED scores
    // (integer comparison, lowest class name on ties) — bit-exact on
    // both engines by construction.
    "q_nb_predict" -> ((s, dir) => {
      val m = nbMcModelShared(s, dir)
      val sc = NaiveBayes.scoreMulticlass(Tables(s, dir, "documents"),
          "doc_id", "text", m)
        .select(col("doc_id"), col("cls"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
      sc.withColumn("__rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score4").desc, col("cls"))))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("cls").as("predicted"))
    }),


    // ── LLM-pipeline: persisted NB model serving (train, save, load,
    // score) ────────────────────────────────────────────────────────
    // The q_lr_persist symmetry for the TABLE-shaped model (VERDICT
    // r12 item 2): the vocab-sized weight table + the four driver
    // scalars land as a versioned parquet artifact (meta row written
    // LAST as the commit marker, carrying the weight row count so a
    // partial write is refused at load), and the corpus is scored
    // THROUGH THE LOADED artifact. Doubles round-trip bit-exactly
    // through parquet, so the oracle is q_nb_score's replay verbatim
    // — any fidelity loss in save/load hash-mismatches.
    "q_nb_persist" -> ((s, dir) => {
      val m = nbModelShared(s, dir)
      // session-unique path: concurrent gate layouts on one host
      // must not race each other's overwrite (the q_lr_persist rule)
      val path = sessionTmpDir(s, "nb_model", dir)
      NaiveBayes.saveNB(s, path, m)
      val lm = NaiveBayes.loadNB(s, path)
      NaiveBayes.scoreLogOdds(Tables(s, dir, "documents"), "doc_id", "text", lm)
        .select(col("doc_id"),
          floor(col("logOdds") * 10000.0 + 0.5).cast("long").as("score4"))
        .withColumn("pred", col("score4") > 0)
    }),


    // ── LLM-pipeline: persisted MULTICLASS model serving ────────────
    // The third and last persistence shape: the dense vocab×classes
    // weight table + per-class scalar vectors land as a versioned
    // artifact (saveNBMulticlass — meta commit row carries the dense
    // row-count expectation), and per-(doc, class) posteriors are
    // served through the loaded model. Oracle = q_nb_classes verbatim.
    "q_nbmc_persist" -> ((s, dir) => {
      val m = nbMcModelShared(s, dir)
      val path = sessionTmpDir(s, "nbmc_model", dir)
      NaiveBayes.saveNBMulticlass(s, path, m)
      val lm = NaiveBayes.loadNBMulticlass(s, path)
      NaiveBayes.scoreMulticlass(Tables(s, dir, "documents"),
          "doc_id", "text", lm)
        .select(col("doc_id"), col("cls"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
    }),


    // ── LLM-pipeline: held-out multiclass evaluation (no leakage) ───
    // The q_lr_holdout twin for the multiclass family (VERDICT r12
    // item 3): contamination-safe 80/20 split by doc_id, multiclass
    // NB trained on the train side ONLY (vocabulary, priors, and
    // smoothing totals all see no test doc), then the full per-class
    // confusion matrix over the unseen test side — exact integer
    // counts of (actual source, predicted source). The test side is
    // where the per-class OOV fallback is genuinely exercised: test
    // docs carry tokens absent from the train vocabulary.
    "q_nb_holdout" -> ((s, dir) => {
      val sp = Sampling.trainTestSplit(Tables(s, dir, "documents"),
        "doc_id", 0.2)
      val m = NaiveBayes.trainMulticlass(sp.filter(col("split") === "train"),
        "doc_id", "text", "source", alpha = 1.0)
      val test = sp.filter(col("split") === "test")
      val sc = NaiveBayes.scoreMulticlass(test, "doc_id", "text", m)
        .select(col("doc_id"), col("cls"),
          floor(col("score") * 10000.0 + 0.5).cast("long").as("score4"))
      sc.withColumn("__rn", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("score4").desc, col("cls"))))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("cls").as("predicted"))
        .join(test.select(col("doc_id"), col("source").as("actual")),
          Seq("doc_id"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).cast("long").as("n"))
    }),


    // ── LLM-pipeline: per-doc n-gram novelty (3-token grams) ────────
    // "How much genuinely new text does this doc contribute" — the
    // up-weighting signal dual to contamination's overlap direction.
    "q_novelty" -> ((s, dir) => {
      Curation.ngramNovelty(Tables(s, dir, "documents"), "doc_id", "text", n = 3)
    }),


    // ── LLM-pipeline: ANN recall@k eval (IVF vs exact cosine) ───────
    // The index-quality harness: per-probe overlap of the nprobe=2
    // IVF result against brute-force cosine, denominator from the
    // exact side. Both inputs are probe-bounded relations.
    "q_ann_recall" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.orderBy("vec_id").limit(5)
      Similarity.annRecall(
        Similarity.ivfTopK(emb, "vec_id", "embedding",
          probes, "vec_id", "embedding", cents8(s, dir), nprobe = 2, k = 10),
        Similarity.topKCosine(emb, "vec_id", "embedding",
          probes, "vec_id", "embedding", k = 10))
    }),
  )

  /** THE classifier family's ground truth, defined once: documents
    * with the exact token-composition label (technical-term count
    * beats filler count) — exact integer arithmetic on token counts,
    * so both engines agree bit-for-bit on y and every trainer must
    * REDISCOVER the predicate from its own features. Columns:
    * (doc_id, text, y). */
  private def labeledDocs(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def cnt(t: String) = size(filter(toks, e => e === lit(t)))
    Tables(s, dir, "documents").select(col("doc_id"), col("text"),
      ((cnt("join") + cnt("key")) > (cnt("the") + cnt("a")))
        .cast("int").as("y"))
  }

  /** The one metric definition every eval row shares: confusion at
    * `admit` over a (y, s4) relation + tie-corrected AUC on the 1e-6
    * grid from integer rank sums. Editing this edits q_lr_eval,
    * q_lr_holdout, and q_nb_eval together — the sharing is
    * structural, not copy-synced. */
  private def evalReport(sc: DataFrame, admit: Column): DataFrame =
    Classifier.confusion(sc.withColumn("pred", admit), "y", "pred")
      .crossJoin(Classifier.rocAucParts(sc, "y", "s4"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        expr("(auc_num * 1000000) div auc_den").as("auc6"))

  /** Hashed features (dim 64) joined to the shared label. */
  private def lrLabeled(s: SparkSession, dir: String): DataFrame = {
    val labeled = labeledDocs(s, dir)
    Classifier.hashedFeatures(labeled, "doc_id", "text", dim = 64)
      .join(labeled.select(col("doc_id"), col("y")), Seq("doc_id"))
  }

  /** Full training pipeline for q_lr_train: labeled features →
    * z-score → 8 GD iterations at lr 1.0. Returns the standardized
    * feature table (doc_id, z, y) and the trained model. q_lr_train
    * calls this FRESH — it is the row that times training — while the
    * scoring/eval rows share one memoized model below (the
    * bpeMerges6 precedent, VERDICT r9 item 4: re-paying an identical
    * training run inside every downstream timed region benches the
    * trainer, not the operator under test). */
  private def lrModel(s: SparkSession, dir: String)
      : (DataFrame, Classifier.Standardizer, Classifier.LogRegModel) = {
    val labeled = lrLabeled(s, dir)
    val st = Classifier.fitStandardizer(labeled, "features")
    val z = labeled.select(col("doc_id"),
      Classifier.standardizeColumn(col("features"), st).as("z"), col("y"))
    (z, st, Classifier.trainLogReg(z, "z", "y", iters = 8, lr = 1.0))
  }

  // Session-object-keyed memos (EntryHelpers.SessionMemo — ADVICE
  // r12: identityHashCode keys can collide after a GC'd session).
  private val lrModelMemo =
    new SessionMemo[(DataFrame, Classifier.Standardizer, Classifier.LogRegModel)]
  private[graft] def lrModelShared(s: SparkSession, dir: String)
      : (DataFrame, Classifier.Standardizer, Classifier.LogRegModel) =
    lrModelMemo.getOrElseUpdate(s, dir) {
      val (z, st, m) = lrModel(s, dir)
      val zp = z.persist()
      zp.count() // materialize eagerly so no scoring row absorbs the build
      (zp, st, m)
    }

  private val nbModelMemo = new SessionMemo[NaiveBayes.NBModel]
  private[graft] def nbModelShared(s: SparkSession, dir: String)
      : NaiveBayes.NBModel =
    nbModelMemo.getOrElseUpdate(s, dir) {
      val m = nbModel(s, dir)
      m.weights.persist().count()
      m
    }

  private val nbMcModelMemo = new SessionMemo[NaiveBayes.NBMulticlassModel]
  private[graft] def nbMcModelShared(s: SparkSession, dir: String)
      : NaiveBayes.NBMulticlassModel =
    nbMcModelMemo.getOrElseUpdate(s, dir) {
      val m = NaiveBayes.trainMulticlass(Tables(s, dir, "documents"),
        "doc_id", "text", "source", alpha = 1.0)
      m.weights.persist().count()
      m
    }

  /** Shared trainer for q_nb_train / q_nb_score: multinomial NB with
    * alpha=1 on the q_lr_train label (exact integer predicate —
    * bit-identical on both engines). */
  private def nbModel(s: SparkSession, dir: String): NaiveBayes.NBModel =
    NaiveBayes.trainMultinomial(labeledDocs(s, dir),
      "doc_id", "text", "y", alpha = 1.0)

  /** The NB count/label chain shared by both q_nb oracle rows:
    * per-(doc, token) tf, the exact label, per-token class counts,
    * and the smoothing totals. The w formula's association matches
    * the Spark side exactly: (ln(c1+α) − ln(T1+αV)) − (ln(c0+α) −
    * ln(T0+αV)) — FP subtraction is not associative, and the 1e-4
    * grid only absorbs noise if both engines run the SAME expression
    * tree. */
  // private[graft]: EntryStreaming's q_stream_nb oracle replays the
  // same chain (the sqlLrChain convention — acyclic reference).
  private[graft] val sqlNbChain: String =
    """ts AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |lab AS MATERIALIZED (SELECT doc_id,
      |        CAST(len(list_filter(toks, e -> e = 'join'))
      |             + len(list_filter(toks, e -> e = 'key'))
      |           > len(list_filter(toks, e -> e = 'the'))
      |             + len(list_filter(toks, e -> e = 'a')) AS INTEGER) AS y
      |      FROM ts),
      |tfc AS MATERIALIZED (SELECT doc_id, token, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(toks) AS token FROM ts)
      |       GROUP BY 1, 2),
      |pt AS MATERIALIZED (SELECT token,
      |        sum(CASE WHEN l.y = 1 THEN tf ELSE 0 END) AS c1,
      |        sum(CASE WHEN l.y = 0 THEN tf ELSE 0 END) AS c0
      |      FROM tfc JOIN lab l USING (doc_id) GROUP BY token),
      |tot AS MATERIALIZED (SELECT CAST(sum(c1) AS DOUBLE) AS t1,
      |        CAST(sum(c0) AS DOUBLE) AS t0,
      |        CAST(count(*) AS DOUBLE) AS v FROM pt),
      |wt AS MATERIALIZED (SELECT token, c1, c0,
      |        (ln(CAST(c1 AS DOUBLE) + 1.0) - ln(t1 + 1.0 * v))
      |      - (ln(CAST(c0 AS DOUBLE) + 1.0) - ln(t0 + 1.0 * v)) AS w
      |      FROM pt, tot)""".stripMargin

  /** Multiclass NB replay: dense vocab×classes counts, per-class
    * smoothing totals, weights/priors with the same expression trees
    * as `NaiveBayes.trainMulticlass`/`scoreMulticlass`, per-(doc,
    * class) scores on the 1e-4 grid. The LEFT JOIN + per-class
    * zero-count fallback mirrors scoreMulticlass' total function even
    * though the in-corpus gate never exercises OOV.
    *
    * With `holdout = true` the chain becomes the leakage-free
    * multiclass workflow (q_nb_holdout): an `spl` CTE replays
    * `Sampling.trainTestSplit` (md5-unit hash < 0.2 ⇒ test, the
    * sqlLrChainFor predicate verbatim); classes, priors, vocabulary,
    * and smoothing totals are all built from TRAIN docs only; and
    * the scoring relation `mcsc` covers the TEST slice — where the
    * per-class OOV fallback is genuinely exercised (test tokens
    * absent from the train vocabulary take ln(α) − ln(T+αV)). */
  private def sqlNbMcChainFor(holdout: Boolean): String = {
    val spl = if (!holdout) "" else
      """spl AS MATERIALIZED (SELECT doc_id,
        |        CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |                  AS BIGINT) / 4294967296.0 < 0.2
        |             THEN 'test' ELSE 'train' END AS split
        |      FROM documents),
        |trd AS MATERIALIZED (SELECT d.doc_id, d.source FROM documents d
        |      JOIN spl USING (doc_id) WHERE spl.split = 'train'),
        |""".stripMargin
    val trainDocs = if (holdout) "trd" else "documents"
    val scoreSrc = if (holdout)
      "tfc JOIN spl ON spl.doc_id = tfc.doc_id AND spl.split = 'test'"
    else "tfc"
    s"""ts AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |${spl}tfc AS MATERIALIZED (SELECT doc_id, token, count(*) AS tf
      |       FROM (SELECT doc_id, unnest(toks) AS token FROM ts)
      |       GROUP BY 1, 2),
      |cls AS MATERIALIZED (SELECT DISTINCT source AS cls FROM $trainDocs),
      |dc AS MATERIALIZED (SELECT source AS cls, count(*) AS n
      |      FROM $trainDocs GROUP BY 1),
      |ptc AS MATERIALIZED (SELECT tfc.token, d.source AS cls,
      |        sum(tfc.tf) AS c
      |      FROM tfc JOIN $trainDocs d USING (doc_id) GROUP BY 1, 2),
      |dense AS MATERIALIZED (SELECT v.token, c.cls,
      |        coalesce(p.c, 0) AS c
      |      FROM (SELECT DISTINCT token FROM ptc) v
      |      CROSS JOIN cls c
      |      LEFT JOIN ptc p ON p.token = v.token AND p.cls = c.cls),
      |tot AS MATERIALIZED (SELECT cls, CAST(sum(c) AS DOUBLE) AS t,
      |        CAST(count(*) AS DOUBLE) AS v FROM dense GROUP BY cls),
      |wt AS MATERIALIZED (SELECT dense.token, dense.cls,
      |        ln(CAST(dense.c AS DOUBLE) + 1.0) - ln(tot.t + 1.0 * tot.v) AS w
      |      FROM dense JOIN tot ON dense.cls = tot.cls),
      |pri AS MATERIALIZED (SELECT dc.cls,
      |        ln(CAST(dc.n AS DOUBLE))
      |      - ln(CAST((SELECT sum(n) FROM dc) AS DOUBLE)) AS p FROM dc),
      |s0 AS MATERIALIZED (SELECT tfc.doc_id, c.cls,
      |        sum(tfc.tf * coalesce(w.w, ln(1.0) - ln(t.t + 1.0 * t.v))) AS s
      |      FROM $scoreSrc CROSS JOIN cls c
      |      LEFT JOIN wt w ON w.token = tfc.token AND w.cls = c.cls
      |      JOIN tot t ON t.cls = c.cls
      |      GROUP BY 1, 2),
      |mcsc AS MATERIALIZED (SELECT s0.doc_id, s0.cls,
      |        CAST(floor((s0.s + pri.p) * 10000 + 0.5) AS BIGINT) AS score4
      |      FROM s0 JOIN pri ON pri.cls = s0.cls)""".stripMargin
  }

  private val sqlNbMcChain: String = sqlNbMcChainFor(holdout = false)

  /** The q_lr_train chain unrolled for DuckDB: hashed signed-md5
    * features (q_feat_hash's scheme, densified over a 64-position
    * grid), z-scored with sd = sqrt(max(E[x²]−E[x]², 0)) (constant
    * dims → 1), then 8 unrolled full-batch GD iterations at lr 1.0 —
    * the same σ form, the same update arithmetic (·1.0 is exact).
    * Every intermediate is MATERIALIZED: the chain is a DAG, and
    * un-materialized CTE inlining re-evaluates it exponentially.
    *
    * With `holdout = true` the chain becomes the leakage-free
    * supervised workflow: an `spl` CTE replays
    * `Sampling.trainTestSplit` (md5-unit hash < 0.2 ⇒ test), the
    * standardizer is fit on TRAIN rows only, and every GD pass
    * averages over `xt` (the train slice of the standardized table) —
    * the full table `x` stays available for scoring the test side. */
  private def sqlLrChainFor(holdout: Boolean): String = {
    val trainRel = if (holdout) "xt" else "x"
    val iters = (1 to 8).map { r =>
      s"""m$r AS MATERIALIZED (SELECT x.doc_id, max(x.y) AS y,
         |  1.0/(1.0 + exp(-(sum(w.w * x.v) + (SELECT b FROM b${r - 1})))) AS p
         |  FROM $trainRel x JOIN w${r - 1} w USING (pos) GROUP BY x.doc_id),
         |g$r AS MATERIALIZED (SELECT x.pos, avg((m.p - m.y) * x.v) AS g
         |  FROM m$r m JOIN $trainRel x USING (doc_id) GROUP BY x.pos),
         |w$r AS MATERIALIZED (SELECT w.pos, w.w - 1.0 * g.g AS w
         |  FROM w${r - 1} w JOIN g$r g USING (pos)),
         |b$r AS MATERIALIZED (SELECT (SELECT b FROM b${r - 1})
         |  - 1.0 * (SELECT avg(p - y) FROM m$r) AS b)""".stripMargin
    }.mkString(",\n")
    val spl = if (!holdout) "" else
      """spl AS MATERIALIZED (SELECT doc_id,
        |        CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |                  AS BIGINT) / 4294967296.0 < 0.2
        |             THEN 'test' ELSE 'train' END AS split
        |      FROM documents),
        |""".stripMargin
    val stFrom = if (holdout)
      "FROM raw, spl WHERE raw.doc_id = spl.doc_id AND spl.split = 'train'"
    else "FROM raw"
    val xt = if (!holdout) "" else
      """xt AS MATERIALIZED (SELECT x.doc_id, x.pos, x.v, x.y
        |     FROM x, spl WHERE x.doc_id = spl.doc_id AND spl.split = 'train'),
        |""".stripMargin
    s"""WITH tok AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
       |           FROM documents),
       |${spl}sgn AS (SELECT doc_id,
       |             CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 64 AS pos,
       |             1 - 2 * (CAST(concat('0x', substr(h, 9, 1)) AS BIGINT) % 2) AS sign
       |      FROM tok),
       |coo AS (SELECT doc_id, pos, CAST(sum(sign) AS DOUBLE) AS v
       |        FROM sgn GROUP BY 1, 2),
       |lab AS MATERIALIZED (SELECT doc_id,
       |        CAST(len(list_filter(ts, e -> e = 'join'))
       |             + len(list_filter(ts, e -> e = 'key'))
       |           > len(list_filter(ts, e -> e = 'the'))
       |             + len(list_filter(ts, e -> e = 'a')) AS INTEGER) AS y
       |      FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
       |raw AS (SELECT l.doc_id, g.pos, coalesce(coo.v, 0.0) AS v, l.y
       |        FROM lab l CROSS JOIN (SELECT unnest(range(64)) AS pos) g
       |        LEFT JOIN coo ON coo.doc_id = l.doc_id AND coo.pos = g.pos),
       |st AS MATERIALIZED (SELECT pos, avg(v) AS mu,
       |         CASE WHEN sqrt(greatest(avg(v*v) - avg(v)*avg(v), 0.0)) > 0.0
       |              THEN sqrt(greatest(avg(v*v) - avg(v)*avg(v), 0.0))
       |              ELSE 1.0 END AS sd
       |      $stFrom GROUP BY pos),
       |x AS MATERIALIZED (SELECT raw.doc_id, raw.pos,
       |       (raw.v - st.mu) / st.sd AS v, raw.y
       |     FROM raw JOIN st USING (pos)),
       |${xt}w0 AS MATERIALIZED (SELECT CAST(unnest(range(64)) AS INTEGER) AS pos,
       |       0.0 AS w),
       |b0 AS MATERIALIZED (SELECT 0.0 AS b),
       |$iters""".stripMargin
  }

  // private[graft]: EntryStreaming's q_stream_score oracle replays
  // the same chain (acyclic reference — EntryStreaming → EntryVector
  // → EntryHelpers; nothing points back, so object init is safe, and
  // EntryContractSpec's null-token tripwire guards the invariant)
  private[graft] val sqlLrChain: String = sqlLrChainFor(holdout = false)

  /** Confusion + tie-corrected AUC over a `(doc_id, y, s4)` relation
    * `scDef` — the shared tail of q_lr_eval / q_lr_holdout. `//`
    * replays Spark's integral `div` (both operands nonnegative, so
    * truncation direction cannot differ). */
  private def sqlEvalTail(scDef: String,
                          admit: String = "s4 >= 5000"): String =
    s"""sc AS MATERIALIZED ($scDef),
       |conf AS (SELECT
       |    sum(CASE WHEN ($admit) AND y = 1 THEN 1 ELSE 0 END) AS tp,
       |    sum(CASE WHEN ($admit) AND y = 0 THEN 1 ELSE 0 END) AS fp,
       |    sum(CASE WHEN NOT ($admit) AND y = 0 THEN 1 ELSE 0 END) AS tn,
       |    sum(CASE WHEN NOT ($admit) AND y = 1 THEN 1 ELSE 0 END) AS fn
       |  FROM sc),
       |per AS (SELECT s4, count(*) AS c, sum(y) AS p FROM sc GROUP BY s4),
       |cum AS (SELECT c, p,
       |    sum(c) OVER (ORDER BY s4 ROWS UNBOUNDED PRECEDING) - c AS cb
       |  FROM per),
       |ag AS (SELECT sum(p * (2 * cb + c + 1)) AS r2, sum(p) AS pp,
       |    sum(c) AS n FROM cum)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |       CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
       |       CAST(((r2 - pp * (pp + 1)) * 1000000)
       |         // (2 * pp * (n - pp)) AS BIGINT) AS auc6
       |FROM conf, ag""".stripMargin

  /** The IVF float-serve candidate CTEs (probe cells + scored
    * candidates), shared by q_ivf_topk / q_ivf_refresh / the delete
    * lifecycle's two phases / the filtered serve (candPred replays
    * the engine's in-scan metadata predicate — round 18). */
  private def ivfCandCtes(candPred: Option[String]): String = {
    val pred = candPred.fold("")(p => s" AND $p")
    s"""$sqlCents8,
         |$sqlProbes,
         |pc AS (
         |  SELECT vec_id AS probe_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= 2
         |),
         |s AS (
         |  SELECT pc.probe_id, a.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM a JOIN pc ON a.cluster = pc.cell
         |  JOIN embeddings e ON e.vec_id = a.vec_id
         |  JOIN pr ON pr.probe_id = pc.probe_id
         |  WHERE a.vec_id != pc.probe_id$pred
         |)""".stripMargin
  }
  private val sqlIvfCandCtes: String = ivfCandCtes(None)

  /** q_ivf_topk's replay, shared with q_ivf_refresh (same probes,
    * cents, nprobe, k — the maintained index must serve the same
    * result as the in-memory scan). */
  private def ivfTopKSql(candPred: Option[String]): String =
    s"""WITH ${ivfCandCtes(candPred)}
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10""".stripMargin
  private val sqlIvfTopK: String = ivfTopKSql(None)

  /** The float-IVF delete-lifecycle replay (q_ivf_delete): candidates
    * filtered to each phase's survivors, same modulus scheme as
    * q_ivfpq_delete. */
  private val sqlIvfDelete: String = {
    def ranked(phase: String, pred: String) =
      s"""SELECT '$phase' AS phase, probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s WHERE $pred) WHERE rn <= 10""".stripMargin
    s"""WITH $sqlIvfCandCtes
       |${ranked("masked", "vec_id % 7 != 3")}
       |UNION ALL
       |${ranked("final", "vec_id % 14 != 10")}""".stripMargin
  }

  /** The in-memory IVF-PQ CTE chain (probe cells, ADC tables,
    * candidates, summed approximate distances) shared by the topk,
    * persist, refresh, rerank, and filtered oracles. `candPred`
    * replays the engine's in-scan metadata predicate over an
    * embeddings join (round 18 — candidates filter BEFORE ADC, so the
    * shortlist is sized post-filter). */
  private def ivfPqAdcCtes(candPred: Option[String]): String = {
    val (joinE, pred) = candPred match {
      case Some(p) => ("\n       |  JOIN embeddings em ON em.vec_id = a.vec_id"
        .stripMargin, s" AND $p")
      case None => ("", "")
    }
    s"""$sqlCents8,
       |$sqlPqCodes,
       |$sqlProbes,
       |pc AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= 2
       |),
       |pt AS (
       |  SELECT pr.probe_id, cb.j, cb.cid,
       |         list_sum(list_transform(list_zip(pr.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
       |  FROM pr CROSS JOIN cb
       |),
       |candq AS (
       |  SELECT DISTINCT pc.probe_id, a.vec_id
       |  FROM a JOIN pc ON a.cluster = pc.cell$joinE
       |  WHERE a.vec_id != pc.probe_id$pred
       |),
       |adq AS (
       |  SELECT candq.probe_id, candq.vec_id, list_sum(list(pt.sd ORDER BY q.j)) AS adist
       |  FROM candq JOIN pqa q ON q.vec_id = candq.vec_id
       |             JOIN pt ON pt.probe_id = candq.probe_id AND pt.j = q.j AND pt.cid = q.cid
       |  GROUP BY 1, 2
       |)""".stripMargin
  }
  private val sqlIvfPqAdcCtes: String = ivfPqAdcCtes(None)

  /** The in-memory IVF-PQ replay, shared verbatim by q_ivfpq_topk,
    * q_ivfpq_persist, q_ivfpq_refresh (disk-resident index + loaded
    * codebook must serve bit-identically), and — private[graft], same
    * acyclic-reference pattern as sqlLrChain — EntryStreaming's
    * q_stream_ann (the streamed serve must equal the batch serve). */
  private def ivfPqTopKSql(candPred: Option[String]): String =
    s"""WITH ${ivfPqAdcCtes(candPred)}
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adq) WHERE rn <= 10""".stripMargin
  private[graft] val sqlIvfPqTopK: String = ivfPqTopKSql(None)

  /** The filtered-serve replay (label % 2 = 0 on the candidate set) —
    * shared by q_ivfpq_filtered and EntryStreaming's
    * q_stream_ann_filtered (the streamed filtered serve must equal the
    * batch filtered serve). */
  private[graft] val sqlIvfPqFiltered: String =
    ivfPqTopKSql(Some("em.label % 2 = 0"))

  /** The q_opq_topk test rotation: a deterministic md5-derived
    * permutation + sign flip — orthogonal by construction (every row
    * and column carries exactly one ±1), cheap to replay in SQL, and
    * it flows through the SAME rotateVectors/rotateCol path a learned
    * OPQ rotation uses. (perm(j), sign(j)): y_j = sign_j · x_perm(j).
    * The dot kernel reproduces it bitwise: 0.0-weighted terms
    * contribute exact +0.0 to the fold, so the sum IS ±x_perm(j). */
  private[graft] def opqPermSign(d: Int): IndexedSeq[(Int, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(i: Int): String = {
      md.reset()
      md.digest(s"opq_$i".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    val hs = (0 until d).map(i => i -> hex(i))
    val perm = hs.sortBy(_._2).map(_._1) // md5-ordered permutation
    (0 until d).map { j =>
      (perm(j), if ((Integer.parseInt(hs(j)._2.substring(8, 9), 16) & 1) == 0) 1.0 else -1.0)
    }
  }

  private[graft] def opqTestRotation(d: Int): Array[Array[Double]] = {
    val ps = opqPermSign(d)
    val r = Array.fill(d, d)(0.0)
    ps.zipWithIndex.foreach { case ((p, s), j) => r(p)(j) = s }
    r
  }

  /** The RESIDUAL IVF-PQ CTE chain (VERDICT r15 item 1): residual
    * vectors x − c(x) per corpus row (rv), residual codebooks =
    * the 16 lowest-vec_id rows' residual subvectors (cbr — trainPQ
    * maxIter=0/FirstK over the residual relation), residual codes
    * (pqar), probe cells (pc — ranked on RAW query-to-centroid
    * distance, exactly like raw mode), per-(probe, cell) QUERY
    * residuals q − c(cell) (prr), per-(probe, cell) ADC sub-distance
    * tables over the residual codebooks (ptr), cell-pruned candidates
    * carrying their cell (candr — each vector lives in exactly one
    * cell, so the (probe, cand) pair's ADC uses the candidate's own
    * cell's query residual), and the summed approximate distances
    * (adr). All subtractions are the same IEEE a − b the engine's
    * CellResidualExpr / driver-side probeCellsDF compute. */
  private val sqlIvfPqResCtes: String =
    s"""$sqlCents8,
       |$sqlProbes,
       |rv AS (
       |  SELECT e.vec_id, a.cluster AS cell,
       |         list_transform(list_zip(e.embedding::DOUBLE[], c.cvec),
       |                        p -> p[1] - p[2]) AS r
       |  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
       |                    JOIN c ON c.cid = a.cluster
       |),
       |cbr AS (
       |  SELECT t.j, CAST(row_number() OVER (PARTITION BY t.j ORDER BY f.vec_id) AS INTEGER) AS cid,
       |         (f.r)[t.j*16+1 : t.j*16+16] AS cw
       |  FROM (SELECT * FROM rv ORDER BY vec_id LIMIT 16) f CROSS JOIN range(0, 4) t(j)
       |),
       |subr AS (
       |  SELECT rv.vec_id, rv.cell, t.j, (rv.r)[t.j*16+1 : t.j*16+16] AS sv
       |  FROM rv CROSS JOIN range(0, 4) t(j)
       |),
       |dpqr AS (
       |  SELECT s.vec_id, s.j, cb.cid,
       |         list_sum(list_transform(list_zip(s.sv, cb.cw), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM subr s JOIN cbr cb ON cb.j = s.j
       |),
       |pqar AS (
       |  SELECT vec_id, j, cid FROM (
       |    SELECT vec_id, j, cid,
       |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
       |    FROM dpqr) WHERE rn = 1
       |),
       |pc AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= 2
       |),
       |prr AS (
       |  SELECT pr.probe_id, pc.cell,
       |         list_transform(list_zip(pr.pv, c.cvec), p -> p[1] - p[2]) AS pvr
       |  FROM pr JOIN pc ON pc.probe_id = pr.probe_id
       |          JOIN c ON c.cid = pc.cell
       |),
       |ptr AS (
       |  SELECT prr.probe_id, prr.cell, cb.j, cb.cid,
       |         list_sum(list_transform(list_zip(prr.pvr[cb.j*16+1 : cb.j*16+16], cb.cw),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
       |  FROM prr CROSS JOIN cbr cb
       |),
       |candr AS (
       |  SELECT pc.probe_id, rv.vec_id, rv.cell
       |  FROM rv JOIN pc ON rv.cell = pc.cell
       |  WHERE rv.vec_id != pc.probe_id
       |),
       |adr AS (
       |  SELECT candr.probe_id, candr.vec_id, list_sum(list(ptr.sd ORDER BY q.j)) AS adist
       |  FROM candr JOIN pqar q ON q.vec_id = candr.vec_id
       |             JOIN ptr ON ptr.probe_id = candr.probe_id AND ptr.cell = candr.cell
       |                      AND ptr.j = q.j AND ptr.cid = q.cid
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** The residual IVF-PQ top-k replay, shared by q_ivfpq_residual
    * (in-memory) and q_ivfpq_res_refresh (persisted round trip +
    * append + compact must serve bit-identically). */
  private val sqlIvfPqResidual: String =
    s"""WITH $sqlIvfPqResCtes
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adr) WHERE rn <= 10""".stripMargin

  /** The residual shortlist + exact-cosine re-rank replay
    * (q_ivfpq_res_rerank): residual ADC shortlists 50, exact cosine
    * ranks the final 10 — the sqlIvfPqRerank pattern over adr. */
  private val sqlIvfPqResRerank: String =
    s"""WITH $sqlIvfPqResCtes,
       |rsl AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |    FROM adr) WHERE rn <= 50
       |),
       |rex AS (
       |  SELECT rsl.probe_id, rsl.vec_id,
       |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
       |  FROM rsl JOIN embeddings e ON e.vec_id = rsl.vec_id
       |           JOIN pr ON pr.probe_id = rsl.probe_id
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
       |  SELECT probe_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM rex) WHERE rn <= 10""".stripMargin

  /** Shared rotated-space base CTEs: the md5 permutation+sign
    * rotation as a 64-element literal list (generated from the same
    * opqPermSign the engine's rotation matrix is built from — the
    * q_rand_proj pattern), then PQ train/encode and the rotated
    * probes — everything the flat (q_opq_topk) and persisted-IVF
    * (q_opq_refresh) replays both need. */
  private val sqlOpqBaseCtes: String = {
    val terms = opqPermSign(64).map { case (p, s) =>
      s"CAST(${if (s > 0) "1" else "-1"} AS DOUBLE) * e.v[${p + 1}]"
    }.mkString(", ")
    s"""re AS MATERIALIZED (
       |  SELECT vec_id, [$terms] AS r
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e
       |),
       |cbo AS (
       |  SELECT t.j, CAST(row_number() OVER (PARTITION BY t.j ORDER BY f.vec_id) AS INTEGER) AS cid,
       |         (f.r)[t.j*16+1 : t.j*16+16] AS cw
       |  FROM (SELECT * FROM re ORDER BY vec_id LIMIT 16) f CROSS JOIN range(0, 4) t(j)
       |),
       |subo AS (
       |  SELECT re.vec_id, t.j, (re.r)[t.j*16+1 : t.j*16+16] AS sv
       |  FROM re CROSS JOIN range(0, 4) t(j)
       |),
       |dpo AS (
       |  SELECT s.vec_id, s.j, cb.cid,
       |         list_sum(list_transform(list_zip(s.sv, cb.cw), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM subo s JOIN cbo cb ON cb.j = s.j
       |),
       |pqo AS (
       |  SELECT vec_id, j, cid FROM (
       |    SELECT vec_id, j, cid,
       |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
       |    FROM dpo) WHERE rn = 1
       |),
       |pro AS (
       |  SELECT vec_id AS probe_id, r AS pv
       |  FROM re WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5)
       |),
       |pto AS (
       |  SELECT pro.probe_id, cb.j, cb.cid,
       |         list_sum(list_transform(list_zip(pro.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
       |  FROM pro CROSS JOIN cbo cb
       |)""".stripMargin
  }

  /** The OPQ rotate-then-quantize replay: the standard PQ
    * train/encode/ADC chain entirely in rotated space, flat (no IVF
    * pruning — every candidate ADCs against every probe). */
  private val sqlOpqTopK: String =
    s"""WITH $sqlOpqBaseCtes,
       |ado AS (
       |  SELECT pto.probe_id, a.vec_id, list_sum(list(pto.sd ORDER BY a.j)) AS adist
       |  FROM pqo a JOIN pto ON pto.j = a.j AND pto.cid = a.cid
       |  GROUP BY 1, 2
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM ado WHERE vec_id != probe_id)
       |WHERE rn <= 10""".stripMargin

  /** The rotated PERSISTED-IVF replay (q_opq_refresh — VERDICT r16
    * item 1): coarse cells = the 8 lowest-vec_id ROTATED rows (FirstK
    * in rotated space), assignment and probe-cell ranking both on
    * rotated vectors, candidates pruned to each probe's 2 nearest
    * cells, ADC over the rotated codes — the full rotated lifecycle's
    * serve (save/load artifact + build + append + compact are
    * hash-invisible when correct, and any drift in them breaks this).
    * private[graft]: EntryStreaming's q_stream_ann_opq oracle replays
    * the same chain (the sqlIvfPqTopK acyclic-reference pattern). */
  private[graft] val sqlOpqRefresh: String =
    s"""WITH $sqlOpqBaseCtes,
       |co AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
       |         r AS cvec
       |  FROM (SELECT * FROM re ORDER BY vec_id LIMIT 8)
       |),
       |dco AS (
       |  SELECT e.vec_id, c.cid,
       |         list_sum(list_transform(list_zip(e.r, c.cvec),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM re e CROSS JOIN co c
       |),
       |aco AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dco) WHERE rn = 1
       |),
       |pco AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dco WHERE vec_id IN (SELECT probe_id FROM pro)) WHERE rn <= 2
       |),
       |cando AS (
       |  SELECT DISTINCT pco.probe_id, a.vec_id
       |  FROM aco a JOIN pco ON a.cell = pco.cell
       |  WHERE a.vec_id != pco.probe_id
       |),
       |adivo AS (
       |  SELECT cando.probe_id, cando.vec_id, list_sum(list(pto.sd ORDER BY q.j)) AS adist
       |  FROM cando JOIN pqo q ON q.vec_id = cando.vec_id
       |             JOIN pto ON pto.probe_id = cando.probe_id AND pto.j = q.j AND pto.cid = q.cid
       |  GROUP BY 1, 2
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adivo) WHERE rn <= 10""".stripMargin

  /** The rotated shortlist + rotated-space exact-cosine re-rank
    * replay (q_opq_rerank — the complete production OPQ query path):
    * adivo shortlists 50 per probe from the rotated codes, then the
    * exact cosine runs over the ROTATED vectors (re for candidates,
    * pro.pv for probes) — bit-identical to the engine's rotated
    * exactRerank; orthogonality makes the RANKING equal to raw-space
    * cosine, but the replay stays in rotated space so the hash pins
    * the arithmetic actually executed. */
  private val sqlOpqRerank: String =
    s"""WITH $sqlOpqBaseCtes,
       |co AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
       |         r AS cvec
       |  FROM (SELECT * FROM re ORDER BY vec_id LIMIT 8)
       |),
       |dco AS (
       |  SELECT e.vec_id, c.cid,
       |         list_sum(list_transform(list_zip(e.r, c.cvec),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM re e CROSS JOIN co c
       |),
       |aco AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dco) WHERE rn = 1
       |),
       |pco AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dco WHERE vec_id IN (SELECT probe_id FROM pro)) WHERE rn <= 2
       |),
       |cando AS (
       |  SELECT DISTINCT pco.probe_id, a.vec_id
       |  FROM aco a JOIN pco ON a.cell = pco.cell
       |  WHERE a.vec_id != pco.probe_id
       |),
       |adivo AS (
       |  SELECT cando.probe_id, cando.vec_id, list_sum(list(pto.sd ORDER BY q.j)) AS adist
       |  FROM cando JOIN pqo q ON q.vec_id = cando.vec_id
       |             JOIN pto ON pto.probe_id = cando.probe_id AND pto.j = q.j AND pto.cid = q.cid
       |  GROUP BY 1, 2
       |),
       |osl AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |    FROM adivo) WHERE rn <= 50
       |),
       |orx AS (
       |  SELECT osl.probe_id, osl.vec_id,
       |         ${sqlCosine("cv.r", "pro.pv")} AS sim
       |  FROM osl JOIN re cv ON cv.vec_id = osl.vec_id
       |           JOIN pro ON pro.probe_id = osl.probe_id
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
       |  SELECT probe_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM orx) WHERE rn <= 10""".stripMargin

  /** The delete-lifecycle replay (q_ivfpq_delete — VERDICT r16 item
    * 2): the in-memory IVF-PQ chain with candidates filtered to the
    * SURVIVORS of each phase. Masked phase (post-delete, pre-compact)
    * = everything but vec_id % 7 = 3; final phase (post-compact +
    * re-append of the % 14 = 3 half) = everything but vec_id % 14 =
    * 10. Model and quantizer are frozen from the FULL corpus before
    * the deletes, so only the candidate set moves. */
  private val sqlIvfPqDelete: String =
    s"""WITH $sqlIvfPqAdcCtes
       |SELECT 'masked' AS phase, probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adq WHERE vec_id % 7 != 3) WHERE rn <= 10
       |UNION ALL
       |SELECT 'final' AS phase, probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adq WHERE vec_id % 14 != 10) WHERE rn <= 10""".stripMargin

  /** The IVF-PQ shortlist + exact-cosine re-rank replay, shared by
    * q_ivfpq_rerank (in-memory), q_ivfpq_rerank_idx (served from the
    * persisted code table — must shortlist identically), and the
    * filtered rerank (candidates filter BEFORE the shortlist, so the
    * 50 slots hold qualifying rows only). */
  private def ivfPqRerankSql(candPred: Option[String]): String =
    s"""WITH ${ivfPqAdcCtes(candPred)},
       |isl AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |    FROM adq) WHERE rn <= 50
       |),
       |iex AS (
       |  SELECT isl.probe_id, isl.vec_id,
       |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
       |  FROM isl JOIN embeddings e ON e.vec_id = isl.vec_id
       |           JOIN pr ON pr.probe_id = isl.probe_id
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
       |  SELECT probe_id, vec_id, sim,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
       |  FROM iex) WHERE rn <= 10""".stripMargin
  private val sqlIvfPqRerank: String = ivfPqRerankSql(None)

  /** The blue/green retrain replay (q_ivfpq_retrain — VERDICT r17
    * item 3): after the generational quantizer swap, the serve must
    * equal the in-memory IVF-PQ search under the NEW coarse quantizer
    * (FirstK(4)) with the unchanged raw codebooks — the same adq chain
    * with cells from a 4-centroid assignment. A flip that left old
    * cells, old provenance, or a torn generation behind hash-mismatches
    * here. */
  private val sqlIvfPqRetrain: String =
    s"""WITH c4 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
       |         embedding::DOUBLE[] AS cvec
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
       |),
       |d4 AS (
       |  SELECT e.vec_id, c4.cid,
       |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c4.cvec),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM embeddings e CROSS JOIN c4
       |),
       |a4 AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d4) WHERE rn = 1
       |),
       |$sqlPqCodes,
       |$sqlProbes,
       |pc AS (
       |  SELECT vec_id AS probe_id, cid AS cell FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d4 WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= 2
       |),
       |pt AS (
       |  SELECT pr.probe_id, cb.j, cb.cid,
       |         list_sum(list_transform(list_zip(pr.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
       |  FROM pr CROSS JOIN cb
       |),
       |candq AS (
       |  SELECT DISTINCT pc.probe_id, a4.vec_id
       |  FROM a4 JOIN pc ON a4.cluster = pc.cell
       |  WHERE a4.vec_id != pc.probe_id
       |),
       |adq AS (
       |  SELECT candq.probe_id, candq.vec_id, list_sum(list(pt.sd ORDER BY q.j)) AS adist
       |  FROM candq JOIN pqa q ON q.vec_id = candq.vec_id
       |             JOIN pt ON pt.probe_id = candq.probe_id AND pt.j = q.j AND pt.cid = q.cid
       |  GROUP BY 1, 2
       |)
       |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
       |  SELECT probe_id, vec_id, adist,
       |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
       |  FROM adq) WHERE rn <= 10""".stripMargin

  /** The persisted serving-sweep replay (q_sweep_pick — VERDICT r17
    * item 5): aggregate recall@10 of the indexed shortlist+rerank
    * serve at two grid points (nprobe 1 and 2, shortlist 50) against
    * the exact top-10, then the pick rule — cheapest measured seconds
    * among rows meeting the midpoint target, ties to the smaller
    * (nprobe, shortlist). The recall VALUES and the CHOSEN flag are
    * both under the hash, so a drifted save/load round trip, a
    * stale-fingerprint miss, or a broken pick rule all mismatch. */
  private val sqlSweepPick: String = {
    def rerankTopAt(np: Int, tag: String): String =
      s"""pc$tag AS (
         |  SELECT vec_id AS probe_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= $np
         |),
         |cand$tag AS (
         |  SELECT DISTINCT pc$tag.probe_id, a.vec_id
         |  FROM a JOIN pc$tag ON a.cluster = pc$tag.cell
         |  WHERE a.vec_id != pc$tag.probe_id
         |),
         |adq$tag AS (
         |  SELECT cand$tag.probe_id, cand$tag.vec_id, list_sum(list(pt.sd ORDER BY q.j)) AS adist
         |  FROM cand$tag JOIN pqa q ON q.vec_id = cand$tag.vec_id
         |             JOIN pt ON pt.probe_id = cand$tag.probe_id AND pt.j = q.j AND pt.cid = q.cid
         |  GROUP BY 1, 2
         |),
         |sl$tag AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |           row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
         |    FROM adq$tag) WHERE rn <= 50
         |),
         |rx$tag AS (
         |  SELECT sl$tag.probe_id, sl$tag.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM sl$tag JOIN embeddings e ON e.vec_id = sl$tag.vec_id
         |           JOIN pr ON pr.probe_id = sl$tag.probe_id
         |),
         |top$tag AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |           row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |    FROM rx$tag) WHERE rn <= 10
         |),
         |r$tag AS (
         |  SELECT CAST((SELECT count(*) FROM top$tag t JOIN ex ON ex.probe_id = t.probe_id
         |               AND ex.vec_id = t.vec_id) AS DOUBLE)
         |         / CAST((SELECT count(*) FROM ex) AS DOUBLE) AS rec
         |)""".stripMargin
    s"""WITH $sqlCents8,
       |$sqlPqCodes,
       |$sqlProbes,
       |pt AS (
       |  SELECT pr.probe_id, cb.j, cb.cid,
       |         list_sum(list_transform(list_zip(pr.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
       |  FROM pr CROSS JOIN cb
       |),
       |exs AS (
       |  SELECT pr.probe_id, e.vec_id,
       |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
       |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
       |),
       |ex AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |           row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
       |    FROM exs) WHERE rn <= 10
       |),
       |${rerankTopAt(1, "g1")},
       |${rerankTopAt(2, "g2")},
       |grid AS (
       |  SELECT 1 AS nprobe, 50 AS shortlist, (SELECT rec FROM rg1) AS recall,
       |         CAST(1.0 AS DOUBLE) AS seconds
       |  UNION ALL
       |  SELECT 2, 50, (SELECT rec FROM rg2), CAST(2.0 AS DOUBLE)
       |),
       |t AS (SELECT (min(recall) + max(recall)) / 2 AS tgt FROM grid),
       |pick AS (
       |  SELECT nprobe, shortlist FROM grid CROSS JOIN t WHERE recall >= tgt
       |  ORDER BY seconds, nprobe, shortlist LIMIT 1
       |)
       |SELECT g.nprobe, g.shortlist, g.recall, g.seconds,
       |       (g.nprobe = p.nprobe AND g.shortlist = p.shortlist) AS chosen
       |FROM grid g CROSS JOIN pick p""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q_topk_cosine" ->
      s"""WITH $sqlProbes,
         |s AS (
         |  SELECT pr.probe_id, e.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
         |)
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10""".stripMargin,


    "q_twonn" ->
      """WITH pr AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
        |            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 100)),
        |d AS (SELECT pr.probe_id, e.vec_id,
        |             sqrt(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], pr.pv),
        |                                          p -> (p[1]-p[2])*(p[1]-p[2])))) AS dist
        |      FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id),
        |r AS (SELECT probe_id, dist,
        |             row_number() OVER (PARTITION BY probe_id ORDER BY dist, vec_id) AS rn
        |      FROM d),
        |mus AS (SELECT a.probe_id, b.dist / a.dist AS mu
        |        FROM r a JOIN r b ON b.probe_id = a.probe_id AND a.rn = 1 AND b.rn = 2
        |        WHERE a.dist > 0),
        |rr AS (SELECT mu, CAST(row_number() OVER (ORDER BY mu) AS BIGINT) AS r FROM mus),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM mus),
        |ps AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                      CAST(0.75 AS DOUBLE)]) AS p),
        |spec AS (SELECT p, m, CAST(m - 1 AS DOUBLE) * p + 1 AS h FROM mm CROSS JOIN ps),
        |spec2 AS (SELECT p, m, CAST(floor(h) AS BIGINT) AS lo,
        |                 least(CAST(floor(h) AS BIGINT) + 1, m) AS hi,
        |                 h - floor(h) AS frac
        |          FROM spec)
        |SELECT s.p, rl.mu + s.frac * (rh.mu - rl.mu) AS q
        |FROM spec2 s JOIN rr rl ON rl.r = s.lo JOIN rr rh ON rh.r = s.hi""".stripMargin,


    "q_hubness" ->
      """WITH pr AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
        |            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 100)),
        |s AS (
        |  SELECT pr.probe_id, e.vec_id,
        |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], pr.pv), q -> q[1]*q[2]))
        |          / (sqrt(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], e.embedding::DOUBLE[]), q -> q[1]*q[2])))
        |             * sqrt(list_sum(list_transform(list_zip(pr.pv, pr.pv), q -> q[1]*q[2])))) AS sim
        |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
        |),
        |t AS (SELECT vec_id FROM (
        |        SELECT vec_id, row_number() OVER (PARTITION BY probe_id
        |                                          ORDER BY sim DESC, vec_id) AS rn
        |        FROM s) WHERE rn <= 10),
        |occ AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_lists FROM t GROUP BY 1)
        |SELECT n_lists, CAST(count(*) AS BIGINT) AS n_points FROM occ GROUP BY 1""".stripMargin,


    "q_ann_filtered" ->
      s"""WITH $sqlProbes,
         |s AS (
         |  SELECT pr.probe_id, e.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr
         |  WHERE e.vec_id != pr.probe_id AND e.label % 2 = 0
         |)
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10""".stripMargin,


    "q_basket_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS item1, c.l_partkey AS item2,
        |             CAST(count(*) AS BIGINT) AS n_baskets
        |      FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
        |                       AND a.l_partkey < c.l_partkey
        |      GROUP BY 1, 2),
        |it AS (SELECT l_partkey AS i, CAST(count(*) AS BIGINT) AS ni FROM b GROUP BY 1)
        |SELECT p.item1, p.item2, p.n_baskets,
        |       CAST(p.n_baskets AS DOUBLE)
        |         / sqrt(CAST(i1.ni * i2.ni AS DOUBLE)) AS cosine
        |FROM p JOIN it i1 ON i1.i = p.item1 JOIN it i2 ON i2.i = p.item2
        |ORDER BY p.n_baskets DESC, p.item1, p.item2 LIMIT 50""".stripMargin,


    "q_knn_label" ->
      s"""WITH pr AS (
         |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv, label AS tl
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 20)
         |),
         |s AS (
         |  SELECT pr.probe_id, e.vec_id, e.label,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
         |),
         |t AS (SELECT probe_id, label FROM (
         |        SELECT probe_id, label,
         |               row_number() OVER (PARTITION BY probe_id
         |                                  ORDER BY sim DESC, vec_id) AS rn
         |        FROM s) WHERE rn <= 10),
         |v AS (SELECT probe_id, label, CAST(count(*) AS BIGINT) AS votes
         |      FROM t GROUP BY 1, 2),
         |w AS (SELECT probe_id, label AS pred_label, votes,
         |             row_number() OVER (PARTITION BY probe_id
         |                                ORDER BY votes DESC, label) AS rn
         |      FROM v)
         |SELECT w.probe_id, w.pred_label, w.votes, pr.tl AS true_label,
         |       CAST(CASE WHEN w.pred_label = pr.tl THEN 1 ELSE 0 END AS INT) AS correct
         |FROM w JOIN pr ON w.probe_id = pr.probe_id WHERE w.rn = 1""".stripMargin,


    "q_triplets" ->
      s"""WITH pr AS (
         |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv, label AS pl
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 10)
         |),
         |s AS (
         |  SELECT pr.probe_id, pr.pl, e.vec_id, e.label,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
         |),
         |t AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |                                   ORDER BY sim DESC, vec_id) AS rn
         |      FROM s),
         |k AS (SELECT * FROM t WHERE rn <= 50),
         |pos AS (SELECT probe_id, vec_id AS pos_id, sim AS pos_sim,
         |               row_number() OVER (PARTITION BY probe_id ORDER BY rn) AS r2
         |        FROM k WHERE label = pl),
         |neg AS (SELECT probe_id, vec_id AS neg_id, sim AS neg_sim,
         |               row_number() OVER (PARTITION BY probe_id ORDER BY rn) AS r2
         |        FROM k WHERE label <> pl)
         |SELECT p.probe_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim
         |FROM pos p JOIN neg n ON p.probe_id = n.probe_id
         |WHERE p.r2 = 1 AND n.r2 = 1""".stripMargin,


    "q_rand_proj" -> {
      val dims = (1 to 8).map { j =>
        val arr = (1 to 64).map(i =>
          if (Similarity.projSign(j, i) > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]")
        s"list_sum(list_transform(list_zip(embedding::DOUBLE[], $arr), q -> q[1]*q[2])) AS proj_${j - 1}"
      }.mkString(",\n       ")
      s"""SELECT vec_id,
         |       $dims
         |FROM embeddings""".stripMargin
    },


    "q_pq_encode" ->
      s"""WITH $sqlPqCodes
         |SELECT vec_id, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY j) AS codes
         |FROM pqa GROUP BY vec_id""".stripMargin,


    "q_pq_topk" ->
      s"""WITH $sqlPqCodes,
         |$sqlProbes,
         |$sqlPqAdc
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
         |  SELECT probe_id, vec_id, adist,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
         |  FROM ad WHERE vec_id != probe_id)
         |WHERE rn <= 10""".stripMargin,


    // encode + ADC through the persisted codebook must reproduce
    // q_pq_topk exactly (bit-exact double round-trip) — the oracle is
    // that replay verbatim.
    "q_pq_persist" ->
      s"""WITH $sqlPqCodes,
         |$sqlProbes,
         |$sqlPqAdc
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, adist FROM (
         |  SELECT probe_id, vec_id, adist,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
         |  FROM ad WHERE vec_id != probe_id)
         |WHERE rn <= 10""".stripMargin,


    "q_pq_rerank" ->
      s"""WITH $sqlPqCodes,
         |$sqlProbes,
         |$sqlPqAdc,
         |sl AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT probe_id, vec_id,
         |           row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
         |    FROM ad WHERE vec_id != probe_id) WHERE rn <= 50
         |),
         |ex AS (
         |  SELECT sl.probe_id, sl.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM sl JOIN embeddings e ON e.vec_id = sl.vec_id
         |          JOIN pr ON pr.probe_id = sl.probe_id
         |)
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM ex) WHERE rn <= 10""".stripMargin,


    "q_ivfpq_topk" -> sqlIvfPqTopK,


    // serving through the persisted code table AND the loaded
    // codebook must reproduce the in-memory IVF-PQ search exactly —
    // the oracle is that replay verbatim.
    "q_ivfpq_persist" -> sqlIvfPqTopK,


    // build + append + serve ≡ one in-memory search over the full
    // corpus — the same replay, verbatim (VERDICT r13 item 2).
    "q_ivfpq_refresh" -> sqlIvfPqTopK,


    // the ADC chain's 50-candidate shortlist re-ranked by exact
    // cosine — the q_pq_rerank pattern over the IVF-PQ candidates;
    // shared verbatim by the persisted-index serve (q_ivfpq_rerank_idx
    // — the stored codes must shortlist exactly what the in-memory
    // encode does)
    "q_ivfpq_rerank" -> sqlIvfPqRerank,
    "q_ivfpq_rerank_idx" -> sqlIvfPqRerank,


    // filtered ANN (VERDICT r17 item 1): the metadata predicate masks
    // the CANDIDATE set before ADC / before the shortlist — the
    // engine's in-scan filter replayed on the candq join
    "q_ivfpq_filtered" -> sqlIvfPqFiltered,
    "q_ivfpq_filtered_rr" -> ivfPqRerankSql(Some("em.label % 4 = 1")),
    "q_ivf_filtered" -> ivfTopKSql(Some("e.label % 2 = 0")),


    // blue/green retrain: post-flip serve ≡ in-memory search under
    // the NEW quantizer (VERDICT r17 item 3)
    "q_ivfpq_retrain" -> sqlIvfPqRetrain,


    // persisted serving sweep: measured recalls + the pick rule under
    // the hash (VERDICT r17 item 5)
    "q_sweep_pick" -> sqlSweepPick,


    // residual IVF-PQ (IVF-ADC proper — VERDICT r15 item 1): the
    // oracle replays the x − c(x) / q − c(cell) subtractions end to
    // end; the persisted row (savePQ v2 round trip + build + append +
    // compact) must serve exactly the in-memory residual search
    "q_ivfpq_residual" -> sqlIvfPqResidual,
    "q_ivfpq_res_refresh" -> sqlIvfPqResidual,
    "q_ivfpq_res_rerank" -> sqlIvfPqResRerank,


    // OPQ rotate-then-quantize (Ge et al. CVPR'13): the serve
    // plumbing under a deterministic orthogonal test rotation — the
    // learned-R trainer is engine-only (driver-side Procrustes SVD,
    // like PCA's eigendecomposition) and spec/stress-gated
    "q_opq_topk" -> sqlOpqTopK,
    "q_opq_refresh" -> sqlOpqRefresh,
    "q_opq_rerank" -> sqlOpqRerank,
    "q_ivfpq_delete" -> sqlIvfPqDelete,
    "q_ivf_delete" -> sqlIvfDelete,


    "q_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |mm AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e)
        |SELECT vec_id,
        |       array_to_string(list_transform(v, x ->
        |         CAST(CASE WHEN hi = lo THEN 0
        |                   ELSE floor((x - lo) * 255.0 / (hi - lo) + 0.5)
        |              END AS INTEGER)), ',') AS codes,
        |       lo, hi
        |FROM mm""".stripMargin,


    "q_ann_buckets" ->
      s"""WITH $sqlAnnIndex
         |SELECT vec_id, tbl, bucket FROM bk""".stripMargin,


    "q_ann_topk" ->
      s"""WITH $sqlAnnIndex,
         |$sqlProbes,
         |cand AS (
         |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id
         |  FROM bk c JOIN bk p ON c.tbl = p.tbl AND c.bucket = p.bucket
         |  WHERE p.vec_id IN (SELECT probe_id FROM pr) AND c.vec_id != p.vec_id
         |),
         |s AS (
         |  SELECT cand.probe_id, cand.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM cand
         |  JOIN embeddings e ON e.vec_id = cand.vec_id
         |  JOIN pr ON pr.probe_id = cand.probe_id
         |)
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10""".stripMargin,


    "q_ivf_topk" -> sqlIvfTopK,
    // the maintained (build+append) index must serve the identical
    // result — the freshness story is gate-shared with q_ivf_topk
    "q_ivf_refresh" -> sqlIvfTopK,



    "q_group_centroids" ->
      """WITH x AS (
        |  SELECT label,
        |         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |)
        |SELECT label,
        |       CAST(count(v) AS BIGINT) AS n, pos,
        |       list_reduce(list_sort(list(v)), (acc, e) -> acc + e) / count(v) AS val
        |FROM x WHERE v IS NOT NULL GROUP BY label, pos""".stripMargin,


    "q_dist_match" ->
      """WITH srcd AS (SELECT doc_id, n_chars // 200 AS bin FROM documents
        |              WHERE doc_id % 2 = 0 AND n_chars IS NOT NULL),
        |refd AS (SELECT n_chars // 200 AS bin FROM documents
        |         WHERE doc_id % 2 <> 0 AND n_chars IS NOT NULL),
        |s AS (SELECT bin, CAST(count(*) AS BIGINT) AS sn FROM srcd GROUP BY 1),
        |t AS (SELECT bin, CAST(count(*) AS BIGINT) AS tn FROM refd GROUP BY 1),
        |l AS (SELECT min(CAST(coalesce(s.sn, 0) AS DOUBLE) / CAST(t.tn AS DOUBLE)) AS lam
        |      FROM t LEFT JOIN s USING (bin)),
        |r AS (SELECT t.bin,
        |             least(CAST(1.0 AS DOUBLE),
        |                   CAST(t.tn AS DOUBLE) * l.lam / CAST(s.sn AS DOUBLE)) AS rate
        |      FROM t JOIN s USING (bin) CROSS JOIN l)
        |SELECT d.doc_id, d.bin
        |FROM srcd d JOIN r USING (bin)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      / 4294967296.0 < r.rate""".stripMargin,


    "q_negatives" ->
      """WITH r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk FROM documents),
        |t AS (SELECT count(*) AS n FROM documents),
        |x AS (
        |  SELECT r.doc_id, CAST(j AS INTEGER) AS j,
        |         (rk - 1 + 1 + CAST(concat('0x', substr(md5('42:' || r.doc_id || ':' || j), 1, 8)) AS BIGINT)
        |                       % (t.n - 1)) % t.n + 1 AS nr
        |  FROM r CROSS JOIN t CROSS JOIN generate_series(1, 3) s(j)
        |)
        |SELECT x.doc_id, x.j, r2.doc_id AS neg_id
        |FROM x JOIN r r2 ON r2.rk = x.nr""".stripMargin,


    "q_hard_negatives" ->
      s"""WITH $sqlCents8,
         |r AS (SELECT vec_id, cluster,
         |             row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rk,
         |             count(*) OVER (PARTITION BY cluster) AS m
         |      FROM a),
         |x AS (
         |  SELECT vec_id, cluster, CAST(j AS INTEGER) AS j,
         |         (rk - 1 + 1 + CAST(concat('0x', substr(md5('42:' || vec_id || ':' || j), 1, 8)) AS BIGINT)
         |                       % (m - 1)) % m + 1 AS nr
         |  FROM r CROSS JOIN generate_series(1, 2) s(j)
         |  WHERE m >= 2
         |)
         |SELECT x.vec_id, x.cluster, x.j, r2.vec_id AS neg_id
         |FROM x JOIN r r2 ON r2.cluster = x.cluster AND r2.rk = x.nr""".stripMargin,


    "q_rrf" ->
      s"""WITH $sqlBm25Ctes,
         |bm AS (SELECT doc_id, $sqlBm25Expr AS bm25 FROM t CROSS JOIN st),
         |sp AS (SELECT id, srank FROM (
         |         SELECT doc_id AS id,
         |                CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS srank
         |         FROM bm) WHERE srank <= 100),
         |$sqlProbes,
         |ds AS (
         |  SELECT pr.probe_id, e.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
         |),
         |dn AS (SELECT probe_id, id, drank FROM (
         |         SELECT probe_id, vec_id AS id,
         |                CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS BIGINT) AS drank
         |         FROM ds) WHERE drank <= 100),
         |spp AS (SELECT pr.probe_id, sp.id, sp.srank FROM pr CROSS JOIN sp),
         |j AS (
         |  SELECT coalesce(spp.probe_id, dn.probe_id) AS probe_id,
         |         coalesce(spp.id, dn.id) AS id, spp.srank, dn.drank
         |  FROM spp FULL OUTER JOIN dn
         |    ON spp.probe_id = dn.probe_id AND spp.id = dn.id
         |),
         |sc AS (
         |  SELECT probe_id, id,
         |         coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(srank AS DOUBLE)), 0)
         |           + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(drank AS DOUBLE)), 0) AS rrf
         |  FROM j
         |)
         |SELECT probe_id, id, rrf, rank FROM (
         |  SELECT probe_id, id, rrf,
         |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY rrf DESC, id) AS BIGINT) AS rank
         |  FROM sc) WHERE rank <= 20""".stripMargin,


    "q_kcenter" ->
      """WITH RECURSIVE pts AS (
        |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 100
        |),
        |dm AS (
        |  SELECT a.id AS a, b.id AS b,
        |         list_sum(list_transform(list_zip(a.v, b.v),
        |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS d
        |  FROM pts a CROSS JOIN pts b WHERE a.id != b.id
        |),
        |walk(it, sel) AS (
        |  SELECT 0, [(SELECT min(id) FROM pts)]
        |  UNION ALL
        |  SELECT it + 1, list_append(sel, (
        |    SELECT a FROM dm
        |    WHERE list_contains(sel, b) AND NOT list_contains(sel, a)
        |    GROUP BY a ORDER BY min(d) DESC, a LIMIT 1))
        |  FROM walk WHERE it < 7
        |),
        |fin AS (SELECT sel FROM walk WHERE it = 7),
        |ord AS (SELECT CAST(i - 1 AS BIGINT) AS step, sel[i] AS vec_id, sel
        |        FROM fin, LATERAL (SELECT unnest(generate_series(1, len(sel))) AS i))
        |SELECT step, vec_id,
        |       CASE WHEN step = 0 THEN CAST(0 AS DOUBLE)
        |            ELSE (SELECT min(d) FROM dm
        |                  WHERE dm.a = ord.vec_id
        |                    AND list_contains(ord.sel[1:CAST(step AS INTEGER)], dm.b))
        |       END AS radius
        |FROM ord""".stripMargin,


    "q_mmr" ->
      s"""WITH RECURSIVE mp AS (
         |  SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings
         |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
         |),
         |scd AS (
         |  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "mp.pv")} AS rel
         |  FROM embeddings e CROSS JOIN mp WHERE e.vec_id != mp.pid
         |),
         |cand AS (SELECT id, v, rel FROM (
         |           SELECT id, v, rel, row_number() OVER (ORDER BY rel DESC, id) AS rn
         |           FROM scd) WHERE rn <= 20),
         |cm AS (
         |  SELECT a.id AS a, b.id AS b, ${sqlCosine("a.v", "b.v")} AS s
         |  FROM cand a CROSS JOIN cand b WHERE a.id != b.id
         |),
         |walk(it, sel) AS (
         |  SELECT 0, [(SELECT id FROM cand ORDER BY rel DESC, id LIMIT 1)]
         |  UNION ALL
         |  SELECT it + 1, list_append(sel, (
         |    SELECT c.id FROM cand c
         |    WHERE NOT list_contains(sel, c.id)
         |    ORDER BY 0.5 * c.rel - 0.5 * (SELECT max(s) FROM cm
         |                                  WHERE cm.a = c.id AND list_contains(sel, cm.b)) DESC,
         |             c.id
         |    LIMIT 1))
         |  FROM walk WHERE it < 4
         |),
         |fin AS (SELECT sel FROM walk WHERE it = 4),
         |ord AS (SELECT CAST(i - 1 AS BIGINT) AS step, sel[i] AS vec_id, sel
         |        FROM fin, LATERAL (SELECT unnest(generate_series(1, len(sel))) AS i))
         |SELECT step, vec_id,
         |       CASE WHEN step = 0 THEN (SELECT rel FROM cand WHERE cand.id = ord.vec_id)
         |            ELSE 0.5 * (SELECT rel FROM cand WHERE cand.id = ord.vec_id)
         |               - 0.5 * (SELECT max(s) FROM cm
         |                        WHERE cm.a = ord.vec_id
         |                          AND list_contains(ord.sel[1:CAST(step AS INTEGER)], cm.b))
         |       END AS score
         |FROM ord""".stripMargin,


    "q_embed_drift" ->
      s"""WITH $sqlCents8,
         |g AS (SELECT cluster,
         |             CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS na,
         |             CAST(count(*) FILTER (WHERE vec_id % 2 <> 0) AS BIGINT) AS nb
         |      FROM a GROUP BY 1),
         |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
         |             CAST(sum(nb) AS BIGINT) AS tb FROM g)
         |SELECT g.cluster, g.na, g.nb,
         |       CAST(abs(g.na * t.tb - g.nb * t.ta) AS DOUBLE)
         |         / CAST(t.ta * t.tb AS DOUBLE) AS share_gap
         |FROM g CROSS JOIN t""".stripMargin,


    "q_feat_hash" ->
      """WITH t AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 64 AS bucket,
        |             1 - 2 * (CAST(concat('0x', substr(h, 9, 1)) AS BIGINT) % 2) AS sign
        |      FROM t)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS weight
        |FROM s GROUP BY 1, 2""".stripMargin,


    // 8 unrolled GD iterations (sqlLrChain); weights on the exact-
    // integer 1e-4 grid. pos 64 = bias.
    "q_lr_train" ->
      s"""$sqlLrChain
         |SELECT CAST(pos AS INTEGER) AS pos,
         |       CAST(floor(w * 10000 + 0.5) AS BIGINT) AS w4 FROM w8
         |UNION ALL
         |SELECT CAST(64 AS INTEGER), CAST(floor(b * 10000 + 0.5) AS BIGINT)
         |FROM b8""".stripMargin,


    // Final-model scoring over the same chain; `admitted` derives
    // from the quantized score, never the raw double.
    "q_lr_score" ->
      s"""$sqlLrChain,
         |mf AS (SELECT x.doc_id,
         |         1.0/(1.0 + exp(-(sum(w.w * x.v) + (SELECT b FROM b8)))) AS p
         |       FROM x JOIN w8 w USING (pos) GROUP BY x.doc_id)
         |SELECT doc_id, CAST(floor(p * 10000 + 0.5) AS BIGINT) AS score4,
         |       CAST(floor(p * 10000 + 0.5) AS BIGINT) >= 5000 AS admitted
         |FROM mf""".stripMargin,


    // Serving through the persisted artifact must reproduce
    // q_lr_score exactly (bit-exact double round-trip through
    // parquet) — the oracle is that replay verbatim.
    "q_lr_persist" ->
      s"""$sqlLrChain,
         |mf AS (SELECT x.doc_id,
         |         1.0/(1.0 + exp(-(sum(w.w * x.v) + (SELECT b FROM b8)))) AS p
         |       FROM x JOIN w8 w USING (pos) GROUP BY x.doc_id)
         |SELECT doc_id, CAST(floor(p * 10000 + 0.5) AS BIGINT) AS score4,
         |       CAST(floor(p * 10000 + 0.5) AS BIGINT) >= 5000 AS admitted
         |FROM mf""".stripMargin,


    // NB head-to-head eval: the q_lr_eval harness over NB log-odds
    // (admission threshold 0 on the quantized grid).
    "q_nb_eval" ->
      s"""WITH $sqlNbChain,
         |pri AS (SELECT ln(CAST(sum(y) AS DOUBLE))
         |             - ln(CAST(sum(1 - y) AS DOUBLE)) AS bias FROM lab),
         |${sqlEvalTail(
        """SELECT tfc.doc_id, max(l.y) AS y,
          |         CAST(floor((sum(tfc.tf * coalesce(wt.w,
          |             (SELECT ln(t0 + 1.0 * v) - ln(t1 + 1.0 * v) FROM tot)))
          |           + (SELECT bias FROM pri))
          |           * 10000 + 0.5) AS BIGINT) AS s4
          |       FROM tfc LEFT JOIN wt USING (token) JOIN lab l USING (doc_id)
          |       GROUP BY tfc.doc_id""".stripMargin, admit = "s4 > 0")}""".stripMargin,


    // One-pass multinomial NB: exact per-token class counts + the
    // add-1 log-odds on the 1e-4 grid (association matched to the
    // Spark expression tree — see sqlNbChain).
    "q_nb_train" ->
      s"""WITH $sqlNbChain
         |SELECT token, CAST(c1 AS BIGINT) AS c1, CAST(c0 AS BIGINT) AS c0,
         |       CAST(floor(w * 10000 + 0.5) AS BIGINT) AS w4
         |FROM wt""".stripMargin,


    // Per-doc NB log-odds + prior; `pred` derives from the quantized
    // score, never the raw double.
    // LEFT JOIN + the smoothed zero-count odds for unmatched tokens —
    // structurally the same total function as scoreLogOdds (today's
    // corpus has no OOV tokens, but the oracle must not silently rely
    // on that: a future holdout twin scoring unseen text would
    // otherwise diverge).
    "q_nb_score" ->
      s"""WITH $sqlNbChain,
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
         |FROM sc""".stripMargin,


    // Per-(doc, class) multiclass NB log-posteriors on the 1e-4 grid.
    "q_nb_classes" ->
      s"""WITH $sqlNbMcChain
         |SELECT doc_id, cls, score4 FROM mcsc""".stripMargin,


    // Serving through the persisted multiclass artifact must
    // reproduce q_nb_classes exactly (bit-exact double round-trip) —
    // the oracle is that replay verbatim.
    "q_nbmc_persist" ->
      s"""WITH $sqlNbMcChain
         |SELECT doc_id, cls, score4 FROM mcsc""".stripMargin,


    // Exact argmax over the quantized scores: integer comparison,
    // lowest class name on ties — bit-exact on both engines.
    "q_nb_predict" ->
      s"""WITH $sqlNbMcChain
         |SELECT doc_id, cls AS predicted FROM (
         |  SELECT doc_id, cls,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score4 DESC, cls) AS rn
         |  FROM mcsc) WHERE rn = 1""".stripMargin,


    // Serving through the persisted artifact must reproduce
    // q_nb_score exactly (bit-exact double round-trip through
    // parquet) — the oracle is that replay verbatim.
    "q_nb_persist" ->
      s"""WITH $sqlNbChain,
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
         |FROM sc""".stripMargin,


    // The leakage-free multiclass workflow end to end: split → train
    // the dense vocab×classes model on train docs only → score the
    // unseen test slice (real OOV) → exact-integer per-class
    // confusion counts from the quantized argmax.
    "q_nb_holdout" ->
      s"""WITH ${sqlNbMcChainFor(holdout = true)}
         |SELECT t.source AS actual, p.predicted,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT doc_id, cls AS predicted FROM (
         |        SELECT doc_id, cls,
         |               row_number() OVER (PARTITION BY doc_id
         |                 ORDER BY score4 DESC, cls) AS rn
         |        FROM mcsc) WHERE rn = 1) p
         |JOIN documents t ON t.doc_id = p.doc_id
         |GROUP BY 1, 2""".stripMargin,


    // Confusion at the 0.5 threshold + tie-corrected Mann-Whitney AUC
    // from integer rank sums over the quantized score (sqlEvalTail).
    "q_lr_eval" ->
      s"""$sqlLrChain,
         |${sqlEvalTail(
        """SELECT x.doc_id, max(x.y) AS y,
          |       CAST(floor((1.0/(1.0 + exp(-(sum(w.w * x.v)
          |         + (SELECT b FROM b8))))) * 10000 + 0.5) AS BIGINT) AS s4
          |     FROM x JOIN w8 w USING (pos) GROUP BY x.doc_id""".stripMargin)}""".stripMargin,


    // Ten reliability bins over the quantized score, exact integers
    // only; `//` replays Spark's integral div on nonnegative scores.
    "q_lr_calibration" ->
      s"""$sqlLrChain,
         |sc AS MATERIALIZED (SELECT x.doc_id, max(x.y) AS y,
         |       CAST(floor((1.0/(1.0 + exp(-(sum(w.w * x.v)
         |         + (SELECT b FROM b8))))) * 10000 + 0.5) AS BIGINT) AS s4
         |     FROM x JOIN w8 w USING (pos) GROUP BY x.doc_id)
         |SELECT CAST(least(s4 // 1000, 9) AS INTEGER) AS bin,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(y) AS BIGINT) AS pos,
         |       CAST(sum(s4) AS BIGINT) AS scoreSum
         |FROM sc GROUP BY 1""".stripMargin,


    // The leakage-free supervised workflow end to end: split → fit
    // standardizer on train → 8 GD iterations on train → score and
    // evaluate the UNSEEN test side (confusion + AUC, sqlEvalTail).
    "q_lr_holdout" ->
      s"""${sqlLrChainFor(holdout = true)},
         |${sqlEvalTail(
        """SELECT x.doc_id, max(x.y) AS y,
          |       CAST(floor((1.0/(1.0 + exp(-(sum(w.w * x.v)
          |         + (SELECT b FROM b8))))) * 10000 + 0.5) AS BIGINT) AS s4
          |     FROM x, spl, w8 w
          |     WHERE x.doc_id = spl.doc_id AND spl.split = 'test'
          |       AND x.pos = w.pos
          |     GROUP BY x.doc_id""".stripMargin)}""".stripMargin,


    "q_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |             unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |                                   for i in range(1, len(toks)-1)])) AS g
        |      FROM t WHERE len(toks) >= 3),
        |gm AS (SELECT doc_id, md5(g) AS g FROM g),
        |dfreq AS (SELECT g, count(*) AS df FROM gm GROUP BY 1),
        |per AS (SELECT doc_id, count(*) AS n_grams,
        |               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |        FROM gm JOIN dfreq USING (g) GROUP BY 1)
        |SELECT d.doc_id, coalesce(per.n_grams, 0) AS n_grams,
        |       coalesce(per.n_novel, 0) AS n_novel,
        |       CASE WHEN per.n_grams IS NOT NULL
        |            THEN CAST(per.n_novel AS DOUBLE) / CAST(per.n_grams AS DOUBLE) END AS novelty
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,


    "q_ann_recall" ->
      s"""WITH $sqlCents8,
         |$sqlProbes,
         |pc AS (
         |  SELECT vec_id AS probe_id, cid AS cell FROM (
         |    SELECT vec_id, cid,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d WHERE vec_id IN (SELECT probe_id FROM pr)) WHERE rn <= 2
         |),
         |isc AS (
         |  SELECT pc.probe_id, a.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM a JOIN pc ON a.cluster = pc.cell
         |  JOIN embeddings e ON e.vec_id = a.vec_id
         |  JOIN pr ON pr.probe_id = pc.probe_id
         |  WHERE a.vec_id != pc.probe_id
         |),
         |approx AS (SELECT probe_id, vec_id FROM (
         |  SELECT probe_id, vec_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM isc) WHERE rn <= 10),
         |esc AS (
         |  SELECT pr.probe_id, e.vec_id,
         |         ${sqlCosine("e.embedding::DOUBLE[]", "pr.pv")} AS sim
         |  FROM embeddings e CROSS JOIN pr WHERE e.vec_id != pr.probe_id
         |),
         |exact AS (SELECT probe_id, vec_id FROM (
         |  SELECT probe_id, vec_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM esc) WHERE rn <= 10),
         |hits AS (SELECT probe_id, count(*) AS n_hit
         |         FROM approx JOIN exact USING (probe_id, vec_id) GROUP BY 1)
         |SELECT x.probe_id, x.n_exact, coalesce(h.n_hit, 0) AS n_hit,
         |       CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(x.n_exact AS DOUBLE) AS recall
         |FROM (SELECT probe_id, count(*) AS n_exact FROM exact GROUP BY 1) x
         |LEFT JOIN hits h USING (probe_id)""".stripMargin,
  )
}
