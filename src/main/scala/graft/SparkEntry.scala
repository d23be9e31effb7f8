package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}

/** Document row for the MemoryStream micro-batch fixture of the
  * driver-gated streaming queries (top-level for encoder derivation). */
final case class StreamDoc(doc_id: Long, text: String, source: String)

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Oracle-parity rules used throughout (DuckDB hashes exact values):
  *  - integer outputs wherever possible (ids, clusters, counts, ranks);
  *  - money/2-decimal columns aggregated via the fixed-point trick
  *    `sum(round(x*100))/100.0` — the rounded terms are integer-valued
  *    doubles, so the sum is EXACT and independent of partial-agg
  *    order on both engines (doubles hold integers exactly to 2^53);
  *  - genuinely noisy FP aggregates (means of random floats) rounded
  *    to 4 decimals on both sides;
  *  - every computed column aliased identically in Spark and SQL
  *    (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  import KMeans.{FirstK, ExplicitIds}

  /** Flagship: K-Means fit (k=8, 5 Lloyd iterations) on the sf0.001
    * embeddings, returning per-cluster sizes. Exercises scan, parse,
    * broadcast-argmin assignment, partial-agg mean, iterative driver
    * (SURVEY §2 ops 1-11). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables(spark, dir, "embeddings")
    val model = KMeans.fit(emb, "vec_id", "embedding", FirstK(8), maxIter = 5)
    KMeans.assign(emb, "embedding", model.centroids)
      .groupBy("cluster").agg(count(lit(1)).as("n"))
  }

  /** Shared fixed-centroid set for the oracle-checked K-Means queries:
    * the 8 lowest-vec_id embedding rows, renumbered 1..8 (FirstK). */
  private def cents8(s: SparkSession, dir: String): KMeans.Centroids =
    KMeans.initCentroids(Tables(s, dir, "embeddings"), "vec_id", "embedding", FirstK(8))

  /** Shared md5-parity near-dup pair chain (n=3, h=16, b=8,
    * minSim=0.5) — the edge source the graph family and the
    * split-leakage queries all open with. Memoized per (session,
    * sfDir) and eagerly persisted OUTSIDE Dedup's releaseCaches
    * lifecycle: Bench warms it once outside the timed region
    * (VERDICT r8 item 3) so per-query seconds report the graph
    * operator under test, not a repeated identical ~2-3 s MinHash
    * rebuild of the same relation. Verify shares the memo — same
    * relation, computed once. Correctness is untouched: this IS the
    * chain each query previously inlined, evaluated once. If blocks
    * were ever evicted (not at these sizes — the pair table is tiny)
    * the lineage recomputes the chain from parquet, still correct. */
  private val sharedPairsMemo =
    scala.collection.mutable.Map.empty[String, DataFrame]
  private def nearDupPairs05(s: SparkSession, dir: String): DataFrame = synchronized {
    sharedPairsMemo.getOrElseUpdate(s"${System.identityHashCode(s)}:$dir", {
      val p = Dedup.nearDuplicates(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.5, parity = true).persist()
      p.count() // materialize eagerly so no query absorbs the build
      Dedup.releaseCaches() // the chain's internals; the fixture stays
      p
    })
  }

  /** Trained BPE merge rules (6 rounds over documents.text) — shared
    * by q_bpe_encode / q_bpe_compression. Training is a vocab-sized
    * driver loop both queries used to replay INSIDE the timed region
    * (VERDICT r9 item 4 — the same conflation the graph family fixed
    * with the pair fixture), so the encode benchmarks measured mostly
    * training. The memo holds the 6 collected merge pairs — driver-
    * side metadata, not a plan — so warming costs one training run. */
  private val bpeMergesMemo =
    scala.collection.mutable.Map.empty[String, Seq[(String, String)]]
  private def bpeMerges6(s: SparkSession, dir: String): Seq[(String, String)] = synchronized {
    bpeMergesMemo.getOrElseUpdate(s"${System.identityHashCode(s)}:$dir", {
      Tokenizer.bpeTrain(Tables(s, dir, "documents"), "text", merges = 6).collect()
        .sortBy(_.getLong(0))
        .map(r => { val Array(l, rr) = r.getString(1).split(" ", 2); (l, rr) })
        .toSeq
    })
  }

  /** Queries that open with a shared warmable fixture — Bench warms
    * the relevant ones outside the timed region iff selected. */
  private val pairFixtureQueries: Set[String] = Set(
    "q_components", "q_components_star", "q_pagerank", "q_degree_hist",
    "q_triangles", "q_kcore", "q_assortativity", "q_label_prop",
    "q_leakage", "q_split_clean", "q_bfs_dist", "q_sssp",
    "q_ppr", "q_comp_sizes", "q_closeness")
  private val bpeFixtureQueries: Set[String] = Set(
    "q_bpe_encode", "q_bpe_compression")
  val sharedFixtureQueries: Set[String] = pairFixtureQueries ++ bpeFixtureQueries

  def warmSharedFixtures(s: SparkSession, dir: String,
                         selected: Set[String] = sharedFixtureQueries): Unit = {
    if (selected.exists(pairFixtureQueries)) { nearDupPairs05(s, dir); () }
    if (selected.exists(bpeFixtureQueries)) { bpeMerges6(s, dir); () }
  }

  /** Unique memory-sink names for the streaming queries (a query
    * function may run more than once per session — Bench reps). */
  private val streamSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** DuckDB CTEs mirroring cents8 + one assignment pass. */
  private val sqlCents8 =
    """c AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
      |         embedding::DOUBLE[] AS cvec
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
      |),
      |d AS (
      |  SELECT e.vec_id, c.cid,
      |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cvec),
      |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
      |  FROM embeddings e CROSS JOIN c
      |),
      |a AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |    FROM d) WHERE rn = 1
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── op 1-2: scan + parse/project (SURVEY §2.1-2) ────────────────
    "q_scan_project" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), size(col("embedding")).as("dims"))
    }),

    // ── op 1-2 on the REFERENCE'S OWN FORMAT: gene TSV reader ───────
    // Reads /root/reference/data/new_dataset_1.txt (Iris) — the
    // reference's actual input path (KMeans.java:79-96). Features
    // emitted as 4 scalar double columns for exact oracle compare.
    "q_gene_parse" -> ((s, _) => {
      val g = GeneIO.readGenes(s, "/root/reference/data/new_dataset_1.txt")
      g.select(col("id"), col("label"),
        element_at(col("features"), 1).as("f1"),
        element_at(col("features"), 2).as("f2"),
        element_at(col("features"), 3).as("f3"),
        element_at(col("features"), 4).as("f4"))
    }),

    // ── op 12: explicit-id init, renumbered 1..k (KMeans.java:597-606)
    "q_kmeans_init" -> ((s, dir) => {
      val cents = KMeans.initCentroids(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", ExplicitIds(Seq(42L, 7L, 19L)))
      val ids = Map(1 -> 42L, 2 -> 7L, 3 -> 19L)
      import s.implicits._
      cents.toSeq.map { case (cid, v) => (cid, ids(cid), v.head) }
        .toDF("cluster", "vec_id", "f1")
    }),

    // ── op 12+: k-means++ D²-weighted seeding (3 rounds, seed 42) ───
    // The md5-uniform exponential race is deterministic, so the
    // chosen seed VECTORS are oracle-checkable bit-for-bit.
    "q_kmeans_pp" -> ((s, dir) => {
      val cents = KMeans.initCentroids(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", KMeans.PlusPlus(3, seed = 42L))
      import s.implicits._
      cents.toSeq.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, i) => (cid, i + 1, x) }
      }.toDF("cluster", "pos", "val")
    }),

    // ── op 3-5: broadcast centroids + distance + argmin assignment ──
    "q_kmeans_assign" -> ((s, dir) => {
      KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
        .select(col("vec_id"), col("cluster"))
    }),

    // ── op 6-8: shuffle + partial agg + group-mean, posexplode form ─
    // FP-determinism contract: a distributed `avg` is partial-agg-order
    // dependent in the last ulp, so its hash is flaky vs DuckDB
    // (CORRECTNESS_r01). Instead both engines fold the group's values
    // in SORTED order with a sequential left fold (Spark `aggregate`
    // HOF; DuckDB `list_reduce`), which is bit-deterministic — so no
    // rounding is needed at all. This is the oracle-expressible form;
    // the engine's scale path is VectorMeanAgg (O(k·d·tasks) shuffle).
    "q_centroid_update" -> ((s, dir) => {
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
      assigned
        .select(col("cluster"),
          posexplode(VectorOps.toDouble(col("embedding"))).as(Seq("pos0", "v")))
        .select(col("cluster"), (col("pos0") + 1).cast("int").as("pos"), col("v"))
        .groupBy("cluster", "pos")
        .agg(collect_list(col("v")).as("vs"))
        .select(col("cluster"), col("pos"),
          (VectorOps.foldSum(array_sort(col("vs"))) / size(col("vs"))).as("val"))
    }),

    // ── op 15-adjacent: WCSS/SSE cost of a centroid set ─────────────
    // Same sorted-fold determinism contract as q_centroid_update.
    "q_kmeans_cost" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      emb.select(KMeans.minSqDistColumn(cents8(s, dir),
          VectorOps.toDouble(col("embedding"))).as("m"))
        .agg(collect_list(col("m")).as("ms"))
        .select(VectorOps.foldSum(array_sort(col("ms"))).as("cost"),
          size(col("ms")).cast("long").as("n"))
    }),

    // ── op 15: Jaccard coefficient vs ground truth ──────────────────
    // The reference's headline metric (KMeans.java:623-665), computed
    // from the (truth, pred) contingency table in one O(n) shuffle
    // instead of the reference's n×n driver matrices.
    "q_jaccard" -> ((s, dir) => {
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
      ClusterMetrics.jaccard(assigned, "label", "cluster")
    }),

    // ── op 15 family: Rand index (same contingency table as Jaccard) ─
    "q_rand_index" -> ((s, dir) => {
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
      ClusterMetrics.randIndex(assigned, "label", "cluster")
    }),

    // ── op 15 family: cluster purity ────────────────────────────────
    "q_purity" -> ((s, dir) => {
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
      ClusterMetrics.purity(assigned, "label", "cluster")
    }),

    // ── op 15 family: simplified (centroid-based) silhouette ────────
    "q_silhouette" -> ((s, dir) => {
      val cents = cents8(s, dir)
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents)
      ClusterMetrics.simplifiedSilhouette(assigned, "embedding", cents, sortedFold = true)
    }),

    // ── extension: Calinski-Harabasz variance-ratio criterion ───────
    "q_calinski" -> ((s, dir) => {
      val cents = cents8(s, dir)
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents)
      ClusterMetrics.calinskiHarabasz(assigned, "embedding", cents, sortedFold = true)
    }),

    // ── op 10-11: iterative driver loop, 2 Lloyd steps from FirstK(8)
    // The loop's oracle gate: both engines run assign→mean twice with
    // the sorted-fold determinism contract, so the step-2 centroids
    // are bit-exact. (The scale path is fit()/VectorMeanAgg, golden-
    // tested on Iris in KMeansSpec.)
    "q_kmeans_fit2" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val c1 = KMeans.stepSortedFold(emb, "embedding", cents8(s, dir))
      val c2 = KMeans.stepSortedFold(emb, "embedding", c1)
      import s.implicits._
      c2.toSeq.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, i) => (cid, i + 1, x) }
      }.toDF("cluster", "pos", "val")
    }),

    // ── op 11 + 16: convergence predicate + telemetry ───────────────
    // (iterations run, surviving cluster count, converged flag) after
    // the same 2-step parity loop — the reference's printed job count
    // and checkSimilar verdict (KMeans.java:283,291-310).
    "q_kmeans_fit_meta" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val c1 = KMeans.stepSortedFold(emb, "embedding", cents8(s, dir))
      val c2 = KMeans.stepSortedFold(emb, "embedding", c1)
      import s.implicits._
      Seq((2, c2.length, KMeans.isConverged(c1, c2, 0.0)))
        .toDF("iterations", "n_clusters", "converged")
    }),

    // ── op 13: membership id-list per cluster (KMeans.java:471) ─────
    "q_membership" -> ((s, dir) => {
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents8(s, dir))
      KMeans.membershipLists(assigned, "vec_id")
        .select(col("cluster"), col("n"),
          array_join(col("member_ids"), ",").as("members"))
    }),

    // ── op 9+14: centroid interchange-format sink, ORACLE-gated ─────
    // Renders GeneIO.centroidLines — the reference's on-disk centroid
    // byte format (KMeans.java:516-526: cid\tv1..vd\tid1|id2|…|\t-n) —
    // over a FirstK(4) clustering of exact INTEGER-VALUED features
    // (n_chars, token count), so every vector component formats
    // identically in both engines ("157.0") and the byte format is
    // hash-gated, not just spec-gated (VERDICT r10 item 4). One row
    // per centroid line.
    "q_centroid_format" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(
        col("doc_id"),
        array(col("n_chars").cast("double"),
          size(split(col("text"), " ")).cast("double")).as("fv"))
      val cents = KMeans.initCentroids(docs, "doc_id", "fv", FirstK(4))
      val assigned = KMeans.assign(docs, "fv", cents)
      val memb = GeneIO.membership(assigned, "doc_id", "cluster")
      import s.implicits._
      GeneIO.centroidLines(cents, memb).toDF("line")
    }),

    // ── op 12: k-means‖ init (Bahmani VLDB'12), driver rows-gate ────
    // The oversampling coin compares an md5 unit against l·d²/cost
    // where cost is a DISTRIBUTED FP sum — partial-agg order makes the
    // acceptance set non-replayable in SQL (documented; KMeansSpec
    // pins the full candidate sequence bit-for-bit at fixed local
    // partitioning). This row puts the final chosen k centroids under
    // the driver's rows-only check so the §2 sub-feature has a gate
    // row at all (VERDICT r10 item 6). No oracleSql by design.
    "q_kmeans_parallel" -> ((s, dir) => {
      val cents = KMeans.initCentroids(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", KMeans.Parallel(4, seed = 42L, rounds = 3))
      import s.implicits._
      cents.toSeq.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, i) => (cid, i + 1, x) }
      }.toDF("cluster", "pos", "val")
    }),

    // ── op 17: PCA — the distributed covariance stage ───────────────
    // (i, j, cov) upper triangle via the sorted-fold parity twin; the
    // scale path is PCA.moments (one GramAgg pass), equality pinned in
    // PCASpec. The driver-side eig + projection are spec-covered —
    // eigendecomposition is not SQL-expressible.
    "q_pca_cov" -> ((s, dir) => {
      PCA.covarianceSortedFold(Tables(s, dir, "embeddings"), "embedding")
    }),

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
    "q_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val docs = Tables(s, dir, "documents")
      val index = Dedup.exactIndex(docs.filter(col("doc_id") % 4 =!= 0), Seq("text"))
      val arrivals = docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
        .as[StreamDoc].collect().sortBy(_.doc_id)
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
    "q_stream_window" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("ts").cast("long"), col("event_type"))
        .as[(Long, String)].collect().sortBy(_._1)
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
    "q_stream_neardup" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
        .as[StreamDoc].collect().sortBy(_.doc_id)
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
    "q_stream_hop" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("ts").cast("long"), col("event_type"))
        .as[(Long, String)].collect().sortBy(_._1)
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
    "q_stream_cap" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
        .as[StreamDoc].collect().sortBy(_.doc_id)
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

    // ── streaming: stream-stream attribution join, driver-gated ─────
    // The last streaming topology under the hash gate: BOTH sides
    // unbounded (clicks ⋈ purchases on user + a 5-minute event-time
    // band), watermark-bounded buffer state on each. Inner-join
    // append emits pairs as both sides arrive; feeding the two
    // time-sorted feeds in aligned chunks means every match is
    // present by the final batch — the pair set equals the batch
    // range join, which is the oracle.
    "q_stream_join" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("event_id").cast("long"), col("ts").cast("long"),
          col("user_id").cast("long"), col("event_type"))
        .as[(Long, Long, Long, String)].collect().sortBy(_._2)
      val clicks = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
      val purchases = ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
      val nb = 3
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
    "q_stream_totals" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("event_id").cast("long"), col("user_id").cast("long"), col("value"))
        .as[(Long, Long, Double)].collect().sortBy(_._1)
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
    "q_stream_wau" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("ts").cast("long"), col("user_id").cast("long"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val perBatch = math.max(1, (ev.length + 2) / 3)
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
    "q_stream_dedup_wm" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("event_id").cast("long"), col("ts").cast("long"), col("event_type"))
        .as[(Long, Long, String)].collect().sortBy(_._2)
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
    "q_stream_session" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("ts").cast("long"), col("user_id").cast("long"))
        .as[(Long, Long)].collect().sortBy(_._1)
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
    "q_stream_kmv" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val arrivals = Tables(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
        .as[StreamDoc].collect().sortBy(_.doc_id)
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

    // ── LLM-pipeline: per-document text statistics ──────────────────
    "q_text_stats" -> ((s, dir) => {
      TextAnalysis.docStats(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── LLM-pipeline: quality scoring (C4/Gopher-style ratios) ──────
    "q_quality" -> ((s, dir) => {
      TextAnalysis.qualityScore(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── LLM-pipeline: Gopher-style n-gram repetition metrics ────────
    "q_rep_ngrams" -> ((s, dir) => {
      TextAnalysis.repetitionStats(Tables(s, dir, "documents"), "doc_id", "text", n = 2)
    }),

    // ── LLM-pipeline: longest identical-token run per doc ───────────
    "q_rep_runs" -> ((s, dir) => {
      TextAnalysis.maxTokenRun(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── LLM-pipeline: PII scrubbing (URLs, emails, phone runs) ──────
    // The synthetic corpus carries no PII, so the query plants one of
    // each per doc (derived from doc_id, identically in the oracle)
    // and checks both the redacted text and the audit counts.
    "q_scrub" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.com/d/"), col("doc_id"),
          lit(" tel 555-0100-"), col("doc_id")).as("text"))
      TextAnalysis.scrubPii(aug, "doc_id", "text")
    }),

    // ── LLM-pipeline: markup stripping (C4-style extract pass) ──────
    // The corpus is plain text, so the query wraps each doc in tags +
    // entities (identically in the oracle) and checks the extraction.
    "q_strip_markup" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("<html><body class=\"d\"><p>"), substring(col("text"), 1, 60),
          lit("</p><br/>&amp;co &lt;tag&gt; "),
          substring(col("text"), 61, 1000000), lit("</body></html>")).as("text"))
      TextAnalysis.stripMarkup(aug, "doc_id", "text")
    }),

    // ── LLM-pipeline: token-budget truncation ───────────────────────
    "q_truncate" -> ((s, dir) => {
      TextAnalysis.truncateTokens(Tables(s, dir, "documents"), "doc_id", "text",
        maxTokens = 30)
    }),

    // ── LLM-pipeline: sentence segmentation ─────────────────────────
    // The synthetic corpus carries no punctuation, so the query
    // plants two sentence boundaries per doc (identically in the
    // oracle) and checks ids, order, retained punctuation, counts.
    "q_sentences" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(substring(col("text"), 1, 50), lit(". "),
          substring(col("text"), 51, 50), lit("! "),
          substring(col("text"), 101, 1000000)).as("text"))
      TextAnalysis.splitSentences(aug, "doc_id", "text")
    }),

    // ── LLM-pipeline: corpus top-20 terms by frequency ──────────────
    "q_top_terms" -> ((s, dir) => {
      TextAnalysis.topTerms(Tables(s, dir, "documents"), "text", 20)
    }),

    // ── LLM-pipeline: full-vocabulary build (term → contiguous id) ──
    // Ranks EVERY distinct term by (count desc, term asc) through the
    // range-partition + offset globalRank — no single-partition sort.
    "q_vocab" -> ((s, dir) => {
      TextAnalysis.buildVocab(Tables(s, dir, "documents"), "text")
    }),

    // ── LLM-pipeline: sliding-window chunking by token budget ───────
    // 32-token chunks, 8-token overlap (stride 24); docs ≤ 32 tokens
    // stay one chunk. Rowwise generator, no shuffle.
    "q_chunks" -> ((s, dir) => {
      TextAnalysis.chunkByTokens(Tables(s, dir, "documents"), "doc_id", "text",
        maxTokens = 32, overlap = 8)
    }),

    // ── LLM-pipeline: text normalization (ctrl chars, space runs) ───
    // The synthetic corpus is already clean ASCII, so the query dirties
    // each doc first (derived from doc_id, identically in the oracle):
    // a tab, double spaces, stray case, padding — then normalizes.
    "q_normalize" -> ((s, dir) => {
      val dirty = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("  Start\t"), col("text"),
          lit(" MID  dash "), col("doc_id"), lit("  ")).as("text"))
      TextAnalysis.normalizeText(dirty, "doc_id", "text")
    }),

    // ── LLM-pipeline: OOV rate vs the corpus top-10 vocabulary ──────
    // Vocabulary broadcast; corpus exploded and joined map-side, then
    // partial-aggregated back to one row per document.
    "q_oov" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val top10 = TextAnalysis.buildVocab(docs, "text").filter(col("vocab_id") <= 10)
      TextAnalysis.oovRate(docs, "doc_id", "text", top10)
    }),

    // ── LLM-pipeline: passage-level exact dedup (C4-style spans) ────
    // 8-token passages; first corpus-wide occurrence wins (partial
    // MIN agg on an integer encoding — no window on the passage key).
    "q_passage_dedup" -> ((s, dir) => {
      Dedup.dedupPassages(Tables(s, dir, "documents"), "doc_id", "text", width = 8)
    }),

    // ── LLM-pipeline: (doc, term) TF + corpus DF (TF-IDF core) ──────
    "q_term_freq" -> ((s, dir) => {
      TextAnalysis.termFrequencies(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── LLM-pipeline: stopword-profile language ID ──────────────────
    "q_lang_id" -> ((s, dir) => {
      TextAnalysis.languageId(Tables(s, dir, "documents"), "doc_id", "text", LangProfiles)
    }),

    // ── LLM-pipeline: char-trigram language ID (n-gram heuristic) ───
    "q_lang_ngram" -> ((s, dir) => {
      TextAnalysis.languageIdNgram(Tables(s, dir, "documents"), "doc_id", "text",
        NgramProfiles)
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

    // ── events: daily cohort retention triangle ─────────────────────
    "q_cohorts" -> ((s, dir) => {
      Events.cohortRetention(Tables(s, dir, "events"), "user_id", "ts")
    }),

    // ── events: rolling 7-day active users (WAU per day) ────────────
    "q_active_users" -> ((s, dir) => {
      Events.rollingActiveUsers(Tables(s, dir, "events"), "user_id", "ts",
        widthSeconds = 86400L, windowPeriods = 7)
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

    // ── text: chi-square bigram collocations (MWE mining) ───────────
    // The significance twin of q_collocations' PMI lift: log-free
    // statistic — integer contingency + a fixed IEEE op sequence
    // (PMI-log/LLR's ln would break cross-engine parity).
    "q_chi2_collocations" -> ((s, dir) => {
      TextAnalysis.chiSquareCollocations(Tables(s, dir, "documents"), "text",
        minCount = 5L, topK = 50)
    }),

    // ── text: vocabulary-budget coverage curve (coverage@k) ─────────
    // Exact-integer Zipf-head audit: rank via the range-exchange
    // globalRank, one conditional agg for every k at once.
    "q_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(Tables(s, dir, "documents"), "text",
        ks = Seq(100, 1000, 10000))
    }),

    // ── curation: snapshot token-distribution drift (exact TVD) ─────
    // v1 = doc_id%2==0 slice, v2 = the rest — the refresh-monitoring
    // number in exact integer arithmetic (one division at the end).
    "q_corpus_drift" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.corpusDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "text")
    }),

    // ── curation: the drift's top movers (exact integer ranking) ────
    "q_drift_terms" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.corpusDriftTerms(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "text", k = 20)
    }),

    // ── curation: robust per-source outlier gate (median ± 2·MAD) ───
    "q_mad_gate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      Curation.madOutlierGate(docs, "source", "doc_id", "n_tokens", nMads = 2.0)
        .select(col("doc_id"), col("source"), col("n_tokens"))
    }),

    // ── curation: exact fixed-width length histogram ────────────────
    "q_histogram" -> ((s, dir) => {
      Curation.histogram(Tables(s, dir, "documents"), "n_chars", buckets = 10)
    }),

    // ── curation: per-source length-distribution profile ────────────
    "q_source_profile" -> ((s, dir) => {
      Curation.sourceProfile(Tables(s, dir, "documents"), "source", "doc_id", "text")
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

    // ── curation: best document per (source, lang) — argmax keep ────
    // max_by partial aggregate (one candidate per key per task), not
    // a ranking window; longest doc wins, lowest doc_id breaks ties.
    "q_keep_best" -> ((s, dir) => {
      Curation.keepBestPerKey(Tables(s, dir, "documents"),
        Seq("source", "lang"), "n_chars", "doc_id")
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

    // ── curation: distribution drift between corpus versions ────────
    // Mix-shift audit over `source` between the corpus and a version
    // with doc_id%3=0 removed — per-key counts, fractions, |Δfrac|.
    "q_drift" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.distributionDrift(docs, docs.filter(col("doc_id") % 3 =!= 0), "source")
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

    // ── dedup: the DROP operator (keep lowest id per content) ───────
    "q_dedup_kept" -> ((s, dir) => {
      Dedup.dropExactDuplicates(Tables(s, dir, "documents"), "doc_id", Seq("text"))
        .select(col("doc_id"))
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

    // ── multimodal: binary payload ingest + typed metadata ──────────
    // The payload is the text's UTF-8 bytes standing in for media
    // bytes; the schema/plumbing (opaque binary + struct metadata,
    // payload column prunable) is the real 100 TB path.
    "q_mm_meta" -> ((s, dir) => {
      mmTable(s, dir).select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.n_bytes").as("n_bytes"))
    }),

    // ── multimodal: stubbed decode → pixel statistics ───────────────
    // (hex-pair byte arithmetic — the deterministic fake decode; the
    // mapPartitions batch path is pinned equal in MultimodalSpec)
    "q_mm_stats" -> ((s, dir) => {
      Multimodal.pixelStats(mmTable(s, dir), "doc_id", "content")
    }),

    // ── multimodal: fixed-size frame sampling over the binary column
    "q_mm_frames" -> ((s, dir) => {
      Multimodal.frameSample(mmTable(s, dir), "doc_id", "content", frameBytes = 256)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          md5(hex(col("frame"))).as("frame_md5"))
    }),

    // ── multimodal: deterministic feature extraction → embedding ────
    "q_mm_embed" -> ((s, dir) => {
      Multimodal.featureExtract(mmTable(s, dir), "doc_id", "content", d = 8)
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("d0", "v")))
        .select(col("doc_id"), (col("d0") + 1).cast("int").as("dim"), col("v"))
    }),

    // ── multimodal: perceptual dHash image near-dup ─────────────────
    // The image twin of q_simhash_neardup: 64-bit gradient hash per
    // payload, banded-Hamming candidates, exact verify ≤ 3 bits.
    // Every doc's first 144 bytes become a fixed-size "image"; docs
    // with doc_id%10=0 also plant a variant copy with the first byte
    // flipped — a single-pixel edit the gradient hash must land
    // within a few bits of (re-encode/edit robustness, which raw
    // byte hashing cannot express). Mirrored in the oracle.
    "q_image_neardup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), substring(col("text"), 1, 144).as("img"))
      val variants = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("x"), substring(substring(col("text"), 1, 144), 2, 143)).as("img"))
      val payloads = Multimodal.withContent(base.unionByName(variants), "doc_id", "img")
      Multimodal.imageNearDup(payloads, "doc_id", "content",
        maxHamming = 3, maxBucket = 100)
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

    // ── events: per-type daily activity trend (exact OLS) ───────────
    // Slope + intercept of count-per-day vs the epoch-day index; five
    // exact long moments, decimal(38) normal equations, one double
    // division per output.
    "q_trend" -> ((s, dir) => {
      Events.dailyTrend(Tables(s, dir, "events"))
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
    "q_cume_dist" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
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

    // ── streaming: funnel state machine, batch-parity gated ─────────
    // Per-user furthest-step state folded across 3 micro-batches; the
    // sink's final steps aggregate to counts that must equal the
    // BATCH funnel exactly (the oracle is q_funnel's SQL verbatim).
    "q_stream_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val steps = Seq("view", "click", "purchase")
      val ev = Tables(s, dir, "events")
        .select(col("user_id").cast("long"), col("event_id").cast("long"),
          col("ts").cast("long"), col("event_type"))
        .as[(Long, Long, Long, String)].collect()
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
    "q_stream_scd" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val ev = Tables(s, dir, "events")
        .select(col("event_id").cast("long"), col("ts").cast("long"),
          col("user_id").cast("long"), col("event_type"))
        .as[(Long, Long, Long, String)].collect()
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

    // ── events: Kaplan-Meier time-to-conversion survival curve ──────
    // Exact-arithmetic KM estimator over day-grain durations; users
    // who never purchase are censored at the corpus horizon, not
    // dropped. All folds run on the ≤ maxDays day table, never the
    // corpus.
    "q_survival" -> ((s, dir) => {
      Events.kaplanMeier(Tables(s, dir, "events"), convType = "purchase")
    }),

    // ── events: SCD Type-2 validity intervals per user ──────────────
    // The warehouse dimension shape for point-in-time joins: one row
    // per run of consecutive identical event types, half-open µs
    // intervals, NULL valid_to on the current run.
    "q_scd2" -> ((s, dir) => {
      Events.scd2Intervals(Tables(s, dir, "events"))
    }),

    // ── events: L28 engagement-depth histogram ──────────────────────
    // Distinct active days per user in the trailing 28-day window
    // anchored at the corpus' last active day, histogrammed.
    "q_engagement" -> ((s, dir) => {
      Events.engagementHistogram(Tables(s, dir, "events"), windowDays = 28)
    }),

    // ── graph: multi-source BFS hop distance ────────────────────────
    // Seeds = every near-dup-graph node with doc id ≡ 0 (mod 7);
    // dist = min hops from any seed, capped at 4. Level-synchronous
    // frontier BFS — per hop one frontier×edges join + anti vs the
    // visited set, never the whole graph; the oracle replays it as a
    // bounded recursive CTE with min(d) per node.
    "q_bfs_dist" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      val nodes = pairs.select(col("id1").as("id"))
        .union(pairs.select(col("id2").as("id"))).distinct()
      val seeds = nodes.filter(col("id") % 7 === 0)
      Graph.bfsDistance(edges, seeds, "id", maxHops = 4)
    }),

    // ── graph: landmark closeness centrality (5-seed panel) ─────────
    // Per-seed BFS distances carried through the frontier; closeness
    // = n_reached / sum_dist, one division of exact longs.
    "q_closeness" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      val nodes = pairs.select(col("id1").as("id"))
        .union(pairs.select(col("id2").as("id"))).distinct()
      Graph.closenessBounded(edges, nodes.orderBy("id").limit(5), "id", maxHops = 4)
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

    // ── graph: hop-bounded weighted shortest paths ──────────────────
    // Same seeds as q_bfs_dist but edges weighted by dissimilarity
    // (round((1-sim)·1000)+1 — exact longs), maxHops=4 Bellman-Ford
    // rounds; the oracle enumerates ≤4-hop paths recursively and
    // takes min(cost). dist(v) = cheapest ≤4-edge path from any seed.
    "q_sssp" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select(col("id1"), col("id2"),
        (round((lit(1.0) - col("sim")) * 1000).cast("long") + 1L).as("w"))
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"), col("w"))
      val nodes = pairs.select(col("id1").as("id"))
        .union(pairs.select(col("id2").as("id"))).distinct()
      val seeds = nodes.filter(col("id") % 7 === 0)
      Graph.ssspBounded(edges, seeds, "id", maxHops = 4)
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

    // ── graph: connected components via large-star/small-star ───────
    // Same output contract as q_components (min-id label per node),
    // run against the IDENTICAL oracle SQL — the O(log²) alternation
    // path for graphs whose diameter would stall min-label
    // propagation.
    "q_components_star" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Dedup.componentsStar(pairs)
    }),

    // ── graph: PageRank (3 fixed rounds) on the near-dup graph ──────
    // Rank = how centrally a doc sits in its duplicate neighborhood;
    // sorted-fold contributions for the bit-exact gate.
    "q_pagerank" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.pageRank(pairs, "id1", "id2", iters = 3, damping = 0.85,
        undirected = true, sortedFold = true)
    }),

    // ── graph: semi-supervised label completion over near-dups ──────
    // Docs with id ≡ 0 (mod 3) keep their lang as clamped seeds; the
    // rest inherit the neighborhood mode over 2 rounds — metadata
    // in-fill on the premise that near-duplicates share it. Nodes
    // that never see a labeled neighbor stay NULL (visibly
    // un-inferred).
    "q_label_complete" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      val seeds = Tables(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0).select(col("doc_id"), col("lang"))
      Graph.labelComplete(pairs, "id1", "id2", seeds, "doc_id", "lang", rounds = 2)
    }),

    // ── graph: HITS hubs & authorities on the purchase bipartite ────
    // Directed customer→part edges from orders ⋈ lineitem (ids
    // remapped to disjoint ranges: cust·2, part·2+1); 2 mutual-
    // reinforcement rounds, unnormalized (rank-invariant), sorted-fold
    // parity like q_pagerank.
    "q_hits" -> ((s, dir) => {
      val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      Graph.hits(e, "src", "dst", iters = 2, sortedFold = true)
    }),

    // ── graph: degree histogram of the near-dup graph ───────────────
    "q_degree_hist" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.degreeHistogram(pairs, "id1", "id2")
    }),

    // ── graph: per-vertex triangles + clustering coefficient ────────
    // Degree-oriented wedge counting (Suri & Vassilvitskii WWW'11)
    // over the near-dup graph — near-dup clusters are clique-ish, so
    // triangles exist and the gate is non-vacuous.
    "q_triangles" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.triangleCounts(pairs, "id1", "id2")
    }),

    // ── graph: personalized PageRank from the 5 lowest node ids ─────
    // Teleport restricted to the seed set (Haveliwala'02) — proximity
    // mass, not global centrality; sortedFold for the bit-exact gate.
    "q_ppr" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      val nodes = pairs.select(col("id1").as("id"))
        .union(pairs.select(col("id2").as("id"))).distinct()
      Graph.personalizedPageRank(pairs, nodes.orderBy("id").limit(5), "id",
        "id1", "id2", iters = 3, sortedFold = true)
    }),

    // ── graph: duplicate-cluster size histogram ─────────────────────
    // The "how big are my dup clusters" curation summary: component
    // sizes, then components per size — two tiny aggs on q_components.
    "q_comp_sizes" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Dedup.connectedComponents(pairs)
        .groupBy("component").agg(count(lit(1)).cast("long").as("size"))
        .groupBy("size").agg(count(lit(1)).cast("long").as("n_components"))
    }),

    // ── graph: 2-core of the near-dup graph (bounded peeling) ───────
    // 3 peel rounds, matching the oracle's unroll; the graph's
    // triangles guarantee a non-empty core.
    "q_kcore" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.kCore(pairs, "id1", "id2", k = 2, rounds = 3)
    }),

    // ── graph: degree assortativity of the near-dup graph ───────────
    "q_assortativity" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.assortativity(pairs, "id1", "id2")
    }),

    // ── events: item co-occurrence (users who did A also did B) ─────
    "q_cooccur" -> ((s, dir) => {
      Events.coOccurrence(Tables(s, dir, "events"), "user_id", "event_type",
        minUsers = 2)
    }),

    // ── events: first-order Markov transition profile ───────────────
    "q_transitions" -> ((s, dir) => {
      Events.eventTransitions(Tables(s, dir, "events"))
    }),

    // ── graph: common-neighbor link prediction on the winnow graph ──
    // Edge source = winnow fingerprint-sharing pairs (the q_winnow_
    // pairs relation), NOT the minhash near-dup graph: verified
    // near-dup clusters are cliques by construction (every pair over
    // the sim threshold IS an edge), so they have no non-adjacent
    // pairs with common neighbors and the gate was vacuous (ADVICE
    // r8: 0 rows both sides). Fingerprint co-occurrence is not
    // transitive, so this graph has genuine open wedges — 18k+
    // scored candidate rows at the sf0.01 gate.
    "q_link_pred" -> ((s, dir) => {
      val pairs = Dedup.winnowNearDup(Tables(s, dir, "documents"), "doc_id", "text",
        k = 5, w = 4, minShared = 10, maxDocsPerFp = 100).select("id1", "id2")
      Graph.commonNeighbors(pairs, "id1", "id2", minCommon = 1L)
    }),

    // ── events: trailing 7-day rolling activity per user ────────────
    "q_rolling" -> ((s, dir) => {
      Events.rollingDaily(Tables(s, dir, "events"), windowDays = 7)
    }),

    // ── events: dense daily grid with zero-filled silent days ───────
    "q_gap_fill" -> ((s, dir) => {
      Events.gapFillDaily(Tables(s, dir, "events"))
    }),

    // ── curation: k-anonymity audit on generalized quasi-identifiers ─
    "q_kanon" -> ((s, dir) => {
      val quasi = Tables(s, dir, "customer").select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      Curation.kAnonymityAudit(quasi,
        Seq("c_nationkey", "c_mktsegment", "bal_bucket"), k = 5L)
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

    // ── clustering metric: Davies-Bouldin index ─────────────────────
    "q_davies_bouldin" -> ((s, dir) => {
      val cents = cents8(s, dir)
      val assigned = KMeans.assign(Tables(s, dir, "embeddings"), "embedding", cents)
      ClusterMetrics.daviesBouldin(assigned, "embedding", cents, sortedFold = true)
    }),

    // ── retrieval: BM25 of every doc vs a fixed probe query ─────────
    // Rational idf (log-free) in the gate; see bm25Score's docstring.
    "q_bm25" -> ((s, dir) => {
      TextAnalysis.bm25Score(Tables(s, dir, "documents"), "doc_id", "text",
        terms = Seq("table", "spark", "value"))
    }),

    // ── retrieval: multi-query BM25 top-k search ────────────────────
    // Three probe queries ranked corpus-wide in one pass; per-query
    // top-10 via the bounded TopKAgg partial agg.
    "q_search_topk" -> ((s, dir) => {
      TextAnalysis.searchTopK(Tables(s, dir, "documents"), "doc_id", "text",
        queries = Seq(
          "q_joins" -> Seq("join", "hash", "merge"),
          "q_scans" -> Seq("scan", "filter"),
          "q_streams" -> Seq("stream", "window", "batch")),
        k = 10)
    }),

    // ── LLM-pipeline: corpus-typicality n-gram score ────────────────
    "q_ngram_quality" -> ((s, dir) => {
      TextAnalysis.corpusNgramScore(Tables(s, dir, "documents"), "doc_id", "text", n = 2)
    }),

    // ── LLM-pipeline: C4-style boilerplate line removal ─────────────
    // The corpus text is single-line, so the query PLANTS multi-line
    // structure (a universal footer + a 1-in-3 promo line), mirrored
    // in the oracle — deterministic positives, not a vacuous pass.
    "q_boilerplate" -> ((s, dir) => {
      val planted = Tables(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), lit("footer: terms apply"),
          when(col("doc_id") % 3 === 0, lit("promo: subscribe now"))).as("text"))
      TextAnalysis.dropBoilerplateLines(planted, "doc_id", "text", minDocs = 50)
    }),

    // ── sampling: weighted without replacement (E-S keys) ───────────
    // Weight = n_chars; the pow key is dropped from the output (libm
    // last-ulp), the rank is the contract.
    "q_weighted_sample" -> ((s, dir) => {
      Sampling.weightedSample(
        Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"), col("source")),
        "doc_id", "n_chars", k = 100)
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

    // ── text: inverted-index head (bounded posting lists) ───────────
    // TopKAgg (score = −id) ships ≤ maxPostings pairs per term per
    // task — hot stopword terms never materialize corpus-sized lists.
    // Postings render as a comma string (the q_pq_encode convention):
    // the driver's pandas comparator cannot hash array cells
    // (CORRECTNESS_r10 q_inverted err).
    "q_inverted" -> ((s, dir) => {
      TextAnalysis.invertedIndex(Tables(s, dir, "documents"), "doc_id", "text",
          maxPostings = 100)
        .select(col("term"), col("df"),
          array_join(transform(col("postings"), p => p.cast("string")), ",")
            .as("postings"))
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

    // ── dedup: MinHash estimate-vs-exact calibration audit ──────────
    // |est − exact| per candidate pair — the sketch-accuracy twin of
    // q_ann_recall, on the md5-parity signature chain.
    "q_minhash_calib" -> ((s, dir) => {
      Dedup.minhashCalibration(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, parity = true)
    }),

    // ── text: pairwise source-similarity cosine (corpus mixture) ────
    // Exact long dot/norms over (source, term) counts; vocab-sized
    // self-join bounded by df(term) ≤ |sources|.
    "q_source_sim" -> ((s, dir) => {
      TextAnalysis.sourceSimilarity(Tables(s, dir, "documents"), "source", "text")
    }),

    // ── curation: robust (median/IQR) per-type value scaling ────────
    // The outlier-insensitive twin of q_zscore, on the exact type-7
    // quantile machinery; corpus never shuffles (broadcast quartiles).
    "q_robust_scale" -> ((s, dir) => {
      Curation.robustScale(
        Tables(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        "event_id", "event_type", "value")
    }),

    // ── graph: label-propagation communities (2 sync rounds) ────────
    "q_label_prop" -> ((s, dir) => {
      val pairs = nearDupPairs05(s, dir).select("id1", "id2")
      Graph.labelPropagation(pairs, "id1", "id2", rounds = 2)
    }),

    // ── text: PMI-lift collocations (phrase mining) ─────────────────
    "q_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(Tables(s, dir, "documents"), "text",
        minCount = 5, topK = 100)
    }),

    // ── text: per-source distinctive terms (c-TF-IDF lift form) ─────
    "q_distinct_terms" -> ((s, dir) => {
      TextAnalysis.distinctiveTerms(Tables(s, dir, "documents"), "source", "text",
        topK = 10)
    }),

    // ── text: Flesch readability profile ────────────────────────────
    // Punctuation-free corpus → the sentence floor engages on every
    // row (audited via the raw mark count); words/syllables vary, so
    // the score is non-degenerate.
    "q_readability" -> ((s, dir) => {
      TextAnalysis.readability(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── events: per-user inter-arrival cadence profile ──────────────
    "q_inter_arrival" -> ((s, dir) => {
      Events.interArrivalStats(Tables(s, dir, "events"))
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

    // ── text: per-doc lexical concentration (Simpson family) ────────
    "q_diversity" -> ((s, dir) => {
      TextAnalysis.lexicalDiversity(Tables(s, dir, "documents"), "doc_id", "text")
    }),

    // ── text: document-frequency stopword report ────────────────────
    "q_stopwords" -> ((s, dir) => {
      TextAnalysis.stopwordReport(Tables(s, dir, "documents"), "text", topK = 50)
    }),

    // ── text: Zipf rank-frequency head profile ──────────────────────
    "q_zipf" -> ((s, dir) => {
      TextAnalysis.zipfProfile(Tables(s, dir, "documents"), "text", topN = 100)
    }),

    // ── tokenizer: BPE pair statistics (round-1 merge candidates) ───
    "q_bpe_pairs" -> ((s, dir) => {
      Tokenizer.bpePairStats(Tables(s, dir, "documents"), "text", topK = 200)
    }),

    // ── tokenizer: BPE merge training, 6 rounds ─────────────────────
    // One corpus shuffle (word counts); each round is vocab-sized with
    // a single-row argmax collect — the driver loop the oracle replays
    // as an unrolled CTE chain (list_reduce = the same greedy fold).
    "q_bpe_merges" -> ((s, dir) => {
      Tokenizer.bpeTrain(Tables(s, dir, "documents"), "text", merges = 6)
    }),

    // ── tokenizer: BPE corpus segmentation with the trained rules ───
    // Encode only (rowwise folds, zero shuffles); the merge rules come
    // from the shared trained fixture (bpeMerges6 — warmed outside
    // Bench's timed region) and ride the plan as literals.
    "q_bpe_encode" -> ((s, dir) => {
      Tokenizer.applyBpe(Tables(s, dir, "documents"), "doc_id", "text",
        bpeMerges6(s, dir))
    }),

    // ── tokenizer: per-source compression report of the trained BPE ─
    // THE tokenizer acceptance metric: chars-per-subword by source —
    // a tokenizer trained on one domain under-compresses the others.
    // One zero-shuffle rowwise encode + a key-cardinality agg over
    // the shared trained rules (bpeMerges6).
    "q_bpe_compression" -> ((s, dir) => {
      Tokenizer.bpeCompression(Tables(s, dir, "documents"), "text", "source",
        bpeMerges6(s, dir))
    }),

    // ── LLM-pipeline: bigram-LM quality scoring (perplexity filter) ─
    // CCNet-style: train add-1 bigram statistics on the 3/4 reference
    // slice, score the held-out quarter by mean inverse conditional
    // probability (the rational perplexity proxy — ln's last ulp is
    // engine-dependent, IEEE division is not; see bigramLmScore).
    // Model = two vocab-sized count tables, never a corpus shuffle.
    "q_lm_score" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextAnalysis.bigramLmScore(docs.filter(col("doc_id") % 4 =!= 0),
        docs.filter(col("doc_id") % 4 === 0), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("mean_inv_p"))
    }),

    // ── LLM-pipeline: per-doc keyword extraction (rational-idf tfidf) ─
    "q_keywords" -> ((s, dir) => {
      TextAnalysis.keywords(Tables(s, dir, "documents"), "doc_id", "text", k = 5)
    }),

    // ── LLM-pipeline: keyword-in-context concordance ────────────────
    // Every "spark" occurrence with 3 tokens of context — the
    // corpus-inspection view behind filter-rule debugging. Rowwise
    // posexplode + bounded slices, no shuffle.
    "q_kwic" -> ((s, dir) => {
      TextAnalysis.kwic(Tables(s, dir, "documents"), "doc_id", "text",
        term = "spark", window = 3)
    }),

    // ── LLM-pipeline: hashing-trick sparse features (COO form) ──────
    // Vocabulary-free fixed-width vectorizer: md5 bucket + signed
    // second hash, one hash-agg on (doc, bucket). The linear-
    // classifier feature path that needs no vocab build at 100 TB.
    "q_feat_hash" -> ((s, dir) => {
      TextAnalysis.featureHash(Tables(s, dir, "documents"), "doc_id", "text",
        dim = 64)
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

    // ── LLM-pipeline: split-balance χ² audit ────────────────────────
    // Is the deterministic md5 split accidentally correlated with
    // source? Exact contingency table (zero cells materialized),
    // pinned expected-count arithmetic, sorted-fold term sum.
    "q_split_chi2" -> ((s, dir) => {
      Sampling.splitBalanceChi2(Tables(s, dir, "documents"), "doc_id", "source",
        testFrac = 0.2)
    }),

    // ── LLM-pipeline: LSH parameter-sweep candidate budget ──────────
    // The (b, r) tuning table: bucket counts + candidate-pair join
    // cost per band config, measured on the real corpus (md5 parity
    // mode so the oracle replays the signature chain bit-for-bit).
    "q_lsh_budget" -> ((s, dir) => {
      Dedup.lshBudget(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, bs = Seq(4, 8, 16), parity = true)
    }),

    // ── LLM-pipeline: Heaps-law vocabulary growth curve ─────────────
    // Distinct types after the first c docs per checkpoint — the
    // V(n) curve that sizes vocabularies; one vocab-sized first-seen
    // table, every checkpoint in ONE aggregate.
    "q_heaps" -> ((s, dir) => {
      TextAnalysis.vocabGrowth(Tables(s, dir, "documents"), "doc_id", "text",
        checkpoints = Seq(500L, 1000L, 2000L, 4000L))
    }),

    // ── LLM-pipeline: per-source top-5 docs, window-free ────────────
    // TopKAgg bounded partial agg instead of the per-key window sort:
    // each task ships ≤ 5 (id, score) pairs per source. Score =
    // n_chars (exact ints in double), tie → lowest doc_id.
    "q_top_per_key" -> ((s, dir) => {
      Curation.topKPerKey(Tables(s, dir, "documents"), "source", "doc_id",
        "n_chars", k = 5)
    }),

    // ── events: time-decayed popularity (polynomial kernel) ─────────
    // Recency-weighted per-type activity; 1/(1+age) instead of exp()
    // ON PURPOSE (cross-engine ulp), sorted-fold sum over the bounded
    // day grain.
    "q_decayed_pop" -> ((s, dir) => {
      Events.decayedPopularity(Tables(s, dir, "events"))
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

    // ── LLM-pipeline: group-safe k-fold cross-validation folds ──────
    // Folds keyed on source: every doc of a source shares a fold, so
    // holding out fold i never evals against same-source boilerplate.
    "q_kfold" -> ((s, dir) => {
      Sampling.kFoldGroups(Tables(s, dir, "documents"), "source", k = 5)
        .select(col("doc_id"), col("source"), col("fold"))
    }),

    // ── LLM-pipeline: per-doc n-gram novelty (3-token grams) ────────
    // "How much genuinely new text does this doc contribute" — the
    // up-weighting signal dual to contamination's overlap direction.
    "q_novelty" -> ((s, dir) => {
      Curation.ngramNovelty(Tables(s, dir, "documents"), "doc_id", "text", n = 3)
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
    })
  )

  /** DuckDB CTEs for the 2-step Lloyd parity loop (q_kmeans_fit2 /
    * q_kmeans_fit_meta): extends sqlCents8's (c, d, a) with the
    * posexplode'd values (x), step-1 sorted-fold centroids (c1), their
    * vector form (c1v), step-2 assignment (d2, a2), and step-2
    * centroids (c2). Means use list_reduce(list_sort(...)) — the same
    * sorted-fold contract as q_centroid_update, bit-exact vs Spark. */
  private val sqlFit2 =
    s"""$sqlCents8,
       |x AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |),
       |c1 AS (
       |  SELECT a.cluster, x.pos,
       |         list_reduce(list_sort(list(x.v)), (acc, e) -> acc + e) / count(*) AS val
       |  FROM a JOIN x USING (vec_id) GROUP BY 1, 2
       |),
       |c1v AS (SELECT cluster AS cid, list(val ORDER BY pos) AS cvec FROM c1 GROUP BY 1),
       |d2 AS (
       |  SELECT e.vec_id, c1v.cid,
       |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c1v.cvec),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM embeddings e CROSS JOIN c1v
       |),
       |a2 AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1
       |),
       |c2 AS (
       |  SELECT a2.cluster, x.pos,
       |         list_reduce(list_sort(list(x.v)), (acc, e) -> acc + e) / count(*) AS val
       |  FROM a2 JOIN x USING (vec_id) GROUP BY 1, 2
       |)""".stripMargin

  /** DuckDB CTEs mirroring Dedup.shingles/shingleHashes(parity)/
    * minhashSignature/bandBuckets (trigram shingles, one md5-derived
    * 32-bit base hash per shingle, H=16 integer universal-hash minima
    * (a_i·x + b_i) mod 2^31-1, 8 bands × 2 rows). DuckDB list slicing
    * is end-inclusive, hence the [lo : bi*2] bounds. */
  /** Same CTE chain over an arbitrary source relation (the pipeline
    * query runs it over the already-filtered document set), with an
    * optional CTE-name prefix so two chains (e.g. corpus + batch in
    * q_incremental) can coexist in one WITH. */
  private def sqlSigChainOn(src: String, p: String): String =
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
      |${p}sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS sh
      |  FROM ${p}toks WHERE len(toks) >= 3
      |),
      |${p}hs AS (
      |  SELECT doc_id, sh,
      |         list_transform(sh, s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)) AS hs
      |  FROM ${p}sh WHERE len(sh) > 0
      |),
      |${p}sig AS (
      |  SELECT doc_id, sh,
      |         [list_min([((1299721*i+7)*x + 104729*i) % 2147483647 for x in hs]) for i in range(1, 17)] AS sig
      |  FROM ${p}hs
      |),
      |${p}bb AS (
      |  SELECT doc_id, CAST(bi AS INTEGER) AS band,
      |         array_to_string(sig[(bi-1)*2+1 : bi*2], ',') AS bucket
      |  FROM ${p}sig CROSS JOIN generate_series(1, 8) t(bi)
      |)""".stripMargin

  /** The BPE greedy left-to-right merge fold as a DuckDB list_reduce —
    * requires an in-scope relation alias `m` with columns l, r (the
    * round's merge pair). Identical semantics to Tokenizer.mergeFold:
    * append each symbol unless the accumulator's last symbol is l and
    * the incoming one is r, in which case the tail rewrites to the
    * merged symbol (so a just-merged symbol never re-merges within the
    * round). */
  private def sqlBpeFold(listExpr: String): String =
    s"""list_reduce($listExpr, (acc, x) -> CASE
       |      WHEN (acc = m.l OR right(acc, len(m.l)+1) = ' ' || m.l) AND x = m.r
       |      THEN CASE WHEN acc = m.l THEN m.l || x
       |                ELSE left(acc, len(acc)-len(m.l)-1) || ' ' || m.l || x END
       |      ELSE acc || ' ' || x END)""".stripMargin

  /** Unrolled BPE training chain over `documents` — the oracle twin of
    * Tokenizer.bpeTrain: w0 = char-split word vocabulary; then per
    * round r: p{r} weighted pair counts, m{r} the argmax merge (count
    * desc, pair asc — the same pair-STRING tie-break as the engine),
    * w{r} the fold-rewritten vocabulary. */
  private def sqlBpeChain(rounds: Int): String = {
    val w0 =
      """w0 AS (
        |  SELECT array_to_string([w[i] for i in range(1, len(w)+1)], ' ') AS sym,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1
        |)""".stripMargin
    val per = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([ss[i] || ' ' || ss[i+1] for i in range(1, len(ss))]) AS pr
         |        FROM (SELECT string_split(sym, ' ') AS ss, cnt FROM w${r - 1}))
         |  GROUP BY pr
         |),
         |m$r AS (
         |  SELECT pair, c, split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r
         |  FROM p$r ORDER BY c DESC, pair LIMIT 1
         |),
         |w$r AS (
         |  SELECT ${sqlBpeFold("string_split(w.sym, ' ')")} AS sym, w.cnt
         |  FROM w${r - 1} w CROSS JOIN m$r m
         |)""".stripMargin
    }
    (w0 +: per).mkString(",\n")
  }

  private def sqlMinhashOn(src: String): String = sqlSigChainOn(src, "")

  private val sqlMinhash = sqlMinhashOn("documents")

  /** Shared CTE pair: banded-LSH candidates + exact Jaccard — the ONE
    * place the oracle states candidate-pair semantics; q_neardup_pairs,
    * q_components, and q_cluster_dedup all build on `simpairs` so a
    * future change cannot desynchronize them. */
  private val sqlCandJaccard =
    """cand AS (
      |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
      |  FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
      |),
      |simpairs AS (
      |  SELECT c.id1, c.id2,
      |         CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
      |         CAST(len(s1.sh) + len(s2.sh) - len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) AS sim
      |  FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.id1
      |  JOIN sh s2 ON s2.doc_id = c.id2
      |)""".stripMargin

  /** Shared CTE chain: minhash pairs (Jaccard ≥ 0.5) → symmetric
    * edges → recursive min-reachable closure. Used by q_components
    * and q_cluster_dedup. */
  private val sqlNearDupReach =
    s"""RECURSIVE $sqlMinhash,
       |$sqlCandJaccard,
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
       |)""".stripMargin

  /** Shared CTE chain: minhash near-dup pairs → symmetric `edges`
    * (src, dst) WITHOUT the recursive closure — the graph-operator
    * oracles (q_pagerank, q_degree_hist) build on this. */
  private val sqlNearDupEdges =
    s"""$sqlMinhash,
       |$sqlCandJaccard,
       |prpairs AS (SELECT id1, id2 FROM simpairs WHERE sim >= 0.5),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM prpairs
       |  UNION
       |  SELECT id2 AS src, id1 AS dst FROM prpairs
       |)""".stripMargin

  /** DuckDB cosine similarity mirroring VectorOps.cosine: sequential
    * list folds for dot and norms, sqrt each norm then multiply. */
  private def sqlCosine(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), q -> q[1]*q[2]))
       | / (sqrt(list_sum(list_transform(list_zip($a, $a), q -> q[1]*q[2])))
       |    * sqrt(list_sum(list_transform(list_zip($b, $b), q -> q[1]*q[2]))))""".stripMargin

  /** DuckDB CTEs mirroring Similarity.hyperplanes/lshBuckets: 8 tables
    * × 4 md5-derived hyperplanes over d=64, sign-bit bucket strings.
    * Every coordinate is exact integer / 2^32 arithmetic, so buckets
    * are bit-identical cross-engine. */
  private val sqlAnnIndex =
    """planes AS (
      |  SELECT l, i,
      |         [CAST(concat('0x', substr(md5(l || ':' || i || ':' || j), 1, 8)) AS BIGINT)
      |            / 4294967296.0 * 2 - 1
      |          for j in range(1, 65)] AS hv
      |  FROM generate_series(1, 8) t1(l) CROSS JOIN generate_series(1, 4) t2(i)
      |),
      |bits AS (
      |  SELECT e.vec_id, p.l, p.i,
      |         CASE WHEN list_sum(list_transform(list_zip(e.embedding::DOUBLE[], p.hv),
      |                                           q -> q[1]*q[2])) >= 0
      |              THEN '1' ELSE '0' END AS bit
      |  FROM embeddings e CROSS JOIN planes p
      |),
      |bk AS (
      |  SELECT vec_id, CAST(l AS INTEGER) AS tbl, string_agg(bit, '' ORDER BY i) AS bucket
      |  FROM bits GROUP BY vec_id, l
      |)""".stripMargin

  /** Corpus-adaptive twin of sqlAnnIndex for q_embed_neardup: plane
    * count = Dedup.autoBits(count) replayed with the SAME integer
    * arithmetic ((n+31)//32 ceil-div, then ceil-log2 as the binary
    * digit count of q-1 — never a floating log2, whose rounding at
    * exact powers of two could differ across engines). This keeps the
    * oracle hash-exact at ANY verify scale, not just where
    * autoBits(n) happens to equal 4. */
  private val sqlAnnIndexAuto =
    """ab AS (
      |  SELECT GREATEST(4, CASE WHEN q <= 1 THEN 0 ELSE length(printf('%b', q - 1)) END) AS bits
      |  FROM (SELECT (count(*) + 31) // 32 AS q FROM embeddings)
      |),
      |planes AS (
      |  SELECT l, i,
      |         [CAST(concat('0x', substr(md5(l || ':' || i || ':' || j), 1, 8)) AS BIGINT)
      |            / 4294967296.0 * 2 - 1
      |          for j in range(1, 65)] AS hv
      |  FROM generate_series(1, 8) t1(l)
      |  CROSS JOIN (SELECT unnest(range(1, (SELECT bits FROM ab) + 1)) AS i) t2
      |),
      |pbits AS (
      |  SELECT e.vec_id, p.l, p.i,
      |         CASE WHEN list_sum(list_transform(list_zip(e.embedding::DOUBLE[], p.hv),
      |                                           q -> q[1]*q[2])) >= 0
      |              THEN '1' ELSE '0' END AS bit
      |  FROM embeddings e CROSS JOIN planes p
      |),
      |bk AS (
      |  SELECT vec_id, CAST(l AS INTEGER) AS tbl, string_agg(bit, '' ORDER BY i) AS bucket
      |  FROM pbits GROUP BY vec_id, l
      |)""".stripMargin

  /** Probe set shared by the similarity-search oracles: the 5
    * lowest-vec_id embedding rows. */
  private val sqlProbes =
    """pr AS (
      |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 5)
      |)""".stripMargin

  /** BM25 CTE chain + score expression, shared by q_bm25 and q_rrf
    * (TextAnalysis.bm25Score twin: k1=1.2, b=0.75, terms
    * table/spark/value, rational Robertson idf). */
  private val sqlBm25Ctes =
    """base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |t AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
      |         CAST(len(list_filter(toks, x -> x = 'table')) AS BIGINT) AS tf0,
      |         CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf1,
      |         CAST(len(list_filter(toks, x -> x = 'value')) AS BIGINT) AS tf2
      |  FROM base
      |),
      |st AS (
      |  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
      |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
      |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      |  FROM t
      |)""".stripMargin

  private val sqlBm25Expr =
    """(CAST(n - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)
      |      * ((CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))
      |  + (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)
      |      * ((CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))
      |  + (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)
      |      * ((CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf2 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin

  /** DuckDB CTEs mirroring Similarity.trainPQ(maxIter=0)/encodePQ:
    * m=4 subspaces of 16 dims, codewords = the 16 lowest-vec_id rows'
    * subvectors renumbered 1..16 per subspace (FirstK), assignment =
    * argmin sqdist with lowest-cid tie-break. DuckDB list slices are
    * 1-based and end-INCLUSIVE: [j*16+1 : j*16+16]. */
  private val sqlPqCodes =
    """cb AS (
      |  SELECT t.j, CAST(row_number() OVER (PARTITION BY t.j ORDER BY f.vec_id) AS INTEGER) AS cid,
      |         (f.embedding::DOUBLE[])[t.j*16+1 : t.j*16+16] AS cw
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16) f CROSS JOIN range(0, 4) t(j)
      |),
      |sub AS (
      |  SELECT e.vec_id, t.j, (e.embedding::DOUBLE[])[t.j*16+1 : t.j*16+16] AS sv
      |  FROM embeddings e CROSS JOIN range(0, 4) t(j)
      |),
      |dpq AS (
      |  SELECT s.vec_id, s.j, cb.cid,
      |         list_sum(list_transform(list_zip(s.sv, cb.cw), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
      |  FROM sub s JOIN cb ON cb.j = s.j
      |),
      |pqa AS (
      |  SELECT vec_id, j, cid FROM (
      |    SELECT vec_id, j, cid,
      |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      |    FROM dpq) WHERE rn = 1
      |)""".stripMargin

  /** Shared ADC CTEs (need sqlPqCodes + sqlProbes upstream): per-probe
    * m×k sub-distance tables and the summed approximate distance per
    * (probe, vec) — the ONE place the oracle states ADC semantics
    * (q_pq_topk and q_pq_rerank both build on `ad`). */
  private val sqlPqAdc =
    """pt AS (
      |  SELECT pr.probe_id, cb.j, cb.cid,
      |         list_sum(list_transform(list_zip(pr.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
      |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
      |  FROM pr CROSS JOIN cb
      |),
      |ad AS (
      |  SELECT pt.probe_id, a.vec_id, list_sum(list(pt.sd ORDER BY a.j)) AS adist
      |  FROM pqa a JOIN pt ON pt.j = a.j AND pt.cid = a.cid
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** DuckDB CTEs mirroring Dedup.simhash: per-token 64 bits from the
    * md5 digest (4 × 16-bit words), ±1 majority vote per bit, hex
    * repack — ends in fpt(doc_id, fp). */
  private val sqlSimhashFp =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tb AS (
      |  SELECT doc_id,
      |         generate_subscripts(bits, 1) AS p,
      |         unnest(bits) AS b
      |  FROM (
      |    SELECT doc_id,
      |           flatten([[ (CAST(concat('0x', substr(md5(tok), 1+4*w, 4)) AS BIGINT) // CAST(power(2, j) AS BIGINT)) % 2
      |                      for j in range(15, -1, -1)]
      |                    for w in range(0, 4)]) AS bits
      |    FROM tok)
      |),
      |acc AS (SELECT doc_id, p, sum(2*b - 1) AS s FROM tb GROUP BY 1, 2),
      |dig AS (
      |  SELECT doc_id, (p-1)//4 AS d,
      |         sum((CASE WHEN s > 0 THEN 1 ELSE 0 END) *
      |             (CASE (p-1)%4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS v
      |  FROM acc GROUP BY 1, 2
      |),
      |fpt AS (
      |  SELECT doc_id, string_agg(substr('0123456789abcdef', CAST(v AS INTEGER)+1, 1), '' ORDER BY d) AS fp
      |  FROM dig GROUP BY doc_id
      |)""".stripMargin

  /** DuckDB CTEs mirroring TextAnalysis.winnowMins (k=5, w=4): 5-gram
    * rolling hashes, per-window-of-4 minima — ends in
    * mins(doc_id, mins). */
  private val sqlWinnowMins =
    """cs AS (
      |  SELECT doc_id, string_split(text, '') AS cs, length(text) - 4 AS m
      |  FROM documents
      |),
      |hs AS (
      |  SELECT doc_id, m,
      |         CASE WHEN m >= 1 THEN
      |           [list_reduce(list_transform(cs[i:i+4], c -> CAST(ascii(c) AS BIGINT)),
      |                        (acc, c) -> (acc * 31 + c) % 2147483647)
      |            for i in range(1, m + 1)]
      |         ELSE [] END AS hs
      |  FROM cs
      |),
      |mins AS (
      |  SELECT doc_id,
      |         CASE WHEN m < 1 THEN []
      |              WHEN m <= 4 THEN [list_min(hs)]
      |              ELSE [list_min(hs[j:j+3]) for j in range(1, m - 2)]
      |         END AS mins
      |  FROM hs
      |)""".stripMargin

  /** Shared multimodal ingest: documents with the opaque binary
    * payload + typed metadata attached. */
  private def mmTable(s: SparkSession, dir: String): DataFrame =
    Multimodal.withContent(Tables(s, dir, "documents"), "doc_id", "text")

  /** Char-trigram profiles for the n-gram language-ID variant. Must
    * match the q_lang_ngram oracle SQL VALUES literally. */
  private val NgramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch"),
    "en" -> Seq(" th", "ing", " an"),
    "es" -> Seq(" de", "los", " la"),
    "fr" -> Seq(" le", "ent", "eau"))

  /** Language profiles for the language-ID heuristic. Word lists must
    * match the q_lang_id oracle SQL VALUES literally. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das"),
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"),
    "zh" -> Seq("zhe", "shi", "bu", "wo"))

  def oracleSql: Map[String, String] = Map(

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

    "q_text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        |       CAST(len(list_distinct(toks)) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)""".stripMargin,

    "q_quality" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         ['the', 'a', 'and', 'of', 'to', 'in'] AS sw
        |  FROM documents
        |),
        |r AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_distinct(list_filter(toks, t -> list_contains(sw, t)))) AS DOUBLE)
        |           / CAST(len(list_distinct(toks)) AS DOUBLE) AS stop_coverage,
        |         CAST(len(list_filter(toks, t -> list_contains(sw, t))) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS stop_token_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |  FROM d
        |)
        |SELECT doc_id, n_tokens, stop_coverage, stop_token_ratio, type_token_ratio,
        |       (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN stop_token_ratio > 0.05 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN type_token_ratio > 0.2 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN type_token_ratio < 0.95 THEN 0.25 ELSE 0.0 END) AS quality
        |FROM r""".stripMargin,

    "q_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com or https://ex.com/d/' || doc_id
        |              || ' tel 555-0100-' || doc_id AS t
        |  FROM documents
        |)
        |, p AS (
        |  SELECT doc_id, t,
        |         regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS no_url
        |  FROM aug
        |), p2 AS (
        |  SELECT doc_id, t, no_url,
        |         regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                        '<EMAIL>', 'g') AS no_email
        |  FROM p
        |)
        |SELECT doc_id,
        |       regexp_replace(no_email, '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUM>', 'g') AS clean_text,
        |       CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |       CAST(len(regexp_extract_all(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(no_email, '[0-9][0-9 ()+.-]{6,}[0-9]')) AS BIGINT) AS n_phones
        |FROM p2""".stripMargin,

    "q_rep_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS gram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |),
        |counts AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram
        |),
        |agg AS (
        |  SELECT doc_id, max(cnt) AS top_cnt,
        |         CAST(sum(cnt) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams
        |  FROM counts GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(a.n_grams, 0) AS n_grams,
        |       COALESCE(CAST(a.top_cnt AS DOUBLE) / a.n_grams, 0.0) AS top_ngram_frac,
        |       COALESCE(CAST(a.dup_grams AS DOUBLE) / a.n_grams, 0.0) AS dup_ngram_frac
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q_rep_runs" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |),
        |r AS (
        |  SELECT doc_id, tok, pos,
        |         pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp
        |  FROM t
        |),
        |runs AS (SELECT doc_id, count(*) AS run_len FROM r GROUP BY doc_id, tok, grp)
        |SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run
        |FROM runs GROUP BY doc_id""".stripMargin,

    "q_top_terms" ->
      """SELECT term, cnt, CAST(rn AS INTEGER) AS rank FROM (
        |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM (
        |    SELECT term, count(*) AS cnt FROM (
        |      SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |    GROUP BY 1))
        |WHERE rn <= 20""".stripMargin,

    "q_term_freq" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2
        |),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df FROM tf JOIN dfreq USING (term)""".stripMargin,

    "q_vocab" ->
      """WITH counts AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term)
        |SELECT term, cnt,
        |       CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS vocab_id
        |FROM counts""".stripMargin,

    "q_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len([x for x in string_split(text, ' ') if len(x) > 0])
        |           AS BIGINT) AS n_words,
        |         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |           AS n_sentence_marks,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |           AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentence_marks, n_syllables,
        |       greatest(n_sentence_marks, 1) AS n_sentences,
        |       CASE WHEN n_words > 0 THEN
        |         206.835
        |           - 1.015 * (CAST(n_words AS DOUBLE) / greatest(n_sentence_marks, 1))
        |           - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) END AS flesch
        |FROM t""".stripMargin,

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

    "q_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |c AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
        |      FROM toks GROUP BY doc_id, t),
        |a AS (SELECT doc_id,
        |             CAST(sum(c) AS BIGINT) AS n_tokens,
        |             CAST(count(*) AS BIGINT) AS n_types,
        |             CAST(sum(c * c) AS BIGINT) AS sum_sq
        |      FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(a.n_tokens, 0) AS n_tokens,
        |       COALESCE(a.n_types, 0) AS n_types,
        |       COALESCE(a.sum_sq, 0) AS sum_sq,
        |       CASE WHEN a.n_tokens > 0
        |            THEN CAST(a.n_tokens * a.n_tokens - a.sum_sq AS DOUBLE)
        |                   / (a.n_tokens * a.n_tokens) END AS simpson,
        |       CASE WHEN a.n_tokens > 0
        |            THEN CAST(a.n_tokens * a.n_tokens AS DOUBLE) / a.sum_sq
        |            END AS eff_types
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,

    "q_stopwords" ->
      """WITH toks AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |bt AS (SELECT toks.t AS term,
        |              CAST(count(DISTINCT toks.doc_id) AS BIGINT) AS df,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks GROUP BY toks.t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT term, df, cnt,
        |       CAST(df AS DOUBLE) / n.n AS df_frac,
        |       CAST(row_number() OVER (ORDER BY df DESC, cnt DESC, term) AS BIGINT)
        |         AS rank
        |FROM bt CROSS JOIN n
        |ORDER BY df DESC, cnt DESC, term LIMIT 50""".stripMargin,

    "q_zipf" ->
      """WITH toks AS (
        |  SELECT t FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |c AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY t),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM c),
        |h AS (SELECT term, cnt,
        |             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
        |             CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |             max(cnt) OVER () AS top
        |      FROM c)
        |SELECT rank, term, cnt,
        |       CAST(cnt AS DOUBLE) / top AS frac_top,
        |       CAST(cum AS DOUBLE) / tot.t AS cum_frac
        |FROM h CROSS JOIN tot WHERE rank <= 100""".stripMargin,

    "q_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks, n,
        |         unnest(range(1, greatest(1, n - 8) + 1, 24)) AS s
        |  FROM t)
        |SELECT doc_id,
        |       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
        |       array_to_string(list_slice(toks, s, s + 31), ' ') AS chunk_text,
        |       least(CAST(32 AS BIGINT), n - s + 1) AS n_tokens
        |FROM u""".stripMargin,

    "q_strip_markup" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         '<html><body class="d"><p>' || substr(text, 1, 60)
        |           || '</p><br/>&amp;co &lt;tag&gt; ' || substr(text, 61, 1000000)
        |           || '</body></html>' AS text
        |  FROM documents
        |),
        |st AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '<[^<>]*>')) AS BIGINT) AS n_tags_removed,
        |         regexp_replace(text, '<[^<>]*>', ' ', 'g') AS s1
        |  FROM aug
        |),
        |de AS (
        |  SELECT doc_id, n_tags_removed,
        |         replace(replace(replace(replace(replace(
        |           s1, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '&apos;', ''''), '&amp;', '&') AS s2
        |  FROM st
        |)
        |SELECT doc_id,
        |       trim(regexp_replace(s2, '  +', ' ', 'g')) AS clean_text,
        |       n_tags_removed
        |FROM de""".stripMargin,

    "q_truncate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |)
        |SELECT doc_id,
        |       array_to_string(toks[1:30], ' ') AS text,
        |       CAST(least(len(toks), 30) AS BIGINT) AS n_tokens_kept,
        |       CAST(len(toks) - least(len(toks), 30) AS BIGINT) AS n_tokens_dropped
        |FROM t""".stripMargin,

    "q_sentences" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         substr(text, 1, 50) || '. ' || substr(text, 51, 50) || '! '
        |           || substr(text, 101, 1000000) AS text
        |  FROM documents
        |),
        |s0 AS (
        |  SELECT doc_id,
        |         list_filter(
        |           list_transform(
        |             string_split(regexp_replace(regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |                                         '([.!?]+)\s+', '\1' || chr(1), 'g'),
        |                          chr(1)),
        |             y -> trim(y)),
        |           x -> len(x) > 0) AS ss
        |  FROM aug
        |)
        |SELECT doc_id, CAST(generate_subscripts(ss, 1) AS INTEGER) AS sent_id,
        |       unnest(ss) AS sentence, CAST(len(ss) AS BIGINT) AS n_sents
        |FROM s0""".stripMargin,

    "q_normalize" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |         '  Start' || chr(9) || text || ' MID  dash ' || doc_id || '  ' AS text
        |  FROM documents)
        |SELECT doc_id,
        |       lower(trim(regexp_replace(
        |         regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '  +', ' ', 'g')))
        |         AS norm_text,
        |       CAST(length(text) - length(lower(trim(regexp_replace(
        |         regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '  +', ' ', 'g'))))
        |         AS BIGINT) AS n_chars_removed
        |FROM dirty""".stripMargin,

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

    "q_oov" ->
      """WITH counts AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term),
        |topv AS (SELECT list(term) AS lt FROM (
        |  SELECT term FROM counts ORDER BY cnt DESC, term LIMIT 10)),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(toks, x -> NOT list_contains(topv.lt, x))) AS BIGINT) AS n_oov,
        |       CAST(len(list_filter(toks, x -> NOT list_contains(topv.lt, x))) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS oov_rate
        |FROM t, topv""".stripMargin,

    "q_lang_id" ->
      """WITH langs AS (
        |  SELECT * FROM (VALUES
        |    ('de', ['der', 'die', 'und', 'das']),
        |    ('en', ['the', 'a', 'and', 'of']),
        |    ('es', ['el', 'la', 'los', 'y']),
        |    ('fr', ['le', 'les', 'des', 'et']),
        |    ('zh', ['zhe', 'shi', 'bu', 'wo'])) l(lang, words)
        |),
        |scores AS (
        |  SELECT d.doc_id, l.lang,
        |         CAST(len(list_filter(d.toks, t -> list_contains(l.words, t))) AS DOUBLE)
        |           / CAST(len(d.toks) AS DOUBLE) AS score
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
        |  CROSS JOIN langs l
        |)
        |SELECT doc_id, lang AS lang_pred, score AS lang_score FROM (
        |  SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM scores)
        |WHERE rn = 1""".stripMargin,

    "q_lang_ngram" ->
      """WITH langs AS (
        |  SELECT * FROM (VALUES
        |    ('de', ['der', 'ein', 'sch']),
        |    ('en', [' th', 'ing', ' an']),
        |    ('es', [' de', 'los', ' la']),
        |    ('fr', [' le', 'ent', 'eau'])) l(lang, grams)
        |),
        |g AS (
        |  SELECT doc_id, [substr(text, i, 3) for i in range(1, length(text)-1)] AS grams
        |  FROM documents
        |),
        |scores AS (
        |  SELECT g.doc_id, l.lang,
        |         CASE WHEN len(g.grams) > 0 THEN
        |           CAST(len(list_filter(g.grams, x -> list_contains(l.grams, x))) AS DOUBLE)
        |             / CAST(len(g.grams) AS DOUBLE)
        |         ELSE 0.0 END AS score
        |  FROM g CROSS JOIN langs l
        |)
        |SELECT doc_id, lang AS lang_pred, score AS lang_score FROM (
        |  SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM scores)
        |WHERE rn = 1""".stripMargin,

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

    "q_ivfpq_topk" ->
      s"""WITH $sqlCents8,
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
         |  FROM a JOIN pc ON a.cluster = pc.cell
         |  WHERE a.vec_id != pc.probe_id
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
         |  FROM adq) WHERE rn <= 10""".stripMargin,

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

    "q_ivf_topk" ->
      s"""WITH $sqlCents8,
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
         |  WHERE a.vec_id != pc.probe_id
         |)
         |SELECT probe_id, vec_id, CAST(rn AS INTEGER) AS rank, sim FROM (
         |  SELECT probe_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10""".stripMargin,

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

    "q_next_event" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT event_id, user_id, event_type,
        |       lead(event_type) OVER w AS next_type,
        |       lead(ts_us) OVER w - ts_us AS gap_us
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin,

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

    "q_comp_sizes" ->
      s"""WITH $sqlNearDupReach,
         |c AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS size
         |       FROM c GROUP BY 1)
         |SELECT size, CAST(count(*) AS BIGINT) AS n_components
         |FROM sz GROUP BY 1""".stripMargin,

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

    "q_stream_dedup" ->
      """WITH idx AS (SELECT DISTINCT md5(text) AS h FROM documents
        |             WHERE doc_id % 4 <> 0),
        |b AS (SELECT * FROM documents WHERE doc_id % 4 = 0)
        |SELECT doc_id, source FROM b ANTI JOIN idx ON md5(b.text) = idx.h""".stripMargin,

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

    "q_simhash" ->
      s"""WITH $sqlSimhashFp
         |SELECT doc_id, fp FROM fpt""".stripMargin,

    "q_sql_kernels" ->
      s"""WITH $sqlSimhashFp
         |SELECT f.doc_id, f.fp,
         |       list_sum(list_transform(list_zip(e.embedding::DOUBLE[], e.embedding::DOUBLE[]),
         |                               q -> q[1]*q[2])) AS self_dot
         |FROM fpt f JOIN embeddings e ON e.vec_id = f.doc_id % 500""".stripMargin,

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

    "q_image_neardup" ->
      """WITH pay AS (
        |  SELECT doc_id, substr(text, 1, 144) AS img FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'x' || substr(substr(text, 1, 144), 2, 143)
        |  FROM documents WHERE doc_id % 10 = 0
        |),
        |b AS (
        |  SELECT doc_id, hex(encode(img)) AS hx, octet_length(encode(img)) AS n
        |  FROM pay
        |),
        |px AS (
        |  SELECT doc_id, n,
        |         [CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT)
        |          for i in range(1, n+1)] AS px
        |  FROM b WHERE n > 0
        |),
        |smp AS (SELECT doc_id, [px[CAST((k*n)//72 AS INTEGER) + 1] for k in range(0, 72)] AS s
        |        FROM px),
        |bits AS (SELECT doc_id,
        |                [CASE WHEN s[(k//8)*9 + (k%8) + 1] < s[(k//8)*9 + (k%8) + 2]
        |                      THEN 1 ELSE 0 END for k in range(0, 64)] AS bt
        |         FROM smp),
        |fpt AS (SELECT doc_id,
        |               array_to_string([substr('0123456789abcdef',
        |                 bt[4*j+1]*8 + bt[4*j+2]*4 + bt[4*j+3]*2 + bt[4*j+4] + 1, 1)
        |                 for j in range(0, 16)], '') AS fp
        |        FROM bits),
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

    "q_scan_project" ->
      "SELECT vec_id, label, CAST(len(embedding) AS INTEGER) AS dims FROM embeddings",

    "q_gene_parse" ->
      """SELECT CAST(column0 AS BIGINT) AS id, CAST(column1 AS INTEGER) AS label,
        |       CAST(column2 AS DOUBLE) AS f1, CAST(column3 AS DOUBLE) AS f2,
        |       CAST(column4 AS DOUBLE) AS f3, CAST(column5 AS DOUBLE) AS f4
        |FROM read_csv('/root/reference/data/new_dataset_1.txt', sep='\t', header=false)""".stripMargin,

    "q_kmeans_init" ->
      """SELECT i.cluster, i.vec_id, CAST(e.embedding[1] AS DOUBLE) AS f1
        |FROM (VALUES (1, CAST(42 AS BIGINT)), (2, CAST(7 AS BIGINT)), (3, CAST(19 AS BIGINT))) i(cluster, vec_id)
        |JOIN embeddings e ON e.vec_id = i.vec_id""".stripMargin,

    "q_kmeans_assign" ->
      s"""WITH $sqlCents8
         |SELECT vec_id, cluster FROM a""".stripMargin,

    "q_kmeans_pp" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u0 AS (SELECT vec_id, v,
        |              CAST(concat('0x', substr(md5('42:0:' || vec_id), 1, 8)) AS BIGINT)
        |                / 4294967296.0 AS u
        |       FROM e),
        |c1 AS (SELECT vec_id, v FROM u0 ORDER BY u, vec_id LIMIT 1),
        |k1 AS (
        |  SELECT e.vec_id, e.v,
        |         list_sum(list_transform(list_zip(e.v, c1.v), p -> (p[1]-p[2])*(p[1]-p[2]))) AS d2,
        |         CAST(concat('0x', substr(md5('42:1:' || e.vec_id), 1, 8)) AS BIGINT)
        |           / 4294967296.0 AS u
        |  FROM e CROSS JOIN c1
        |),
        |c2 AS (SELECT vec_id, v FROM k1 WHERE d2 > 0 AND u > 0 ORDER BY -ln(u)/d2, vec_id LIMIT 1),
        |k2 AS (
        |  SELECT e.vec_id, e.v,
        |         least(
        |           list_sum(list_transform(list_zip(e.v, c1.v), p -> (p[1]-p[2])*(p[1]-p[2]))),
        |           list_sum(list_transform(list_zip(e.v, c2.v), p -> (p[1]-p[2])*(p[1]-p[2])))) AS d2,
        |         CAST(concat('0x', substr(md5('42:2:' || e.vec_id), 1, 8)) AS BIGINT)
        |           / 4294967296.0 AS u
        |  FROM e CROSS JOIN c1 CROSS JOIN c2
        |),
        |c3 AS (SELECT vec_id, v FROM k2 WHERE d2 > 0 AND u > 0 ORDER BY -ln(u)/d2, vec_id LIMIT 1),
        |sel AS (
        |  SELECT 1 AS cluster, v FROM c1
        |  UNION ALL SELECT 2, v FROM c2
        |  UNION ALL SELECT 3, v FROM c3
        |)
        |SELECT CAST(cluster AS INTEGER) AS cluster,
        |       CAST(generate_subscripts(v, 1) AS INTEGER) AS pos,
        |       unnest(v) AS val
        |FROM sel""".stripMargin,

    "q_centroid_update" ->
      s"""WITH $sqlCents8,
         |x AS (
         |  SELECT vec_id,
         |         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
         |         CAST(unnest(embedding) AS DOUBLE) AS v
         |  FROM embeddings
         |)
         |SELECT a.cluster, x.pos,
         |       list_reduce(list_sort(list(x.v)), (acc, e) -> acc + e) / count(*) AS val
         |FROM a JOIN x USING (vec_id)
         |GROUP BY 1, 2""".stripMargin,

    "q_kmeans_cost" ->
      s"""WITH $sqlCents8
         |SELECT list_reduce(list_sort(list(m)), (acc, e) -> acc + e) AS cost,
         |       count(*) AS n
         |FROM (SELECT vec_id, min(dist) AS m FROM d GROUP BY 1)""".stripMargin,

    "q_kmeans_fit2" ->
      s"""WITH $sqlFit2
         |SELECT cluster, pos, val FROM c2""".stripMargin,

    "q_kmeans_fit_meta" ->
      s"""WITH $sqlFit2
         |SELECT CAST(2 AS INTEGER) AS iterations,
         |       CAST((SELECT count(DISTINCT cluster) FROM c2) AS INTEGER) AS n_clusters,
         |       ((SELECT count(*) FROM c1) = (SELECT count(*) FROM c2)
         |        AND (SELECT count(*) FROM
         |               (SELECT cluster, pos, val FROM c1
         |                UNION
         |                SELECT cluster, pos, val FROM c2))
         |            = (SELECT count(*) FROM c1)) AS converged""".stripMargin,

    "q_membership" ->
      s"""WITH $sqlCents8
         |SELECT cluster, count(*) AS n,
         |       string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id) AS members
         |FROM a GROUP BY cluster""".stripMargin,

    // Replays the reference centroid byte format end-to-end: FirstK(4)
    // seeds renumbered in doc_id order, exact-integer argmin assign
    // (tie -> lowest cid), sorted '|'-joined membership, '-n' count
    // suffix. All vector components are integer-valued doubles, so
    // CAST(v AS VARCHAR) == Java Double.toString ("157.0") on both
    // engines — the byte format itself is under the hash gate.
    "q_centroid_format" ->
      """WITH f AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS v1,
        |                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS v2
        |           FROM documents),
        |c AS (SELECT row_number() OVER (ORDER BY doc_id) AS cid, v1, v2
        |      FROM (SELECT * FROM f ORDER BY doc_id LIMIT 4)),
        |d AS (SELECT f.doc_id, c.cid,
        |             (f.v1 - c.v1) * (f.v1 - c.v1)
        |             + (f.v2 - c.v2) * (f.v2 - c.v2) AS dist
        |      FROM f CROSS JOIN c),
        |a AS (SELECT doc_id, cid
        |      FROM (SELECT doc_id, cid,
        |                   row_number() OVER (PARTITION BY doc_id
        |                                      ORDER BY dist, cid) AS rn
        |            FROM d)
        |      WHERE rn = 1),
        |m AS (SELECT cid,
        |             string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id)
        |               || '|' AS ids,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM a GROUP BY cid)
        |SELECT CAST(c.cid AS VARCHAR) || chr(9)
        |       || CAST(c.v1 AS VARCHAR) || chr(9) || CAST(c.v2 AS VARCHAR)
        |       || CASE WHEN m.cid IS NULL THEN ''
        |               ELSE chr(9) || m.ids || chr(9) || '-' || CAST(m.n AS VARCHAR)
        |          END AS line
        |FROM c LEFT JOIN m ON m.cid = c.cid""".stripMargin,

    "q_pca_cov" ->
      """WITH x AS (
        |  SELECT vec_id,
        |         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings
        |),
        |mu AS (
        |  SELECT i, list_reduce(list_sort(list(v)), (acc, e) -> acc + e) / count(*) AS m
        |  FROM x GROUP BY 1
        |),
        |cx AS (SELECT x.vec_id, x.i, x.v - mu.m AS cv FROM x JOIN mu USING (i)),
        |pr AS (
        |  SELECT a.i AS i, b.i AS j, a.cv * b.cv AS p
        |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id AND a.i <= b.i
        |)
        |SELECT i, j, list_reduce(list_sort(list(p)), (acc, e) -> acc + e) / (count(*) - 1) AS cov
        |FROM pr GROUP BY 1, 2""".stripMargin,

    "q_jaccard" ->
      s"""WITH $sqlCents8,
         |jj AS (
         |  SELECT CAST(e.label AS BIGINT) AS truth, CAST(a.cluster AS BIGINT) AS pred
         |  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
         |),
         |cells AS (SELECT truth, pred, count(*) AS n FROM jj GROUP BY 1, 2),
         |mm AS (SELECT CAST(coalesce(sum(n*n), 0) AS BIGINT) AS m11
         |       FROM cells WHERE truth != -1 AND pred != -1),
         |gg AS (SELECT CAST(coalesce(sum(nt*nt), 0) AS BIGINT) AS g
         |       FROM (SELECT sum(n) AS nt FROM cells WHERE truth != -1 GROUP BY truth)),
         |pp AS (SELECT CAST(coalesce(sum(np*np), 0) AS BIGINT) AS p
         |       FROM (SELECT sum(n) AS np FROM cells WHERE pred != -1 GROUP BY pred))
         |SELECT m11, g + p - 2*m11 AS disagree,
         |       CAST(m11 AS DOUBLE) / CAST(g + p - m11 AS DOUBLE) AS jaccard
         |FROM mm, gg, pp""".stripMargin,

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

    // chi2's op order replays the plan exactly: dif in BIGINT then
    // CAST; numerator ((N*dif)*dif); denominator left-assoc product
    "q_chi2_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n11 FROM bg GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(n11) AS BIGINT) AS nt FROM bi),
        |l AS (SELECT w1, CAST(sum(n11) AS BIGINT) AS n1p FROM bi GROUP BY 1),
        |r AS (SELECT w2, CAST(sum(n11) AS BIGINT) AS np1 FROM bi GROUP BY 1),
        |j AS (SELECT bi.w1, bi.w2, bi.n11, l.n1p, r.np1, n.nt,
        |             CAST(bi.n11 * (n.nt - l.n1p - r.np1 + bi.n11)
        |                  - (l.n1p - bi.n11) * (r.np1 - bi.n11) AS DOUBLE) AS dif
        |      FROM bi JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |      WHERE bi.n11 >= 5 AND l.n1p < n.nt AND r.np1 < n.nt)
        |SELECT w1, w2, n11, n1p, np1,
        |       CAST(nt AS DOUBLE) * dif * dif /
        |       (CAST(n1p AS DOUBLE) * CAST(nt - n1p AS DOUBLE)
        |        * CAST(np1 AS DOUBLE) * CAST(nt - np1 AS DOUBLE)) AS chi2
        |FROM j ORDER BY chi2 DESC, w1, w2 LIMIT 50""".stripMargin,

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

    "q_vocab_coverage" ->
      """WITH c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
        |        SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |      GROUP BY 1),
        |r AS (SELECT c.*, row_number() OVER (ORDER BY c DESC, term) AS rank FROM c),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM r)
        |SELECT CAST(k.k AS BIGINT) AS k,
        |       CAST(sum(CASE WHEN r.rank <= k.k THEN r.c ELSE 0 END) AS BIGINT)
        |         AS covered_tokens,
        |       t.total AS total_tokens,
        |       CAST(sum(CASE WHEN r.rank <= k.k THEN r.c ELSE 0 END) AS DOUBLE)
        |         / CAST(t.total AS DOUBLE) AS coverage
        |FROM r CROSS JOIN (VALUES (100), (1000), (10000)) k(k) CROSS JOIN t
        |GROUP BY k.k, t.total""".stripMargin,

    "q_corpus_drift" ->
      """WITH c1 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 = 0),
        |g1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM c1 GROUP BY 1),
        |c2 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 <> 0),
        |g2 AS (SELECT term, CAST(count(*) AS BIGINT) AS c2 FROM c2 GROUP BY 1),
        |j AS (SELECT coalesce(g1.c1, 0) AS c1, coalesce(g2.c2, 0) AS c2
        |      FROM g1 FULL OUTER JOIN g2 USING (term)),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM j)
        |SELECT n.n1 AS n_tokens_v1, n.n2 AS n_tokens_v2,
        |       CAST(sum(CASE WHEN j.c1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_v1,
        |       CAST(sum(CASE WHEN j.c2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_v2,
        |       CAST(sum(CASE WHEN j.c1 > 0 AND j.c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS shared_vocab,
        |       CAST(sum(abs(j.c1 * n.n2 - j.c2 * n.n1)) AS DOUBLE)
        |         / (2.0 * CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)) AS tvd
        |FROM j CROSS JOIN n GROUP BY n.n1, n.n2""".stripMargin,

    "q_drift_terms" ->
      """WITH c1 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 = 0),
        |g1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM c1 GROUP BY 1),
        |c2 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 <> 0),
        |g2 AS (SELECT term, CAST(count(*) AS BIGINT) AS c2 FROM c2 GROUP BY 1),
        |j AS (SELECT term, coalesce(g1.c1, 0) AS c1, coalesce(g2.c2, 0) AS c2
        |      FROM g1 FULL OUTER JOIN g2 USING (term)),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM j)
        |SELECT j.term, j.c1, j.c2,
        |       abs(j.c1 * n.n2 - j.c2 * n.n1) AS deviation
        |FROM j CROSS JOIN n
        |ORDER BY deviation DESC, term LIMIT 20""".stripMargin,

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

    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |           / 4294967296.0 AS h,
        |         CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 ELSE 0.25 END AS rate
        |  FROM documents)
        |WHERE h < rate""".stripMargin,

    "q_keep_best" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source, lang
        |                               ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,

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

    "q_dedup_kept" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1""".stripMargin,

    "q_setops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 150""".stripMargin,

    "q_mm_meta" ->
      """SELECT doc_id, 'gray8' AS format, CAST(16 AS INTEGER) AS width,
        |       CAST((octet_length(encode(text)) + 15) // 16 AS INTEGER) AS height,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    "q_mm_stats" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |),
        |px AS (
        |  SELECT doc_id, n,
        |         [CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT)
        |          for i in range(1, n+1)] AS px
        |  FROM b
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_px,
        |       coalesce(CAST(list_sum(px) AS BIGINT), 0) AS sum_px,
        |       list_min(px) AS min_px, list_max(px) AS max_px,
        |       CASE WHEN n > 0 THEN CAST(list_sum(px) AS DOUBLE) / CAST(n AS DOUBLE)
        |            ELSE 0.0 END AS mean_px
        |FROM px""".stripMargin,

    "q_mm_frames" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |         substr(hx, (i-1)*512+1, 512) AS fhx
        |  FROM (SELECT doc_id, hx,
        |               unnest(range(1, CAST((n + 255) // 256 AS BIGINT) + 1)) AS i
        |        FROM b)
        |)
        |SELECT doc_id, frame_idx, CAST(length(fhx) // 2 AS BIGINT) AS n_bytes,
        |       md5(fhx) AS frame_md5
        |FROM f""".stripMargin,

    "q_mm_embed" ->
      """SELECT doc_id, CAST(j AS INTEGER) AS dim,
        |       CAST(concat('0x', substr(md5(md5(text) || ':' || j), 1, 8)) AS BIGINT)
        |         / 4294967296.0 AS v
        |FROM documents CROSS JOIN generate_series(1, 8) t(j)""".stripMargin,

    "q_silhouette" ->
      s"""WITH $sqlCents8,
         |sil AS (
         |  SELECT d.vec_id,
         |         sqrt(min(CASE WHEN d.cid = a.cluster THEN d.dist END)) AS ad,
         |         sqrt(min(CASE WHEN d.cid != a.cluster THEN d.dist END)) AS bd
         |  FROM d JOIN a USING (vec_id) GROUP BY d.vec_id
         |),
         |ss AS (
         |  SELECT CASE WHEN greatest(ad, bd) > 0 THEN (bd - ad) / greatest(ad, bd)
         |              ELSE 0.0 END AS s
         |  FROM sil
         |)
         |SELECT list_reduce(list_sort(list(s)), (acc, e) -> acc + e) / count(*) AS silhouette,
         |       count(*) AS n
         |FROM ss""".stripMargin,

    "q_calinski" ->
      s"""WITH $sqlCents8,
         |own AS (
         |  SELECT d.vec_id, min(CASE WHEN d.cid = a.cluster THEN d.dist END) AS d2
         |  FROM d JOIN a USING (vec_id) GROUP BY d.vec_id
         |),
         |w AS (SELECT list_reduce(list_sort(list(d2)), (acc, e) -> acc + e) AS w,
         |             CAST(count(*) AS BIGINT) AS n
         |      FROM own),
         |x AS (SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
         |             CAST(unnest(embedding) AS DOUBLE) AS v
         |      FROM embeddings),
         |mu AS (SELECT pos,
         |              list_reduce(list_sort(list(v)), (acc, e) -> acc + e) / count(*) AS m
         |       FROM x GROUP BY pos),
         |muv AS (SELECT list(m ORDER BY pos) AS mu FROM mu),
         |nc AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_c FROM a GROUP BY cluster),
         |bt AS (
         |  SELECT c.cid,
         |         CAST(COALESCE(nc.n_c, 0) AS DOUBLE)
         |           * list_sum(list_transform(list_zip(c.cvec, muv.mu),
         |                                     p -> (p[1]-p[2])*(p[1]-p[2]))) AS t
         |  FROM c CROSS JOIN muv LEFT JOIN nc ON nc.cluster = c.cid
         |),
         |b AS (SELECT list_reduce(list(t ORDER BY cid), (acc, e) -> acc + e) AS b FROM bt)
         |SELECT CASE WHEN w.n > 8
         |            THEN (b.b / (8 - 1)) / (w.w / (w.n - 8)) END AS ch,
         |       b.b AS b, w.w AS w, w.n AS n
         |FROM b CROSS JOIN w""".stripMargin,

    "q_rand_index" ->
      s"""WITH $sqlCents8,
         |jj AS (
         |  SELECT CAST(e.label AS BIGINT) AS truth, CAST(a.cluster AS BIGINT) AS pred
         |  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
         |),
         |cells AS (SELECT truth, pred, count(*) AS n FROM jj GROUP BY 1, 2),
         |mm AS (SELECT CAST(coalesce(sum(n*n), 0) AS BIGINT) AS m11
         |       FROM cells WHERE truth != -1 AND pred != -1),
         |gg AS (SELECT CAST(coalesce(sum(nt*nt), 0) AS BIGINT) AS g
         |       FROM (SELECT sum(n) AS nt FROM cells WHERE truth != -1 GROUP BY truth)),
         |pp AS (SELECT CAST(coalesce(sum(np*np), 0) AS BIGINT) AS p
         |       FROM (SELECT sum(n) AS np FROM cells WHERE pred != -1 GROUP BY pred)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM jj)
         |SELECT m11, ntot*ntot - g - p + m11 AS m00,
         |       CAST(m11 + ntot*ntot - g - p + m11 AS DOUBLE)
         |         / CAST(ntot*ntot AS DOUBLE) AS rand
         |FROM mm, gg, pp, nn""".stripMargin,

    "q_purity" ->
      s"""WITH $sqlCents8,
         |jj AS (
         |  SELECT CAST(e.label AS BIGINT) AS truth, CAST(a.cluster AS BIGINT) AS pred
         |  FROM embeddings e JOIN a ON a.vec_id = e.vec_id
         |),
         |cells AS (SELECT truth, pred, count(*) AS n FROM jj GROUP BY 1, 2),
         |per AS (SELECT pred, max(n) AS mx, sum(n) AS ns FROM cells GROUP BY pred)
         |SELECT CAST(sum(mx) AS BIGINT) AS correct, CAST(sum(ns) AS BIGINT) AS n,
         |       CAST(sum(mx) AS DOUBLE) / CAST(sum(ns) AS DOUBLE) AS purity
         |FROM per""".stripMargin,

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

    "q_source_stats" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       count(DISTINCT lang) AS n_langs,
        |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM documents GROUP BY source""".stripMargin,

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
         |FROM pt JOIN ci ON pt.arm = ci.arm""".stripMargin
    },

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

    // NULLS FIRST pins DuckDB to Spark's ASC-window default, so a
    // NULL-valued row (cumeDistByKey keeps them, null-safe join)
    // would get the same cd = nulls_in_key / rows_in_key both sides.
    "q_cume_dist" ->
      """SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |       cume_dist() OVER (PARTITION BY event_type
        |                         ORDER BY CAST(round(value * 100) AS BIGINT)
        |                           NULLS FIRST) AS cd
        |FROM events""".stripMargin,

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

    "q_skew_report" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |       CAST((cnt + 999) // 1000 AS BIGINT) AS salt
        |FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 20""".stripMargin,

    "q_kwic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l,
        |             unnest([{'p': i, 't': l[i]} for i in range(1, len(l) + 1)]) AS x
        |      FROM t)
        |SELECT doc_id, CAST(x.p AS BIGINT) AS pos,
        |       coalesce(array_to_string(l[greatest(x.p - 3, 1):x.p - 1], ' '), '')
        |         AS left_ctx,
        |       coalesce(array_to_string(l[x.p + 1:least(x.p + 3, len(l))], ' '), '')
        |         AS right_ctx
        |FROM p WHERE x.t = 'spark'""".stripMargin,

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

    "q_engagement" ->
      """WITH ud AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |            FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(day) AS dmax FROM ud),
        |act AS (SELECT user_id, CAST(count(*) AS BIGINT) AS days_active
        |        FROM ud CROSS JOIN mx WHERE day > dmax - 28 GROUP BY 1)
        |SELECT days_active, CAST(count(*) AS BIGINT) AS n_users
        |FROM act GROUP BY 1""".stripMargin,

    "q_bfs_dist" ->
      s"""WITH RECURSIVE $sqlNearDupEdges,
         |seeds AS (SELECT DISTINCT src AS id FROM edges WHERE src % 7 = 0),
         |walk(id, d) AS (
         |  SELECT id, 0 FROM seeds
         |  UNION
         |  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.id WHERE w.d < 4
         |)
         |SELECT id, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY id""".stripMargin,

    // per-seed walk (seed carried through the recursion), min per
    // (id, seed), then the exact-long closeness fold
    "q_closeness" ->
      s"""WITH RECURSIVE $sqlNearDupEdges,
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |sd AS (SELECT id FROM nodes ORDER BY id LIMIT 5),
         |walk(id, seed, d) AS (
         |  SELECT id, id, 0 FROM sd
         |  UNION
         |  SELECT e.dst, w.seed, w.d + 1
         |  FROM walk w JOIN edges e ON e.src = w.id WHERE w.d < 4
         |),
         |md AS (SELECT id, seed, min(d) AS d FROM walk GROUP BY 1, 2)
         |SELECT id, CAST(count(*) AS BIGINT) AS n_reached,
         |       CAST(sum(d) AS BIGINT) AS sum_dist,
         |       CASE WHEN sum(d) > 0
         |            THEN CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE) END AS closeness
         |FROM md GROUP BY id""".stripMargin,

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

    // identical closure to q_components: the star alternation must
    // land on the same min-id labels as min-label propagation
    "q_components_star" ->
      s"""WITH $sqlNearDupReach
         |SELECT id, min(comp) AS component FROM reach GROUP BY id""".stripMargin,

    "q_assortativity" ->
      s"""WITH $sqlNearDupEdges,
         |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |      FROM edges WHERE src <> dst),
         |s AS (SELECT a, b FROM u UNION ALL SELECT b, a FROM u),
         |deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d FROM s GROUP BY a),
         |j AS (SELECT x.d AS da, y.d AS db FROM s
         |      JOIN deg x ON x.id = s.a JOIN deg y ON y.id = s.b),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS m2,
         |              CAST(sum(da * db) AS BIGINT) AS sxy,
         |              CAST(sum(da) AS BIGINT) AS sx,
         |              CAST(sum(db) AS BIGINT) AS sy,
         |              CAST(sum(da * da) AS BIGINT) AS sxx,
         |              CAST(sum(db * db) AS BIGINT) AS syy
         |       FROM j)
         |SELECT m2 // 2 AS m_edges,
         |       CASE WHEN m2 > 0
         |                 AND CAST(m2 * sxx - sx * sx AS DOUBLE) > 0
         |                 AND CAST(m2 * syy - sy * sy AS DOUBLE) > 0
         |            THEN CAST(m2 * sxy - sx * sy AS DOUBLE)
         |                 / sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)
         |                        * CAST(m2 * syy - sy * sy AS DOUBLE)) END AS r
         |FROM ag""".stripMargin,

    "q_cooccur" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u, event_type AS i FROM events),
        |p AS (SELECT a.i AS item1, b.i AS item2
        |      FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i)
        |SELECT item1, item2, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY item1, item2 HAVING count(*) >= 2""".stripMargin,

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

    "q_link_pred" ->
      s"""WITH $sqlWinnowMins,
         |fp0 AS (SELECT doc_id, unnest(list_distinct(mins)) AS f FROM mins),
         |hot AS (SELECT f FROM fp0 GROUP BY f HAVING count(*) > 100),
         |fp AS (SELECT * FROM fp0 WHERE f NOT IN (SELECT f FROM hot)),
         |edges AS (SELECT x.doc_id AS src, y.doc_id AS dst
         |          FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2 HAVING count(*) >= 10),
         |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |      FROM edges WHERE src <> dst),
         |s AS (SELECT a, b FROM u UNION ALL SELECT b, a FROM u),
         |deg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d FROM s GROUP BY a),
         |w AS (SELECT s1.b AS u2, s2.b AS v2, CAST(count(*) AS BIGINT) AS cn
         |      FROM s s1 JOIN s s2 ON s1.a = s2.a AND s1.b < s2.b
         |      GROUP BY 1, 2 HAVING count(*) >= 1),
         |na AS (SELECT w.* FROM w LEFT JOIN u ON u.a = w.u2 AND u.b = w.v2
         |       WHERE u.a IS NULL)
         |SELECT na.u2 AS id1, na.v2 AS id2, na.cn,
         |       CAST(na.cn AS DOUBLE) / (x.d + y.d - na.cn) AS jaccard
         |FROM na JOIN deg x ON x.id = na.u2 JOIN deg y ON y.id = na.v2""".stripMargin,

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

    "q_kanon" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |       CAST(count(*) AS BIGINT) AS class_size,
        |       count(*) < 5 AS at_risk
        |FROM customer GROUP BY 1, 2, 3""".stripMargin,

    "q_bloom_decontam" ->
      """SELECT d.doc_id, d.source FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents p
        |                  WHERE p.doc_id % 23 = 0 AND p.text = d.text)""".stripMargin,

    "q_kcore" ->
      s"""WITH $sqlNearDupEdges,
         |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |       FROM edges WHERE src <> dst),
         |s0 AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
         |d1 AS (SELECT a, count(*) AS c FROM s0 GROUP BY a),
         |k1 AS (SELECT a FROM d1 WHERE c >= 2),
         |s1 AS (SELECT s.a, s.b FROM s0 s
         |       JOIN k1 x ON s.a = x.a JOIN k1 y ON s.b = y.a),
         |d2 AS (SELECT a, count(*) AS c FROM s1 GROUP BY a),
         |k2 AS (SELECT a FROM d2 WHERE c >= 2),
         |s2 AS (SELECT s.a, s.b FROM s1 s
         |       JOIN k2 x ON s.a = x.a JOIN k2 y ON s.b = y.a),
         |d3 AS (SELECT a, count(*) AS c FROM s2 GROUP BY a),
         |k3 AS (SELECT a FROM d3 WHERE c >= 2),
         |s3 AS (SELECT s.a, s.b FROM s2 s
         |       JOIN k3 x ON s.a = x.a JOIN k3 y ON s.b = y.a)
         |SELECT a AS id, CAST(count(*) AS BIGINT) AS core_degree
         |FROM s3 GROUP BY a""".stripMargin,

    "q_triangles" ->
      s"""WITH $sqlNearDupEdges,
         |undup AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |          FROM edges WHERE src <> dst),
         |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
         |          SELECT a AS id FROM undup UNION ALL SELECT b FROM undup)
         |        GROUP BY id),
         |o AS (
         |  SELECT CASE WHEN da.degree < db.degree
         |                   OR (da.degree = db.degree AND u.a < u.b)
         |              THEN u.a ELSE u.b END AS lo,
         |         CASE WHEN da.degree < db.degree
         |                   OR (da.degree = db.degree AND u.a < u.b)
         |              THEN u.b ELSE u.a END AS hi
         |  FROM undup u
         |  JOIN deg da ON da.id = u.a
         |  JOIN deg db ON db.id = u.b),
         |w AS (SELECT o1.lo, o1.hi AS x, o2.hi AS y
         |      FROM o o1 JOIN o o2 ON o1.lo = o2.lo AND o1.hi < o2.hi),
         |closing AS (SELECT lo AS x, hi AS y FROM o
         |            UNION ALL SELECT hi, lo FROM o),
         |t AS (SELECT w.lo, w.x, w.y
         |      FROM w JOIN closing c ON c.x = w.x AND c.y = w.y),
         |pv AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |         SELECT lo AS id FROM t
         |         UNION ALL SELECT x FROM t
         |         UNION ALL SELECT y FROM t) GROUP BY id)
         |SELECT d.id, d.degree,
         |       COALESCE(pv.triangles, 0) AS triangles,
         |       CASE WHEN d.degree >= 2
         |            THEN CAST(COALESCE(pv.triangles, 0) * 2 AS DOUBLE)
         |                 / (d.degree * (d.degree - 1)) END AS clustering
         |FROM deg d LEFT JOIN pv USING (id)""".stripMargin,

    "q_pagerank" ->
      s"""WITH $sqlNearDupEdges,
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
         |        FROM edges GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
         |       FROM deg CROSS JOIN nn),
         |r1 AS (
         |  SELECT e.dst AS id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
         |           + CAST(0.85 AS DOUBLE) *
         |             list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS pr
         |  FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |  CROSS JOIN nn GROUP BY e.dst, nn.n
         |),
         |r2 AS (
         |  SELECT e.dst AS id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
         |           + CAST(0.85 AS DOUBLE) *
         |             list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS pr
         |  FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |  CROSS JOIN nn GROUP BY e.dst, nn.n
         |),
         |r3 AS (
         |  SELECT e.dst AS id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
         |           + CAST(0.85 AS DOUBLE) *
         |             list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS pr
         |  FROM edges e JOIN r2 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |  CROSS JOIN nn GROUP BY e.dst, nn.n
         |)
         |SELECT r3.id, r3.pr, d.degree FROM r3 JOIN deg d ON d.id = r3.id""".stripMargin,

    // the q_pagerank unroll with the teleport restricted to the 5
    // lowest node ids: s(v) = 1/5 on seeds else 0, pr0 = s, and the
    // per-node teleport term 0.15·s(v) — same sorted-fold exactness
    "q_ppr" ->
      s"""WITH $sqlNearDupEdges,
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
         |        FROM edges GROUP BY src),
         |sd AS (SELECT id FROM deg ORDER BY id LIMIT 5),
         |sv AS (SELECT deg.id, deg.degree,
         |              CASE WHEN sd.id IS NOT NULL
         |                   THEN CAST(1 AS DOUBLE) / 5 ELSE CAST(0 AS DOUBLE) END AS s
         |       FROM deg LEFT JOIN sd ON sd.id = deg.id),
         |r0 AS (SELECT id, s AS pr FROM sv),
         |r1 AS (
         |  SELECT sv.id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * sv.s
         |           + CAST(0.85 AS DOUBLE) * coalesce(m.s, CAST(0 AS DOUBLE)) AS pr
         |  FROM sv LEFT JOIN (
         |    SELECT e.dst AS id,
         |           list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS s
         |    FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |    GROUP BY e.dst) m ON m.id = sv.id
         |),
         |r2 AS (
         |  SELECT sv.id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * sv.s
         |           + CAST(0.85 AS DOUBLE) * coalesce(m.s, CAST(0 AS DOUBLE)) AS pr
         |  FROM sv LEFT JOIN (
         |    SELECT e.dst AS id,
         |           list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS s
         |    FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |    GROUP BY e.dst) m ON m.id = sv.id
         |),
         |r3 AS (
         |  SELECT sv.id,
         |         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * sv.s
         |           + CAST(0.85 AS DOUBLE) * coalesce(m.s, CAST(0 AS DOUBLE)) AS pr
         |  FROM sv LEFT JOIN (
         |    SELECT e.dst AS id,
         |           list_reduce(list_sort(list(r.pr / d.degree)), (acc, x) -> acc + x) AS s
         |    FROM edges e JOIN r2 r ON r.id = e.src JOIN deg d ON d.id = e.src
         |    GROUP BY e.dst) m ON m.id = sv.id
         |)
         |SELECT r3.id, r3.pr, d.degree FROM r3 JOIN deg d ON d.id = r3.id""".stripMargin,

    "q_degree_hist" ->
      s"""WITH $sqlNearDupEdges,
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree
         |        FROM edges GROUP BY src)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY degree""".stripMargin,

    "q_davies_bouldin" ->
      s"""WITH $sqlCents8,
         |own AS (
         |  SELECT a.vec_id, a.cluster,
         |         min(CASE WHEN d.cid = a.cluster THEN d.dist END) AS d2
         |  FROM d JOIN a USING (vec_id) GROUP BY a.vec_id, a.cluster
         |),
         |s AS (
         |  SELECT cluster,
         |         list_reduce(list_sort(list(sqrt(d2))), (acc, e) -> acc + e) / count(*) AS s
         |  FROM own GROUP BY cluster
         |),
         |cd AS (
         |  SELECT c1.cid AS i, c2.cid AS j,
         |         sqrt(list_sum(list_transform(list_zip(c1.cvec, c2.cvec),
         |                                      p -> (p[1]-p[2])*(p[1]-p[2])))) AS dc
         |  FROM c c1 JOIN c c2 ON c1.cid <> c2.cid
         |),
         |r AS (
         |  SELECT s1.cluster AS i, max((s1.s + s2.s) / cd.dc) AS r
         |  FROM s s1 JOIN cd ON cd.i = s1.cluster JOIN s s2 ON s2.cluster = cd.j
         |  GROUP BY s1.cluster
         |),
         |agg AS (SELECT list_reduce(list(r ORDER BY i), (acc, e) -> acc + e) AS rsum,
         |               CAST(count(*) AS BIGINT) AS kp
         |        FROM r),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM own)
         |SELECT CASE WHEN kp >= 2 THEN rsum / kp END AS db, kp AS k_present, tot.n
         |FROM agg CROSS JOIN tot""".stripMargin,

    // op order mirrors bm25Score exactly: rational idf, k1=1.2,
    // b=0.75 (1-b = 0.25 and 0.75 are dyadic — exact doubles)
    "q_search_topk" -> {
      // mirrors searchTopK: allTerms order = first appearance across
      // the three probe queries; per-query score = left-assoc sum
      val terms = Seq("join", "hash", "merge", "scan", "filter",
        "stream", "window", "batch")
      def ts(i: Int): String =
        s"""(CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)
           |      * ((CAST(tf$i AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
           |         / (CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE)
           |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
           |               * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(",\n       ")
      val dfCols = terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
        .mkString(",\n       ")
      def qs(is: Int*): String = is.map(ts).mkString("\n  + ")
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         |      $tfCols FROM base),
         |st AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |       CAST(count(*) AS BIGINT) AS n,
         |       $dfCols FROM t),
         |sc AS (
         |  SELECT doc_id, 'q_joins' AS query_id, ${qs(0, 1, 2)} AS score
         |  FROM t CROSS JOIN st
         |  UNION ALL
         |  SELECT doc_id, 'q_scans', ${qs(3, 4)} FROM t CROSS JOIN st
         |  UNION ALL
         |  SELECT doc_id, 'q_streams', ${qs(5, 6, 7)} FROM t CROSS JOIN st),
         |r AS (SELECT query_id, doc_id, score,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |               ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM sc WHERE score > 0)
         |SELECT query_id, rank, doc_id, score FROM r WHERE rank <= 10""".stripMargin
    },

    "q_bm25" ->
      s"""WITH $sqlBm25Ctes
         |SELECT doc_id, dl,
         |    $sqlBm25Expr AS bm25
         |FROM t CROSS JOIN st""".stripMargin,

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

    "q_skew_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |       CAST(sum(d.user_events) AS BIGINT) AS sum_ue
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY 1""".stripMargin,

    "q_sssp" ->
      s"""WITH RECURSIVE $sqlNearDupEdges,
         |wpairs AS (SELECT id1, id2, CAST(round((1 - sim) * 1000) AS BIGINT) + 1 AS w
         |           FROM simpairs WHERE sim >= 0.5),
         |wedges AS (
         |  SELECT id1 AS src, id2 AS dst, w FROM wpairs
         |  UNION
         |  SELECT id2 AS src, id1 AS dst, w FROM wpairs
         |),
         |sseeds AS (SELECT DISTINCT src AS id FROM wedges WHERE src % 7 = 0),
         |walk(id, cost, hops) AS (
         |  SELECT id, CAST(0 AS BIGINT), 0 FROM sseeds
         |  UNION
         |  SELECT e.dst, wk.cost + e.w, wk.hops + 1
         |  FROM walk wk JOIN wedges e ON e.src = wk.id WHERE wk.hops < 4
         |)
         |SELECT id, min(cost) AS dist FROM walk GROUP BY id""".stripMargin,

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

    "q_ngram_quality" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS gram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |),
        |cnt AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY gram),
        |per AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(sum(c.c) AS BIGINT) AS sum_freq
        |  FROM grams g JOIN cnt c USING (gram) GROUP BY g.doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(p.n_grams, 0) AS n_grams,
        |       COALESCE(p.sum_freq, 0) AS sum_freq,
        |       CAST(p.sum_freq AS DOUBLE) / p.n_grams AS avg_freq
        |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,

    "q_boilerplate" ->
      """WITH docs2 AS (
        |  SELECT doc_id,
        |         concat_ws(chr(10), text, 'footer: terms apply',
        |           CASE WHEN doc_id % 3 = 0 THEN 'promo: subscribe now' END) AS text
        |  FROM documents
        |),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
        |lines AS (
        |  SELECT doc_id, i AS pos, l[i] AS line
        |  FROM ls, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
        |),
        |boiler AS (SELECT line FROM lines GROUP BY line
        |           HAVING count(DISTINCT doc_id) >= 50),
        |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)),
        |reb AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
        |         CAST(count(*) AS BIGINT) AS kept_n
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(r.clean, '') AS clean_text,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT)
        |         - COALESCE(r.kept_n, 0) AS n_dropped
        |FROM docs2 d LEFT JOIN reb r USING (doc_id)""".stripMargin,

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

    "q_inverted" ->
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |       array_to_string(list_transform((list_sort(list(doc_id)))[1:100],
        |                                      v -> CAST(v AS VARCHAR)), ',') AS postings
        |FROM t GROUP BY term""".stripMargin,

    "q_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
        |       CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((source), (lang))""".stripMargin,

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

    "q_source_sim" ->
      """WITH tf AS (
        |  SELECT source AS k, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT k, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1),
        |d AS (SELECT a.k AS source1, b.k AS source2,
        |             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |      FROM tf a JOIN tf b ON a.term = b.term AND a.k < b.k
        |      GROUP BY 1, 2)
        |SELECT d.source1, d.source2, d.dot,
        |       CAST(d.dot AS DOUBLE)
        |         / (sqrt(CAST(n1.n2 AS DOUBLE)) * sqrt(CAST(n2.n2 AS DOUBLE))) AS cosine
        |FROM d JOIN n n1 ON n1.k = d.source1
        |       JOIN n n2 ON n2.k = d.source2""".stripMargin,

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

    "q_label_prop" ->
      s"""WITH $sqlNearDupEdges,
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |l0 AS (SELECT id, id AS label FROM nodes),
         |v1 AS (SELECT e.dst AS id, l.label, count(*) AS c
         |       FROM edges e JOIN l0 l ON l.id = e.src GROUP BY e.dst, l.label),
         |l1 AS (SELECT id, label FROM (
         |         SELECT id, label,
         |                row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
         |         FROM v1) WHERE rn = 1),
         |v2 AS (SELECT e.dst AS id, l.label, count(*) AS c
         |       FROM edges e JOIN l1 l ON l.id = e.src GROUP BY e.dst, l.label),
         |l2 AS (SELECT id, label FROM (
         |         SELECT id, label,
         |                row_number() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
         |         FROM v2) WHERE rn = 1)
         |SELECT id, label FROM l2""".stripMargin,

    "q_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |big AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |bcall AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
        |          FROM big GROUP BY w1, w2),
        |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM bcall),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c_ab,
        |         (CAST(b.c_ab AS DOUBLE) * CAST(nb.n AS DOUBLE))
        |           / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |  FROM bcall b JOIN uc u1 ON u1.w = b.w1 JOIN uc u2 ON u2.w = b.w2
        |  CROSS JOIN nb WHERE b.c_ab >= 5
        |)
        |SELECT w1, w2, c_ab, lift, rank FROM (
        |  SELECT w1, w2, c_ab, lift,
        |         CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 100""".stripMargin,

    "q_distinct_terms" ->
      """WITH toks AS (
        |  SELECT source, w AS term
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0
        |),
        |tfg AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf_g
        |        FROM toks GROUP BY 1, 2),
        |tf AS (SELECT term, CAST(sum(tf_g) AS BIGINT) AS tf FROM tfg GROUP BY term),
        |tg AS (SELECT source, CAST(sum(tf_g) AS BIGINT) AS tg FROM tfg GROUP BY 1),
        |t AS (SELECT CAST(sum(tg) AS BIGINT) AS t FROM tg),
        |scored AS (
        |  SELECT g.source, g.term, g.tf_g,
        |         (CAST(g.tf_g AS DOUBLE) * CAST(t.t - tg.tg AS DOUBLE))
        |           / (CAST(tf.tf - g.tf_g + 1 AS DOUBLE) * CAST(tg.tg AS DOUBLE)) AS lift
        |  FROM tfg g
        |  JOIN tf ON tf.term = g.term
        |  JOIN tg ON tg.source = g.source
        |  CROSS JOIN t
        |)
        |SELECT source, term, tf_g, lift, rank FROM (
        |  SELECT source, term, tf_g, lift,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY lift DESC, term) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 10""".stripMargin,

    "q_bpe_pairs" ->
      s"""WITH ${sqlBpeChain(0)},
         |p1 AS (
         |  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([ss[i] || ' ' || ss[i+1] for i in range(1, len(ss))]) AS pr
         |        FROM (SELECT string_split(sym, ' ') AS ss, cnt FROM w0))
         |  GROUP BY pr
         |)
         |SELECT pair, pair_count, rank FROM (
         |  SELECT pair, c AS pair_count,
         |         CAST(row_number() OVER (ORDER BY c DESC, pair) AS BIGINT) AS rank
         |  FROM p1) WHERE rank <= 200""".stripMargin,

    "q_bpe_merges" ->
      s"""WITH ${sqlBpeChain(6)}
         |${(1 to 6).map(r =>
             s"SELECT CAST($r AS BIGINT) AS step, pair, c AS pair_count FROM m$r")
             .mkString("", "\nUNION ALL\n", "")}""".stripMargin,

    "q_bpe_encode" ->
      s"""WITH ${sqlBpeChain(6)},
         |d0 AS (
         |  SELECT doc_id, list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
         |           w -> array_to_string([w[i] for i in range(1, len(w)+1)], ' ')) AS syms
         |  FROM documents
         |),
         |${(1 to 6).map(r =>
             s"""d$r AS (
                |  SELECT d.doc_id, list_transform(d.syms, s -> ${sqlBpeFold("string_split(s, ' ')")}) AS syms
                |  FROM d${r - 1} d CROSS JOIN m$r m
                |)""".stripMargin).mkString(",\n")}
         |SELECT doc_id, bpe,
         |       CASE WHEN bpe = '' THEN CAST(0 AS BIGINT)
         |            ELSE CAST(len(string_split(bpe, ' ')) AS BIGINT) END AS n_subwords
         |FROM (SELECT doc_id, array_to_string(syms, ' ') AS bpe FROM d6)""".stripMargin,

    "q_bpe_compression" ->
      s"""WITH ${sqlBpeChain(6)},
         |d0 AS (
         |  SELECT doc_id, list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
         |           w -> array_to_string([w[i] for i in range(1, len(w)+1)], ' ')) AS syms
         |  FROM documents
         |),
         |${(1 to 6).map(r =>
             s"""d$r AS (
                |  SELECT d.doc_id, list_transform(d.syms, s -> ${sqlBpeFold("string_split(s, ' ')")}) AS syms
                |  FROM d${r - 1} d CROSS JOIN m$r m
                |)""".stripMargin).mkString(",\n")},
         |enc AS (
         |  SELECT doc_id,
         |         CASE WHEN bpe = '' THEN CAST(0 AS BIGINT)
         |              ELSE CAST(len(string_split(bpe, ' ')) AS BIGINT) END AS n_subwords
         |  FROM (SELECT doc_id, array_to_string(syms, ' ') AS bpe FROM d6)
         |)
         |SELECT doc.source, count(*) AS n_docs,
         |       CAST(sum(enc.n_subwords) AS BIGINT) AS n_subwords,
         |       CAST(sum(len(doc.text)) AS BIGINT) AS n_chars,
         |       CAST(CAST(sum(len(doc.text)) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(sum(enc.n_subwords) AS BIGINT) AS DOUBLE) AS chars_per_subword
         |FROM documents doc JOIN enc USING (doc_id)
         |GROUP BY doc.source""".stripMargin,

    "q_lm_score" ->
      """WITH tr AS (SELECT text FROM documents WHERE doc_id % 4 <> 0),
        |cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
        |trt AS (SELECT string_split(text, ' ') AS t FROM tr),
        |trb AS (SELECT unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
        |        FROM trt),
        |cb AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c FROM trb GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cu FROM cb GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM tr)),
        |ct AS (SELECT doc_id, string_split(text, ' ') AS t FROM cand),
        |cbi AS (SELECT doc_id,
        |               unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
        |        FROM ct),
        |sc AS (SELECT x.doc_id,
        |              (CAST(coalesce(cu.cu, 0) AS DOUBLE) + vv.v) /
        |              (CAST(coalesce(cb.c, 0) AS DOUBLE) + 1.0) AS inv
        |       FROM (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM cbi) x
        |       LEFT JOIN cb USING (w1, w2) LEFT JOIN cu USING (w1) CROSS JOIN vv),
        |per AS (SELECT doc_id, count(*) AS n_bigrams,
        |               list_reduce(list_sort(list(inv)), (a, b) -> a + b) AS s
        |        FROM sc GROUP BY 1)
        |SELECT c.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
        |       per.s / per.n_bigrams AS mean_inv_p
        |FROM cand c LEFT JOIN per USING (doc_id)""".stripMargin,

    "q_keywords" ->
      """WITH tf AS (SELECT doc_id, tok AS term, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |                  FROM documents) GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |sc AS (SELECT doc_id, term,
        |              CAST(tf AS DOUBLE) *
        |                ((nn.n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) AS score
        |       FROM tf JOIN dft USING (term) CROSS JOIN nn)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, score FROM (
        |  SELECT doc_id, term, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM sc)
        |WHERE rn <= 5""".stripMargin,

    "q_feat_hash" ->
      """WITH t AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
        |           FROM documents),
        |s AS (SELECT doc_id,
        |             CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) % 64 AS bucket,
        |             1 - 2 * (CAST(concat('0x', substr(h, 9, 1)) AS BIGINT) % 2) AS sign
        |      FROM t)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS weight
        |FROM s GROUP BY 1, 2""".stripMargin,

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

    "q_heaps" ->
      """WITH fs AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS first FROM
        |            (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
        |             FROM documents) GROUP BY 1),
        |v AS (SELECT CAST(sum(CASE WHEN first <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS v500,
        |             CAST(sum(CASE WHEN first <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS v1000,
        |             CAST(sum(CASE WHEN first <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS v2000,
        |             CAST(sum(CASE WHEN first <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS v4000
        |      FROM fs),
        |d AS (SELECT CAST(sum(CASE WHEN doc_id <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS d500,
        |             CAST(sum(CASE WHEN doc_id <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS d1000,
        |             CAST(sum(CASE WHEN doc_id <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS d2000,
        |             CAST(sum(CASE WHEN doc_id <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS d4000
        |      FROM documents)
        |SELECT CAST(500 AS BIGINT) AS checkpoint, d500 AS n_docs, v500 AS vocab FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 1000, d1000, v1000 FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 2000, d2000, v2000 FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 4000, d4000, v4000 FROM v CROSS JOIN d""".stripMargin,

    "q_top_per_key" ->
      """SELECT source, CAST(doc_id AS BIGINT) AS id, CAST(rn AS BIGINT) AS rank,
        |       CAST(n_chars AS DOUBLE) AS score
        |FROM (SELECT source, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 5""".stripMargin,

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

    "q_label_complete" ->
      s"""WITH $sqlNearDupEdges,
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |sd AS (SELECT doc_id AS id, lang AS seed FROM documents WHERE doc_id % 3 = 0),
         |l0 AS (SELECT n.id, sd.seed AS label,
         |              CAST(CASE WHEN sd.seed IS NOT NULL THEN 1 ELSE 0 END AS INT)
         |                AS is_seed
         |       FROM nodes n LEFT JOIN sd ON sd.id = n.id),
         |v1 AS (SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS c
         |       FROM edges e JOIN l0 l ON l.id = e.src
         |       WHERE l.label IS NOT NULL GROUP BY 1, 2),
         |w1 AS (SELECT dst AS id, label FROM (
         |         SELECT dst, label,
         |                row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
         |         FROM v1) WHERE rn = 1),
         |l1 AS (SELECT l.id,
         |              CASE WHEN l.is_seed = 1 THEN l.label
         |                   ELSE coalesce(w.label, l.label) END AS label, l.is_seed
         |       FROM l0 l LEFT JOIN w1 w ON w.id = l.id),
         |v2 AS (SELECT e.dst, l.label, CAST(count(*) AS BIGINT) AS c
         |       FROM edges e JOIN l1 l ON l.id = e.src
         |       WHERE l.label IS NOT NULL GROUP BY 1, 2),
         |w2 AS (SELECT dst AS id, label FROM (
         |         SELECT dst, label,
         |                row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn
         |         FROM v2) WHERE rn = 1),
         |l2 AS (SELECT l.id,
         |              CASE WHEN l.is_seed = 1 THEN l.label
         |                   ELSE coalesce(w.label, l.label) END AS label, l.is_seed
         |       FROM l1 l LEFT JOIN w2 w ON w.id = l.id)
         |SELECT id, label, is_seed FROM l2""".stripMargin,

    "q_hits" ->
      """WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |           WHERE o_custkey * 2 <> l_partkey * 2 + 1),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |a1s AS (SELECT e.dst AS id,
        |               list_reduce(list_sort(list(CAST(1 AS DOUBLE))), (x, y) -> x + y) AS s
        |        FROM e GROUP BY e.dst),
        |a1 AS (SELECT n.id, coalesce(a1s.s, CAST(0 AS DOUBLE)) AS auth
        |       FROM nodes n LEFT JOIN a1s ON a1s.id = n.id),
        |h1s AS (SELECT e.src AS id, list_reduce(list_sort(list(a.auth)), (x, y) -> x + y) AS s
        |        FROM e JOIN a1 a ON a.id = e.dst GROUP BY e.src),
        |h1 AS (SELECT n.id, coalesce(h1s.s, CAST(0 AS DOUBLE)) AS hub
        |       FROM nodes n LEFT JOIN h1s ON h1s.id = n.id),
        |a2s AS (SELECT e.dst AS id, list_reduce(list_sort(list(h.hub)), (x, y) -> x + y) AS s
        |        FROM e JOIN h1 h ON h.id = e.src GROUP BY e.dst),
        |a2 AS (SELECT n.id, coalesce(a2s.s, CAST(0 AS DOUBLE)) AS auth
        |       FROM nodes n LEFT JOIN a2s ON a2s.id = n.id),
        |h2s AS (SELECT e.src AS id, list_reduce(list_sort(list(a.auth)), (x, y) -> x + y) AS s
        |        FROM e JOIN a2 a ON a.id = e.dst GROUP BY e.src),
        |h2 AS (SELECT n.id, coalesce(h2s.s, CAST(0 AS DOUBLE)) AS hub
        |       FROM nodes n LEFT JOIN h2s ON h2s.id = n.id)
        |SELECT a2.id, a2.auth, h2.hub FROM a2 JOIN h2 ON h2.id = a2.id""".stripMargin,

    "q_kfold" ->
      """SELECT doc_id, source,
        |       least(CAST(floor(CAST(concat('0x', substr(md5(source), 1, 8)) AS BIGINT)
        |                        / 4294967296.0 * 5) AS BIGINT), 4) AS fold
        |FROM documents""".stripMargin,

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
         |LEFT JOIN hits h USING (probe_id)""".stripMargin
  )
}
