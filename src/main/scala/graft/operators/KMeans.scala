package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorKernels, VectorMeanAgg, VectorOps}

/** Spark-native Lloyd's K-Means — the reference engine's entire reason
  * to exist (`KMeans.java` in rohitseb/K-Means-Hadoop), re-expressed
  * declaratively.
  *
  * Mapping from the reference (SURVEY.md §2):
  *  - centroid side-file read by every map task (`KMeans.java:40-74`)
  *    → a k×d literal embedded in the plan (tiny; ships once per task
  *    like a broadcast, no per-task HDFS read);
  *  - per-row argmin over centroids (`KMeans.java:98-113`)
  *    → `array_min(transform(centroids, struct(dist, cid)))` — a pure
  *    Catalyst higher-order-function fold that stays in whole-stage
  *    codegen; tie-break = lowest centroid id (the reference's de
  *    facto HashMap-order behavior, SURVEY.md §7.4.2);
  *  - combiner + reducer mean (`KMeans.java:128-198`)
  *    → one hash aggregation with automatic partial (map-side) mode:
  *    each task ships k×(d+1) doubles, NOT all rows — the reference's
  *    combiner only concatenated lists, so its shuffle was O(rows);
  *  - iterative driver with HDFS file-swap (`KMeans.java:220-282`)
  *    → a driver loop over a cached DataFrame; only k×d doubles are
  *    ever collected. The input is read once and cached (the
  *    reference re-read the full input from HDFS every iteration).
  *
  * At cluster scale each iteration is: one scan of the cached input
  * (no shuffle for assignment — it's a map), one partial-agg exchange
  * of k×(d+1)×numPartitions doubles, one tiny collect. No stage is
  * O(rows) over the network, so the loop scales linearly with data on
  * executors and constant on the driver.
  */
object KMeans {

  /** Centroid set: (clusterId, vector), clusterId sorted ascending. */
  type Centroids = Array[(Int, Array[Double])]

  sealed trait Init
  /** Explicit row ids, renumbered 1..k in argument order
    * (`KMeans.java:597-606`). */
  final case class ExplicitIds(ids: Seq[Long]) extends Init
  /** Seeded uniform row sample, renumbered 1..k. Replaces the
    * reference's biased `Math.random()*10000 % n` draw
    * (`KMeans.java:584-592`) — a defect, not a semantic (SURVEY §7.5). */
  final case class RandomRows(k: Int, seed: Long) extends Init
  /** k rows with the lowest ids, renumbered 1..k. Fully deterministic
    * (no seed), which makes it the oracle-checkable init. */
  final case class FirstK(k: Int) extends Init
  /** k-means++ (D²-weighted) seeding: each next centroid is drawn with
    * probability ∝ squared distance to the nearest chosen one — the
    * init that makes Lloyd's convergence fast and stable in practice.
    * Deterministic AND partitioning-independent: the randomness is an
    * md5-derived uniform per (seed, round, id), and D²-weighted
    * sampling uses the exponential-race trick (argmin of -ln(u)/d²),
    * so re-running on a re-partitioned table picks the same seeds —
    * unlike rand()-based sampling. k passes over the cached input. */
  final case class PlusPlus(k: Int, seed: Long) extends Init

  /** k-means‖ (Bahmani et al., "Scalable K-Means++", VLDB'12 —
    * public paper): the oversampling init for LARGE k. PlusPlus
    * above needs k sequential passes (one per centroid); this takes
    * `rounds` passes TOTAL, each sampling every point independently
    * with probability min(1, l·d²(x,C)/cost(C)) — expected ~l new
    * candidates per round, drawn in one distributed scan — then
    * weights the ~rounds·l candidates by assignment counts and
    * reduces them to k with a driver-side weighted ++ race (the
    * candidate set is k·rounds rows, broadcast-sized, never the
    * corpus). l = 0 means the paper's default 2k.
    *
    * Determinism: every coin is an md5 unit of (seed, round, id) and
    * the driver-side reduction races on md5 units too, so reruns are
    * bit-identical. Caveat, stated honestly: unlike PlusPlus (whose
    * race avoids any global sum), the acceptance probability divides
    * by cost(C) — a distributed FP sum whose last-ulp value depends
    * on partition order, so a coin EXACTLY at the boundary could in
    * principle flip across different partitionings (~2⁻⁵⁰ per
    * point·round). Same-partitioning reruns are exactly stable.
    *
    * sortedCost = true computes each round's cost(C) with the
    * sorted-fold contract (foldSum over array_sort(collect_list)) —
    * bit-deterministic under ANY partitioning, which makes the whole
    * init (candidate set AND final k) oracle-replayable in SQL
    * (q_kmeans_parallel). The fold funnels the per-point d² column
    * through one task, so it is the PARITY mode; the default
    * partial-agg sum is the 100 TB scale path. */
  final case class Parallel(k: Int, seed: Long, rounds: Int = 5, l: Int = 0,
                            sortedCost: Boolean = false) extends Init

  /** Fit telemetry (op 16): iteration count matches the reference's
    * printed job count (`KMeans.java:283`); costHistory is the WCSS
    * after each Lloyd step when fit(trackCost = true) — empty
    * otherwise (it costs one extra scan per iteration). */
  final case class KMeansModel(centroids: Centroids, iterations: Int, converged: Boolean,
                               costHistory: Seq[Double] = Nil)

  /** Pure-Scala Euclidean distance (driver-side convergence math),
    * same formula as `KMeans.java:116-122`. */
  def euclideanLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private[operators] def centLit(cents: Centroids): Column =
    typedlit(cents.sortBy(_._1).map { case (cid, v) => (cid, v.toSeq) }.toSeq)

  /** Flat ascending-cid centroid arrays for the native kernels;
    * requires one uniform dimensionality (every real centroid set
    * has one — seeds are rows of one table). */
  private[operators] def flatCents(cents: Centroids): (Array[Int], Array[Double], Int) = {
    val sorted = cents.sortBy(_._1)
    val d = sorted.head._2.length
    val flat = new Array[Double](sorted.length * d)
    sorted.zipWithIndex.foreach { case ((_, v), i) =>
      require(v.length == d,
        s"centroid dims differ: ${v.length} vs $d — one uniform d required")
      System.arraycopy(v, 0, flat, i * d, d)
    }
    (sorted.map(_._1), flat, d)
  }

  /** Nearest-centroid id for a feature column (array<double>): one
    * native primitive argmin per row (NearestCentroidExpr) with the
    * deterministic lowest-id tie-break — bit-equal to the array_min-
    * over-struct(dist, cid) HOF kept below as the spec-pinned twin,
    * but inside whole-stage codegen with zero per-row allocations
    * (the HOF chain sat outside codegen — the same 16× per-row cost
    * the PQ kernels removed, here in every Lloyd pass). No UDF, no
    * shuffle. */
  def assignColumn(cents: Centroids, feat: Column): Column = {
    if (cents.isEmpty) return assignColumnHof(cents, feat)
    val (cids, flat, d) = flatCents(cents)
    VectorKernels.nearestCentroidCol(feat, cids, flat, d)
  }

  /** The HOF twin of assignColumn (spec-pinned in KMeansSpec). */
  private[graft] def assignColumnHof(cents: Centroids, feat: Column): Column =
    array_min(transform(centLit(cents), c =>
      struct(
        VectorOps.sqDist(feat, c.getField("_2")).as("dist"),
        c.getField("_1").as("cid")))).getField("cid")

  /** Squared distance to the nearest centroid (per-row cost term) —
    * native selection kernel, array_min-of-sqDists twin below. */
  def minSqDistColumn(cents: Centroids, feat: Column): Column = {
    if (cents.isEmpty) return minSqDistColumnHof(cents, feat)
    val (_, flat, d) = flatCents(cents)
    VectorKernels.minSqDistToSetCol(feat, flat, d)
  }

  /** The HOF twin of minSqDistColumn (spec-pinned in KMeansSpec). */
  private[graft] def minSqDistColumnHof(cents: Centroids, feat: Column): Column =
    array_min(transform(centLit(cents), c =>
      VectorOps.sqDist(feat, c.getField("_2"))))

  /** Adds a cluster-assignment column; input feature column may be
    * array<float> or array<double> (cast to double for the math). */
  def assign(df: DataFrame, featCol: String, cents: Centroids,
             outCol: String = "cluster"): DataFrame =
    df.withColumn(outCol, assignColumn(cents, VectorOps.toDouble(col(featCol))))

  /** One Lloyd iteration: assign + per-cluster element-wise mean
    * (reference map/combine/shuffle/reduce, `KMeans.java:78-198`).
    * Empty clusters vanish, exactly like the reference's reducer
    * (SURVEY §7.4.3); pass keepEmpty=true for MLlib-style carry-over. */
  def step(df: DataFrame, featCol: String, cents: Centroids,
           keepEmpty: Boolean = false): Centroids = {
    val assigned = df.select(
      assignColumn(cents, VectorOps.toDouble(col(featCol))).as("cluster"),
      VectorOps.toDouble(col(featCol)).as("f"))
    val next = assigned.groupBy("cluster")
      .agg(VectorMeanAgg.vecMean(col("f")).as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    if (!keepEmpty) next
    else {
      val got = next.map(_._1).toSet
      (next ++ cents.filter(c => !got.contains(c._1))).sortBy(_._1)
    }
  }

  /** Sorted-fold Lloyd step — the oracle-expressible FP-parity twin of
    * step(): per-(cluster, dim) means computed as a sequential left
    * fold over the SORTED group values (see q_centroid_update's
    * determinism contract), bit-identical to DuckDB's
    * `list_reduce(list_sort(list(v)), +)`. The scale path remains
    * step()/VectorMeanAgg (O(k·d·tasks) shuffle); this twin ships the
    * group VALUES (O(rows·d)) and exists so the iterative driver loop
    * (ops 10-11) has a bit-exact cross-engine correctness gate. */
  def stepSortedFold(df: DataFrame, featCol: String, cents: Centroids): Centroids = {
    val assigned = df.select(
      assignColumn(cents, VectorOps.toDouble(col(featCol))).as("cluster"),
      VectorOps.toDouble(col(featCol)).as("f"))
    assigned
      .select(col("cluster"), posexplode(col("f")).as(Seq("pos0", "v")))
      .groupBy(col("cluster"), col("pos0"))
      .agg(collect_list(col("v")).as("vs"))
      .select(col("cluster"), col("pos0"),
        (VectorOps.foldSum(array_sort(col("vs"))) / size(col("vs"))).as("val"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1).toArray
      .map { case (cid, dims) => cid -> dims.sortBy(_._2).map(_._3) }
      .sortBy(_._1)
  }

  /** Per-cluster membership id list (`KMeans.java:471` — the reducer's
    * pipe-joined member-id list, op 13). Output: (cluster, n,
    * member_ids sorted ascending). The reference rendered this into
    * the centroid text format; here it is a first-class table. One
    * O(rows) shuffle on the cluster key; the sorted array makes the
    * output deterministic. */
  def membershipLists(assigned: DataFrame, idCol: String,
                      clusterCol: String = "cluster"): DataFrame =
    assigned.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col(idCol).cast("long"))).as("member_ids"))

  /** Reference convergence predicate (`KMeans.java:291-310`): same
    * cluster-id set AND per-centroid movement <= tol; tol=0.0
    * reproduces the exact-zero test at `KMeans.java:300-304`. A
    * vanished cluster (size mismatch) is never converged. */
  def isConverged(prev: Centroids, curr: Centroids, tol: Double): Boolean =
    prev.length == curr.length &&
      prev.sortBy(_._1).zip(curr.sortBy(_._1)).forall { case ((i1, v1), (i2, v2)) =>
        i1 == i2 && euclideanLocal(v1, v2) <= tol
      }

  def initCentroids(df: DataFrame, idCol: String, featCol: String, init: Init): Centroids = {
    val proj = df.select(col(idCol).cast("long").as("id"),
      VectorOps.toDouble(col(featCol)).as("f"))
    init match {
      case ExplicitIds(ids) =>
        val byId = proj.filter(col("id").isin(ids: _*)).collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
        ids.zipWithIndex.map { case (id, i) =>
          (i + 1) -> byId.getOrElse(id,
            throw new NoSuchElementException(s"initial centroid id $id not in dataset"))
        }.toArray
      case RandomRows(k, seed) =>
        proj.orderBy(rand(seed), col("id")).limit(k).collect().zipWithIndex
          .map { case (r, i) => (i + 1) -> r.getSeq[Double](1).toArray }
      case FirstK(k) =>
        proj.orderBy(col("id")).limit(k).collect().zipWithIndex
          .map { case (r, i) => (i + 1) -> r.getSeq[Double](1).toArray }
      case PlusPlus(k, seed) =>
        val cached = proj.cache()
        try {
          val first = cached
            .withColumn("__u", Sampling.unitFromMd5(concat(lit(s"$seed:0:"), col("id"))))
            .orderBy(col("__u"), col("id")).limit(1).collect()
            .headOption.getOrElse(throw new NoSuchElementException(
              "k-means++: input DataFrame is empty"))
          var chosen = Vector(first.getLong(0) -> first.getSeq[Double](1).toArray)
          for (round <- 1 until k) {
            val soFar: Centroids = chosen.zipWithIndex
              .map { case ((_, v), i) => (i + 1) -> v }.toArray
            // exponential race: argmin of -ln(u)/d² samples ∝ d²;
            // d²=0 rows (already-chosen points) are excluded up front
            // (ANSI mode makes the division fatal, not Infinity)
            val u = Sampling.unitFromMd5(concat(lit(s"$seed:$round:"), col("id")))
            val d2 = minSqDistColumn(soFar, col("f"))
            val key = when(d2 > 0.0, -log(u) / d2)
            val rows = cached.withColumn("__key", key)
              .filter(col("__key").isNotNull && !isnan(col("__key")))
              .orderBy(col("__key"), col("id")).limit(1).collect()
            require(rows.nonEmpty,
              s"k-means++: fewer than $k distinct points in the input")
            chosen = chosen :+ (rows(0).getLong(0) -> rows(0).getSeq[Double](1).toArray)
          }
          chosen.zipWithIndex.map { case ((_, v), i) => (i + 1) -> v }.toArray
        } finally { cached.unpersist(); () }
      case Parallel(k, seed, rounds, l0, sortedCost) =>
        val lFactor = if (l0 > 0) l0 else 2 * k
        require(rounds >= 1, s"k-means parallel needs rounds >= 1, got $rounds")
        val cached = proj.cache()
        try {
          val first = cached
            .withColumn("__u", Sampling.unitFromMd5(concat(lit(s"$seed:0:"), col("id"))))
            .orderBy(col("__u"), col("id")).limit(1).collect()
            .headOption.getOrElse(throw new NoSuchElementException(
              "k-means parallel: input DataFrame is empty"))
          var cands = Vector(first.getLong(0) -> first.getSeq[Double](1).toArray)
          var round = 1
          var exhausted = false
          while (round <= rounds && !exhausted) {
            val soFar: Centroids = cands.zipWithIndex
              .map { case ((_, v), i) => (i + 1) -> v }.toArray
            val d2 = minSqDistColumn(soFar, col("f"))
            // parity mode: partial-agg-order-free cost (see Parallel doc)
            val cost =
              if (sortedCost)
                cached.select(VectorOps.foldSum(array_sort(collect_list(d2))).as("c"))
                  .head().getDouble(0)
              else cached.select(sum(d2).as("c")).head().getDouble(0)
            if (cost <= 0.0) exhausted = true // every point IS a candidate
            else {
              val u = Sampling.unitFromMd5(concat(lit(s"$seed:$round:"), col("id")))
              val p = least(lit(1.0), lit(lFactor.toDouble) * d2 / lit(cost))
              // collect order varies with partitioning — sort by id so
              // the candidate sequence (and the weighted race below)
              // sees a deterministic order
              val newRows = cached.filter(u < p).select(col("id"), col("f"))
                .collect().sortBy(_.getLong(0))
              val seen = cands.map(_._1).toSet
              cands ++= newRows.iterator
                .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
                .filter(c => !seen(c._1))
            }
            round += 1
          }
          require(cands.length >= k,
            s"k-means parallel sampled ${cands.length} candidates < k=$k — " +
              "raise rounds or l (or the input has too few distinct points)")
          // weight candidates by how many corpus points they serve
          val candCents: Centroids = cands.zipWithIndex
            .map { case ((_, v), i) => (i + 1) -> v }.toArray
          val wByCluster = assign(cached, "f", candCents).groupBy("cluster")
            .agg(count(lit(1)).as("w")).collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
          val weighted = cands.zipWithIndex.map { case ((id, v), i) =>
            (id, v, wByCluster.getOrElse(i + 1, 0L).max(1L))
          }.toArray
          weightedPlusPlusLocal(weighted, k, seed)
        } finally { cached.unpersist(); () }
    }
  }

  /** Driver-side md5 unit — the local twin of Sampling.unitFromMd5,
    * for racing over the (small) k-means parallel candidate set. */
  private def unitLocal(s: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def sqDistLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Weighted k-means++ over an in-memory candidate set — the final
    * reduction of the k-means parallel init. Same exponential-race
    * determinism as the distributed PlusPlus: first pick races
    * -ln(u)/w (weighted uniform), each next races -ln(u)/(w·d²);
    * candidates coinciding with a chosen point (d²=0) are excluded. */
  private def weightedPlusPlusLocal(cands: Array[(Long, Array[Double], Long)],
                                    k: Int, seed: Long): Centroids = {
    def u(round: Int, id: Long) = unitLocal(s"$seed:local:$round:$id")
    val first = cands.minBy { case (id, _, w) => (-math.log(u(0, id)) / w, id) }
    var chosen = Vector(first._1 -> first._2)
    var chosenIds = Set(first._1)
    for (round <- 1 until k) {
      val best = cands.iterator
        .filter(c => !chosenIds(c._1))
        .map { case (id, v, w) =>
          val d2 = chosen.iterator.map(c => sqDistLocal(v, c._2)).min
          val key = if (d2 > 0.0) -math.log(u(round, id)) / (w * d2)
                    else Double.PositiveInfinity
          (key, id, v)
        }
        .minBy(t => (t._1, t._2))
      require(!best._1.isInfinite,
        s"k-means parallel: fewer than $k distinct candidate points")
      chosen = chosen :+ (best._2 -> best._3)
      chosenIds += best._2
    }
    chosen.zipWithIndex.map { case ((_, v), i) => (i + 1) -> v }.toArray
  }

  /** Full iterative fit (`KMeans.java:220-282`). maxIter = -1 means
    * run to convergence (`KMeans.java:216,222-225`), with a hard
    * safety cap since exact-zero convergence + distributed FP
    * summation can in principle oscillate (SURVEY §7.4.1).
    * `iterations` counts Lloyd steps executed, matching the
    * reference's printed job count (`KMeans.java:283`). */
  def fit(data: DataFrame, idCol: String, featCol: String, init: Init,
          maxIter: Int, tol: Double = 0.0, keepEmpty: Boolean = false,
          trackCost: Boolean = false): KMeansModel = {
    val proj = data.select(col(idCol),
      VectorOps.toDouble(col(featCol)).as(featCol))
    // init-only (maxIter=0, e.g. PQ's oracle-checkable codebooks):
    // one scan total — caching would cost a materialization to save
    // nothing
    if (maxIter == 0)
      return KMeansModel(initCentroids(proj, idCol, featCol, init), 0, converged = false)
    val df = proj.cache()
    try {
      var cents = initCentroids(df, idCol, featCol, init)
      val cap = if (maxIter < 0) 10000 else maxIter
      var iter = 0
      var converged = false
      val costs = Seq.newBuilder[Double]
      while (!converged && iter < cap) {
        val next = step(df, featCol, cents, keepEmpty)
        converged = isConverged(cents, next, tol)
        cents = next
        iter += 1
        if (trackCost)
          costs += df.select(minSqDistColumn(cents, col(featCol)).as("m"))
            .agg(sum(col("m"))).head().getDouble(0)
      }
      KMeansModel(cents, iter, converged, costs.result())
    } finally { df.unpersist(); () }
  }
}
