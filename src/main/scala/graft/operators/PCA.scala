package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{ExprEnc, VectorOps}

/** PCA 2-D projection — SURVEY §2 op 17, the reference's visualization
  * pipeline (`PCA_Plot.ipynb:174-247`): load the clustered rows,
  * mean-center, covariance (`:194`), eigendecomposition (`:195`),
  * project onto the top-2 eigenvectors, emit (pc1, pc2, cluster).
  * Plotting itself is out of engine scope — the output table is what
  * the notebook's scatter consumes.
  *
  * Scale posture: covariance is ONE pass over the data with a custom
  * partial-agg Aggregator (GramAgg) that ships d(d+3)/2+1 doubles per
  * task — count, d sums, and the upper triangle of the raw product
  * matrix — so the shuffle is O(d²·tasks), independent of row count.
  * The eigendecomposition is driver-side on the d×d covariance (d is
  * small; the notebook's d=4, embeddings d=64) — never distributed.
  * Projection is a rowwise HOF dot product, whole-stage codegen'd.
  *
  * Determinism: eigenpairs are sorted by descending eigenvalue (tie:
  * lower original index) and each eigenvector's sign is canonicalized
  * so its largest-|component| entry (tie: lowest index) is positive —
  * the same convention sklearn's svd_flip uses, making outputs stable
  * across runs and platforms.
  */
object PCA {

  /** Single-pass raw-moment accumulator: (count, Σx[d], upper-tri
    * Σ x_i·x_j [d(d+1)/2]). Partial-agg friendly — the classic
    * "one-pass covariance" shape. Catastrophic cancellation is not a
    * concern at these magnitudes (features are O(1)–O(10²)); the
    * sorted-fold twin below is the bit-exact reference. */
  private[operators] class GramAgg
      extends Aggregator[Array[Double], (Array[Double], Array[Double], Long),
                         (Array[Double], Array[Double], Long)] {
    def zero: (Array[Double], Array[Double], Long) =
      (Array.emptyDoubleArray, Array.emptyDoubleArray, 0L)

    def reduce(b: (Array[Double], Array[Double], Long), v: Array[Double])
        : (Array[Double], Array[Double], Long) = {
      if (v == null) return b
      val (s, p, n) = b
      val d = v.length
      val (s2, p2) =
        if (n == 0L) (new Array[Double](d), new Array[Double](d * (d + 1) / 2))
        else {
          require(s.length == d, s"ragged vector: expected dim ${s.length}, got $d")
          (s, p)
        }
      var i = 0
      var t = 0
      while (i < d) {
        s2(i) += v(i)
        var j = i
        while (j < d) { p2(t) += v(i) * v(j); j += 1; t += 1 }
        i += 1
      }
      (s2, p2, n + 1L)
    }

    def merge(a: (Array[Double], Array[Double], Long), b: (Array[Double], Array[Double], Long))
        : (Array[Double], Array[Double], Long) = {
      if (a._3 == 0L) b
      else if (b._3 == 0L) a
      else {
        require(a._1.length == b._1.length,
          s"ragged vector: expected dim ${a._1.length}, got ${b._1.length}")
        val s = a._1; val p = a._2
        var i = 0
        while (i < s.length) { s(i) += b._1(i); i += 1 }
        i = 0
        while (i < p.length) { p(i) += b._2(i); i += 1 }
        (s, p, a._3 + b._3)
      }
    }

    def finish(b: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = b

    def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
      Encoders.tuple(ExprEnc.arrayDouble, ExprEnc.arrayDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[(Array[Double], Array[Double], Long)] = bufferEncoder
  }

  final case class Moments(n: Long, mean: Array[Double], cov: Array[Array[Double]])

  /** Count, mean vector, and sample covariance matrix (÷(n-1), the
    * notebook's np.cov default) in ONE distributed pass. */
  def moments(df: DataFrame, featCol: String): Moments = {
    val agg = udaf(new GramAgg)
    val r = df.select(VectorOps.toDouble(col(featCol)).as("f"))
      .agg(agg(col("f")).as("m"))
      .head().getStruct(0)
    val sums = r.getSeq[Double](0).toArray
    val prods = r.getSeq[Double](1).toArray
    val n = r.getLong(2)
    require(n > 1, s"need at least 2 rows for covariance, got $n")
    val d = sums.length
    val mean = sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // E[xy]·n - n·μx·μy, sample-normalized
        val c = (prods(t) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    Moments(n, mean, cov)
  }

  /** Oracle-expressible covariance twin: (i, j, cov) for i ≤ j
    * (1-based), centered products summed with the sorted-fold
    * determinism contract (see q_centroid_update) so DuckDB reproduces
    * every double bitwise. Two passes (mean, then products) and an
    * O(rows·d²) explode — the correctness gate, not the scale path. */
  def covarianceSortedFold(df: DataFrame, featCol: String): DataFrame = {
    val v = VectorOps.toDouble(col(featCol))
    val mu = df.select(posexplode(v).as(Seq("i0", "x")))
      .groupBy("i0").agg(collect_list(col("x")).as("xs"))
      .select(col("i0"), (VectorOps.foldSum(array_sort(col("xs"))) / size(col("xs"))).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
    val d = mu.length
    val centered = zip_with(v, typedlit(mu.toSeq), (x, m) => x - m)
    val pairs = flatten(transform(sequence(lit(1), lit(d)), i =>
      transform(sequence(i, lit(d)), j =>
        struct(i.cast("int").as("i"), j.cast("int").as("j"),
          (element_at(col("c"), i) * element_at(col("c"), j)).as("p")))))
    df.select(centered.as("c"))
      .select(explode(pairs).as("pr"))
      .select(col("pr.i").as("i"), col("pr.j").as("j"), col("pr.p").as("p"))
      .groupBy("i", "j")
      .agg(collect_list(col("p")).as("ps"))
      .select(col("i"), col("j"),
        (VectorOps.foldSum(array_sort(col("ps"))) / (size(col("ps")) - 1)).as("cov"))
  }

  /** Symmetric eigendecomposition via cyclic Jacobi rotations —
    * driver-side, deterministic (fixed sweep order, no randomness),
    * self-contained (no linalg dependency). Returns (eigenvalues,
    * eigenvectors as rows), sorted by descending eigenvalue (tie:
    * lower original index), each vector sign-canonicalized. Matches
    * the notebook's `scipy.linalg.eig` + hand-rolled top-k selection
    * (`PCA_Plot.ipynb:195-243`) up to the documented sign convention. */
  def eigSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (offNorm > 1e-22 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // extract (eigenvalue, eigenvector-column) pairs; sort; canonicalize
    val pairs = (0 until d).map { j =>
      (a(j)(j), Array.tabulate(d)(i => v(i)(j)), j)
    }.sortBy { case (lam, _, idx) => (-lam, idx) }
    val values = pairs.map(_._1).toArray
    val vectors = pairs.map { case (_, vec, _) =>
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(vec(i)) > math.abs(vec(best))) best = i; i += 1 }
      if (vec(best) < 0) vec.map(x => -x) else vec
    }.toArray
    (values, vectors)
  }

  /** Fitted model: mean for centering, components as rows (top-k
    * eigenvectors), their eigenvalues (projection variances). */
  final case class PCAModel(mean: Array[Double], components: Array[Array[Double]],
                            variances: Array[Double]) {
    /** Appends pc1..pck columns: dot(x - mean, w_c) per component —
      * rowwise, codegen'd, no shuffle. */
    def transform(df: DataFrame, featCol: String): DataFrame = {
      val centered = zip_with(VectorOps.toDouble(col(featCol)),
        typedlit(mean.toSeq), (x, m) => x - m)
      components.zipWithIndex.foldLeft(df) { case (acc, (w, c)) =>
        acc.withColumn(s"pc${c + 1}", VectorOps.dot(centered, typedlit(w.toSeq)))
      }
    }
  }

  /** Fit a k-component PCA: one GramAgg pass + driver-side Jacobi. */
  def fit(df: DataFrame, featCol: String, k: Int): PCAModel = {
    val Moments(_, mean, cov) = moments(df, featCol)
    require(k <= cov.length, s"k=$k exceeds dimensionality ${cov.length}")
    val (values, vectors) = eigSym(cov)
    PCAModel(mean, vectors.take(k), values.take(k))
  }

  /** The notebook's full pipeline (`PCA_Plot.ipynb:174-247`): fit 2
    * components, project, carry the cluster column for the scatter. */
  def project2D(df: DataFrame, idCol: String, featCol: String, clusterCol: String): DataFrame =
    fit(df, featCol, 2).transform(df, featCol)
      .select(col(idCol), col("pc1"), col("pc2"), col(clusterCol))
}
