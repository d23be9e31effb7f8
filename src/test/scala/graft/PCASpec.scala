package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PCA
import graft.sources.GeneIO

/** PCA (SURVEY §2 op 17, `PCA_Plot.ipynb:174-247`): one-pass GramAgg
  * covariance vs the sorted-fold twin, Jacobi eigSym correctness
  * properties, sign canonicalization, and the notebook's end-to-end
  * 2-D projection on the reference's own Iris dataset. */
class PCASpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val iris =
    GeneIO.readGenes(spark, "/root/reference/data/new_dataset_1.txt")

  test("moments matches the sorted-fold covariance twin (Iris)") {
    val m = PCA.moments(iris, "features")
    assert(m.n == 150)
    val tw = PCA.covarianceSortedFold(iris, "features")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(tw.size == 4 * 5 / 2)
    for (i <- 0 until 4; j <- i until 4) {
      val diff = math.abs(m.cov(i)(j) - tw((i + 1, j + 1)))
      assert(diff < 1e-10, s"cov($i)($j): one-pass ${m.cov(i)(j)} vs sorted-fold ${tw((i + 1, j + 1))}")
    }
  }

  test("eigSym: A·v = λ·v, orthonormal vectors, descending eigenvalues") {
    val m = PCA.moments(iris, "features")
    val (values, vectors) = PCA.eigSym(m.cov)
    val d = 4
    assert(values.length == d && vectors.length == d)
    // descending order
    values.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    // eigen equation
    for (c <- 0 until d; i <- 0 until d) {
      val av = (0 until d).map(j => m.cov(i)(j) * vectors(c)(j)).sum
      assert(math.abs(av - values(c) * vectors(c)(i)) < 1e-9,
        s"(A·v)[$i] != λ·v[$i] for component $c")
    }
    // orthonormality
    for (c1 <- 0 until d; c2 <- 0 until d) {
      val dot = (0 until d).map(i => vectors(c1)(i) * vectors(c2)(i)).sum
      val expect = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-10, s"v$c1 · v$c2 = $dot")
    }
    // sign canonicalization: largest-|component| entry is positive
    vectors.foreach { v =>
      val best = v.indices.maxBy(i => math.abs(v(i)))
      assert(v(best) > 0.0)
    }
  }

  test("known 2-D case: colinear data has one component along y=x") {
    val df = Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(2.0, 2.0)),
      (3L, Seq(3.0, 3.0)), (4L, Seq(-1.0, -1.0))
    ).toDF("id", "features")
    val model = PCA.fit(df, "features", 2)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(model.components(0)(0) - r2) < 1e-12)
    assert(math.abs(model.components(0)(1) - r2) < 1e-12)
    assert(math.abs(model.variances(1)) < 1e-12) // colinear: second λ = 0
    // first variance = sample variance along the line
    val proj = Seq(1.0, 2.0, 3.0, -1.0).map(_ * math.sqrt(2.0))
    val mu = proj.sum / 4
    val expect = proj.map(x => (x - mu) * (x - mu)).sum / 3
    assert(math.abs(model.variances(0) - expect) < 1e-10)
  }

  test("transform: projection variance equals the eigenvalue, components uncorrelated") {
    val model = PCA.fit(iris, "features", 2)
    val rows = model.transform(iris, "features")
      .select("pc1", "pc2").as[(Double, Double)].collect()
    val n = rows.length
    def varOf(xs: Array[Double]): Double = {
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    }
    val p1 = rows.map(_._1); val p2 = rows.map(_._2)
    assert(math.abs(varOf(p1) - model.variances(0)) < 1e-8)
    assert(math.abs(varOf(p2) - model.variances(1)) < 1e-8)
    val mu1 = p1.sum / n; val mu2 = p2.sum / n
    val cov12 = p1.zip(p2).map { case (a, b) => (a - mu1) * (b - mu2) }.sum / (n - 1)
    assert(math.abs(cov12) < 1e-8) // projections decorrelated
  }

  // Golden NumPy parity on the reference's other two datasets
  // (PCA_Plot.ipynb runs the same projection on every clustering
  // output). Literals computed with numpy.linalg.eigh on the same
  // parse: center, cov = XᵀX/(n-1), eigenvalues descending, sign =
  // largest-|entry| positive, project the first two components.
  private def goldenCheck(path: String, n: Long, lam1: Double, lam2: Double,
                          probes: Seq[(Long, Double, Double)]): Unit = {
    val df = GeneIO.readGenes(spark, path)
    val model = PCA.fit(df, "features", 2)
    assert(math.abs(model.variances(0) - lam1) < 1e-9, s"λ1 ${model.variances(0)} vs $lam1")
    assert(math.abs(model.variances(1) - lam2) < 1e-9, s"λ2 ${model.variances(1)} vs $lam2")
    val out = PCA.project2D(df, "id", "features", "label")
    assert(out.count() === n)
    val byId = out.select("id", "pc1", "pc2").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    probes.foreach { case (id, pc1, pc2) =>
      val (g1, g2) = byId(id)
      assert(math.abs(g1 - pc1) < 1e-8, s"$path id=$id pc1 $g1 vs $pc1")
      assert(math.abs(g2 - pc2) < 1e-8, s"$path id=$id pc2 $g2 vs $pc2")
    }
  }

  test("golden: cho.txt 2-D projection matches NumPy (λs + probe rows)") {
    goldenCheck("/root/reference/data/cho.txt", 386,
      2.718256679993, 1.047730800571,
      Seq((1L, -0.6459317519, -1.6419131297),
        (2L, 1.0385699078, -0.7455621805),
        (386L, -2.5661225706, -0.6022745932)))
  }

  test("golden: iyer.txt 2-D projection matches NumPy (λs + probe rows)") {
    goldenCheck("/root/reference/data/iyer.txt", 517,
      28.846225183588, 5.381117415000,
      Seq((1L, -2.2045083959, -1.2024312610),
        (2L, -1.5528722410, -0.7385077832),
        (517L, 5.7511448430, -0.0982207670)))
  }

  test("project2D: notebook pipeline shape — (id, pc1, pc2, cluster)") {
    val out = PCA.project2D(iris, "id", "features", "label")
    assert(out.columns.toSeq == Seq("id", "pc1", "pc2", "label"))
    assert(out.count() == 150)
    // 2-D projection preserves most Iris variance (known ~97.8%)
    val m = PCA.fit(iris, "features", 4)
    val explained = (m.variances(0) + m.variances(1)) / m.variances.sum
    assert(explained > 0.95)
  }
}
