package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** The persisted serving-budget sweep (VERDICT r17 item 5): the
  * (nprobe, shortlist) recall/latency grid freezes next to the index
  * it was measured on, bound by the index's provenance fingerprints —
  * so a deployer picks a budget from the index's OWN record, and a
  * retrain (new geometry, dead numbers) invalidates the sweep loudly
  * instead of silently serving a budget measured under a different
  * quantizer. */
class ServingSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val model = Similarity.trainPQ(emb, "vec_id", "embedding",
    d = 64, m = 4, k = 16, maxIter = 0)

  private val grid = Seq(
    Similarity.ServingBudget(1, 20, 0.62, 1.5),
    Similarity.ServingBudget(2, 50, 0.81, 2.5),
    Similarity.ServingBudget(4, 50, 0.90, 4.0),
    Similarity.ServingBudget(4, 100, 0.90, 3.5))

  test("save/load round trip, pick from the stored sweep, advice on unreachable targets") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val dir = java.nio.file.Files.createTempDirectory("sweep").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir)
    // no sweep yet: loud, names the remedy
    val e0 = intercept[IllegalArgumentException] {
      Similarity.loadServingSweep(spark, dir)
    }
    assert(e0.getMessage.contains("no serving sweep"), e0.getMessage)
    Similarity.saveServingSweep(spark, dir, grid)
    assert(Similarity.loadServingSweep(spark, dir) ==
      grid.sortBy(b => (b.nprobe, b.shortlist)))
    // pick: cheapest qualifying point; at equal recall the cheaper
    // seconds wins even with a larger shortlist
    assert(Similarity.pickServingBudgetIndexed(spark, dir, 0.8)
      .contains(Similarity.ServingBudget(2, 50, 0.81, 2.5)))
    assert(Similarity.pickServingBudgetIndexed(spark, dir, 0.9)
      .contains(Similarity.ServingBudget(4, 100, 0.90, 3.5)))
    // unreachable target: None from the picker; the advice variant
    // names the best measured point and the m-lever
    assert(Similarity.pickServingBudgetIndexed(spark, dir, 0.95).isEmpty)
    val advice = Similarity.servingBudgetOrAdvice(grid, 0.95)
    assert(advice.isLeft)
    val msg = advice.left.toOption.get
    assert(msg.contains("0.900") && msg.contains("nprobe=4")
      && msg.contains("PQ code budget"), msg)
    assert(Similarity.servingBudgetOrAdvice(grid, 0.8)
      == Right(Similarity.ServingBudget(2, 50, 0.81, 2.5)))
  }

  test("a retrain invalidates the stored sweep by fingerprint") {
    val cents8 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val cents4 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(4))
    val dir = java.nio.file.Files.createTempDirectory("sweep_rt").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents8, model, dir)
    Similarity.saveServingSweep(spark, dir, grid)
    Similarity.retrainIvfPqIndex(spark, emb, "vec_id", "embedding",
      cents4, model, dir)
    val e = intercept[IllegalArgumentException] {
      Similarity.pickServingBudgetIndexed(spark, dir, 0.8)
    }
    assert(e.getMessage.contains("stale serving sweep")
      && e.getMessage.contains("re-run the sweep"), e.getMessage)
    // a fresh sweep under the new geometry serves again
    Similarity.saveServingSweep(spark, dir, grid.take(2))
    assert(Similarity.loadServingSweep(spark, dir).length == 2)
  }
}
