package graft
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity}
class PlanAuditDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  test("masked serve keeps cell partition pruning and broadcasts the tombstone anti-join") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64, m = 4, k = 16, maxIter = 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_plan").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir)
    Similarity.deleteFromIvfPqIndex(spark, emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", dir)
    val served = Similarity.ivfPqTopKIndexed(spark, dir, emb.orderBy("vec_id").limit(3),
      "vec_id", "embedding", cents, model, nprobe = 2, k = 5)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"cell pruning lost under the tombstone mask:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone mask must be a broadcast anti-join:\n$plan")
    assert(served.count() > 0)
  }

  test("rotated rerank prunes the float table via a broadcast semi-join BEFORE rotating") {
    // the d×d rotation must run on probes × shortlist rows, never
    // corpus-wide — the semi-join on the shortlist ids has to reach
    // the plan as a broadcast LeftSemi under the rotate projection
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rot = EntryVector.opqTestRotation(64)
    val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
    val cents = KMeans.initCentroids(re, "vec_id", "r", KMeans.FirstK(8))
    val pq = Similarity.trainPQ(re, "vec_id", "r", d = 64, m = 4, k = 16,
      maxIter = 0)
    val lm = Similarity.OpqIvfModel(rot, cents, pq)
    val dir = java.nio.file.Files.createTempDirectory("opq_plan").toString + "/i"
    Similarity.buildIvfPqIndexRotated(emb, "vec_id", "embedding", lm, dir)
    val served = Similarity.ivfPqTopKIndexedRerankRotated(spark, dir,
      emb, "vec_id", "embedding", emb.orderBy("vec_id").limit(3),
      "vec_id", "embedding", lm, nprobe = 2, k = 5, shortlist = 20)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastHashJoin"),
      s"shortlist semi-join must be a broadcast LeftSemi:\n$plan")
    assert(served.count() > 0)
  }
}
