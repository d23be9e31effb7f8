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
}
