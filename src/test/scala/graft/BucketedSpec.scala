package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketed

/** Co-located joins over bucketed tables: same key, same bucket count
  * ⇒ the fact-fact join plans with NO exchange on either side. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed fact-fact join has no shuffle and matches the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // at this scale Spark would broadcast; disable it so the plan
    // shows the fact-fact shape bucketing exists for (sort-merge join
    // over pre-bucketed files, no exchange on either side)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 4)
      Bucketed.writeBucketed(lineitem, "b_lineitem", "o_orderkey", buckets = 4)
      val joined = Bucketed.cojoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join, got:\n$plan")
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      val expect = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expect && expect > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      ()
    }
  }
}
