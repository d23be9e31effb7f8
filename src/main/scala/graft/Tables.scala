package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central testdata-table loader. All queries read driver-generated
  * Parquet (TESTDATA.md); Parquet gives Catalyst column pruning +
  * predicate pushdown for free, which is the 100 TB-scale posture:
  * a scan should only read the columns/row-groups the plan needs.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
