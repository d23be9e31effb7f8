package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage for co-located joins — the storage-layout
  * lever the 100 TB plan depends on: two fact tables bucketed (and
  * sorted) on the same join key with the same bucket count join with
  * NO exchange on either side (Spark plans a sort-merge join over the
  * pre-bucketed files). At cluster scale that removes the dominant
  * cost of a fact-fact join: shuffling both tables over the network.
  *
  * The reference has no join operator at all (SURVEY §2.2); this is
  * extension surface for the pipeline workloads (e.g. joining a
  * document table to its per-doc feature table by doc_id, repeatedly,
  * without re-shuffling either).
  */
object Bucketed {

  /** Write df as a managed parquet table bucketed AND sorted by
    * keyCol. Same buckets count on both sides of a future join ⇒
    * shuffle-free sort-merge join; the sort makes each bucket file
    * merge-ready without a per-task sort at read time. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. The plan
    * contains no Exchange when both tables were written with the same
    * bucket count on keyCol (asserted in BucketedSpec). */
  def cojoin(spark: SparkSession, left: String, right: String, keyCol: String): DataFrame =
    spark.table(left).join(spark.table(right), keyCol)
}
