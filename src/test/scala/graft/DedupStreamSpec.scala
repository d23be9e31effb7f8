package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Dedup
import graft.streaming.DedupStream

/** Document row for MemoryStream (top-level for encoder derivation). */
case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Streaming dedup: first-arrival-wins within the watermark horizon,
  * and the stateless MinHash index build folding incrementally. */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("dropExactDuplicates: first arrival wins, later dups within horizon dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = DedupStream.dropExactDuplicates(source.toDF(), "ts", Seq("text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      source.addData(Seq(
        Doc(1, t(100), "alpha beta"),
        Doc(2, t(101), "alpha beta"), // same batch dup
        Doc(3, t(102), "gamma delta")))
      q.processAllAvailable()
      source.addData(Seq(
        Doc(4, t(103), "alpha beta"), // cross-batch dup, within horizon
        Doc(5, t(104), "epsilon")))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L, 5L))
    } finally q.stop()
  }

  test("dropSeenExact on a stream matches the batch operator (stream-static anti-join)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((100L, "alpha beta"), (101L, "gamma delta"))
      .toDF("doc_id", "text")
    val index = Dedup.exactIndex(corpus, Seq("text"))
    val source = MemoryStream[Doc]
    val q = DedupStream.dropSeenExact(source.toDF(), index, Seq("text"))
      .writeStream.format("memory").queryName("seen_out")
      .outputMode("append").start()
    try {
      val batch1 = Seq(Doc(1, t(100), "alpha beta"),   // seen -> dropped
        Doc(2, t(101), "epsilon zeta"))                 // new  -> admitted
      val batch2 = Seq(Doc(3, t(102), "gamma delta"),  // seen -> dropped
        Doc(4, t(103), "eta theta"))                    // new  -> admitted
      source.addData(batch1); q.processAllAvailable()
      source.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("seen_out").select("doc_id").as[Long].collect().sorted
      val batched = Dedup.dropSeenExact((batch1 ++ batch2).toDF(), index, Seq("text"))
        .select("doc_id").as[Long].collect().sorted
      assert(streamed.toSeq == Seq(2L, 4L))
      assert(streamed.toSeq == batched.toSeq)
    } finally q.stop()
  }

  test("stateless text-analysis operators run unchanged on a stream (quality gate at ingest)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1, t(0), "the quick brown fox and the lazy dog of summer"), // prose: quality 1.0
      Doc(2, t(1), "x x x x x x x x x x x x x x x x"))                // degenerate repetition
    val source = MemoryStream[Doc]
    val q = graft.operators.TextAnalysis
      .qualityScore(source.toDF(), "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("quality") >= 0.75)
      .writeStream.format("memory").queryName("quality_out")
      .outputMode("append").start()
    try {
      source.addData(docs); q.processAllAvailable()
      val kept = spark.table("quality_out").select("doc_id").as[Long].collect().toSeq
      assert(kept == Seq(1L)) // the ingest-time quality gate dropped the degenerate doc
      val batch = graft.operators.TextAnalysis.qualityScore(docs.toDF(), "doc_id", "text")
        .filter(org.apache.spark.sql.functions.col("quality") >= 0.75)
        .select("doc_id").as[Long].collect().toSeq
      assert(kept == batch) // batch = streaming, same plan
    } finally q.stop()
  }

  test("minhashBuckets on a stream matches the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(1, t(0), "the quick brown fox jumps over the lazy dog"),
      Doc(2, t(1), "the quick brown fox jumps over the lazy cat"),
      Doc(3, t(2), "completely different words entirely here now"))
    val source = MemoryStream[Doc]
    val q = DedupStream.minhashBuckets(source.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("mh_out")
      .outputMode("append").start()
    try {
      docs.grouped(2).foreach { b => source.addData(b); q.processAllAvailable() }
      val streamed = spark.table("mh_out")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val batch = Dedup.minhashBuckets(docs.toDF(), "doc_id", "text", n = 3, h = 16, b = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("bandOccupancy: bucket state persists across batches; lowest id claims in-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = a + " slightly changed tail here"   // near-dup of a: shares buckets
    val c = "completely different content with nothing shared at all whatsoever"
    val source = MemoryStream[Doc]
    val q = DedupStream.bandOccupancy(source.toDF(), "doc_id", "text")
      .toDF().writeStream.format("memory").queryName("occ_out")
      .outputMode("append").start()
    try {
      source.addData(Seq(Doc(2, t(0), a), Doc(1, t(0), a))) // same batch: id 1 claims
      q.processAllAvailable()
      source.addData(Seq(Doc(3, t(1), b), Doc(4, t(1), c))) // batch 2: b collides, c fresh
      q.processAllAvailable()
      val fresh = spark.table("occ_out").groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.sum("fresh").as("f"),
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      def admitted(id: Long) = fresh(id)._1 == fresh(id)._2
      assert(admitted(1L), "in-batch lowest id claims every bucket")
      assert(!admitted(2L), "identical twin in the same batch is rejected")
      assert(!admitted(3L), "cross-batch near-dup must hit occupied buckets")
      assert(admitted(4L), "unrelated doc occupies only fresh buckets")
    } finally q.stop()
  }
}
