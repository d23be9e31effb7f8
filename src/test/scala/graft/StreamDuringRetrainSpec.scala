package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** The reader-during-retrain contract (VERDICT r17 item 3): a
  * blue/green quantizer retrain writes generation N+1 beside the live
  * generation and flips the meta pointer + provenance fingerprints —
  * so a streaming serve that planned against generation N answers
  * from ITS quantizer's snapshot, before-or-after, NEVER a
  * mixed-quantizer blend; post-flip serves must present the new
  * quantizer (the old one refuses by fingerprint); and takedowns
  * survive the retrain even when the caller's corpus snapshot still
  * contains the doomed rows. */
class StreamDuringRetrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("streamed serve across a mid-stream retrain: old-quantizer snapshot, then fail-loud on retirement") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents8 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val cents4 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(4))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_retr").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents8, model, dir)
    val want0 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
      emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
      cents8, model, nprobe = 2, k = 5).collect())

    val probeRows = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").cast("long"),
        graft.functions.VectorOps.toDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => StreamProbe(id, v) }
    val source = MemoryStream[StreamProbe]
    val q = Similarity.ivfPqTopKStream(spark, dir, source.toDF(),
        "vec_id", "embedding", cents8, model, nprobe = 2, k = 5)
      .writeStream.format("memory").queryName("retr_stream")
      .outputMode("complete").start()
    try {
      source.addData(probeRows.take(2).toSeq); q.processAllAvailable()
      assert(asSet(spark.table("retr_stream").collect())
        == want0.filter(t => probeRows.take(2).map(_.vec_id).contains(t._1)),
        "trigger 1 must serve the planned snapshot")
      // RETRAIN mid-stream: the quantizer swaps 8 cells → 4, the meta
      // pointer flips to generation 1 with the new fingerprints, but
      // generation 0 (the stream's snapshot) survives as the grace
      // window
      Similarity.retrainIvfPqIndex(spark, emb, "vec_id", "embedding",
        cents4, model, dir)
      // the in-flight stream still answers from ITS quantizer's
      // snapshot — never a mixed-quantizer blend
      source.addData(probeRows.drop(2).toSeq); q.processAllAvailable()
      assert(asSet(spark.table("retr_stream").collect()) == want0,
        "an in-flight stream must keep its old-quantizer snapshot through a retrain")
      // a FRESH serve under the new quantizer sees the retrained state
      val want1 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
        emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
        cents4, model, nprobe = 2, k = 5).collect())
      assert(want1 != want0,
        "the retrain must actually have changed the serve (non-vacuous)")
      // the OLD quantizer refuses post-flip — fingerprint gate, not
      // silently-wrong cells
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfPqTopKIndexed(spark, dir,
          emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
          cents8, model, nprobe = 2, k = 5)
      }
      assert(e.getMessage.contains("quantizer"), e.getMessage)
      // a compact retires generation 0: the old stream's files are
      // gone, so its next trigger fails LOUDLY — never a partial mix
      Similarity.compactIvfPqIndex(spark, dir)
      source.addData(probeRows.take(1).toSeq)
      val se = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(se).exists(c =>
          c.isInstanceOf[java.io.FileNotFoundException] ||
          String.valueOf(c.getMessage).contains("FileNotFound") ||
          String.valueOf(c.getMessage).contains("does not exist")),
        s"retirement must surface as a missing-file failure, got: $se")
    } finally q.stop()
    // recovery: a fresh stream under the NEW quantizer serves the
    // retrained state
    val source2 = MemoryStream[StreamProbe]
    val q2 = Similarity.ivfPqTopKStream(spark, dir, source2.toDF(),
        "vec_id", "embedding", cents4, model, nprobe = 2, k = 5)
      .writeStream.format("memory").queryName("retr_stream2")
      .outputMode("complete").start()
    try {
      source2.addData(probeRows.toSeq); q2.processAllAvailable()
      val want1 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
        emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
        cents4, model, nprobe = 2, k = 5).collect())
      assert(asSet(spark.table("retr_stream2").collect()) == want1,
        "a restarted stream must serve the retrained state")
    } finally q2.stop()
  }

  test("takedowns survive a retrain even when the corpus snapshot still holds the doomed rows") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents8 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val cents4 = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(4))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val dir = java.nio.file.Files.createTempDirectory("retr_tomb").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents8, model, dir)
    Similarity.deleteFromIvfPqIndex(spark,
      emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", dir)
    // retrain from the FULL corpus snapshot (doomed rows included)
    Similarity.retrainIvfPqIndex(spark, emb, "vec_id", "embedding",
      cents4, model, dir)
    // the deleted ids stay out — physically, not via a tombstone mask
    val codes = Similarity.ivfPqIndexCodes(spark, dir)
    assert(codes.filter(col("id") % 7 === 3).count() == 0,
      "a retrain resurrected tombstoned ids from the caller's corpus snapshot")
    // and the fresh generation carries no tombstones (they dropped
    // physically), so a re-admission appends cleanly
    Similarity.appendIvfPqIndex(spark, emb.filter(col("vec_id") % 14 === 3),
      "vec_id", "embedding", model, dir)
    assert(Similarity.ivfPqIndexCodes(spark, dir)
      .filter(col("id") % 14 === 3).count() > 0)
  }
}
