package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}

/** The reader-during-swap contract (VERDICT r16 item 6): a streaming
  * serve that planned against generation N keeps a CONSISTENT
  * snapshot through one full compact (the generational layout retains
  * N until the compact after next), and once its generation finally
  * retires it fails LOUDLY — before-or-after or an error, never a
  * torn mix of old and new files. */
class StreamDuringCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("streamed serve across a mid-stream compact: snapshot-consistent, then fail-loud on retirement") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_swap").toString + "/i"
    val corpus0 = emb.filter(col("vec_id") % 3 =!= 0)
    Similarity.buildIvfPqIndex(corpus0, "vec_id", "embedding", cents, model, dir)
    // the snapshot the stream plans against: the BUILD-time state
    val want0 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
      emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
      cents, model, nprobe = 2, k = 5).collect())

    val probeRows = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").cast("long"),
        graft.functions.VectorOps.toDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => StreamProbe(id, v) }
    val source = MemoryStream[StreamProbe]
    val scored = Similarity.ivfPqTopKStream(spark, dir, source.toDF(),
      "vec_id", "embedding", cents, model, nprobe = 2, k = 5)
    val q = scored.writeStream.format("memory").queryName("swap_stream")
      .outputMode("complete").start()
    try {
      // trigger 1: plain serve of the planned snapshot
      source.addData(probeRows.take(2).toSeq); q.processAllAvailable()
      assert(asSet(spark.table("swap_stream").collect())
        == want0.filter(t => probeRows.take(2).map(_.vec_id).contains(t._1)),
        "trigger 1 must serve the planned snapshot")
      // MUTATE mid-stream: append the remaining third, then compact —
      // the meta pointer flips to generation 1, but generation 0 (the
      // stream's snapshot, tombstones and all) survives as the grace
      // window
      Similarity.appendIvfPqIndex(spark, emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", model, dir)
      Similarity.compactIvfPqIndex(spark, dir)
      // trigger 2: the in-flight stream still answers from ITS
      // snapshot — the before-state, bit-for-bit, never a torn mix of
      // old and new files (complete mode re-outputs all probes)
      source.addData(probeRows.drop(2).toSeq); q.processAllAvailable()
      assert(asSet(spark.table("swap_stream").collect()) == want0,
        "an in-flight stream must keep its snapshot through one compact")
      // a FRESH plan sees the after-state (append included)
      val want1 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
        emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 5).collect())
      assert(want1 != want0,
        "the append must actually have changed the serve (non-vacuous)")
      // SECOND compact: generation 0 retires; the old stream's files
      // are gone, so its next trigger fails LOUDLY — never silently
      // serving a partial mix
      Similarity.compactIvfPqIndex(spark, dir)
      source.addData(probeRows.take(1).toSeq)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c =>
          c.isInstanceOf[java.io.FileNotFoundException] ||
          String.valueOf(c.getMessage).contains("FileNotFound") ||
          String.valueOf(c.getMessage).contains("does not exist")),
        s"retirement must surface as a missing-file failure, got: $e")
    } finally q.stop()
    // recovery: a fresh stream over the compacted index serves the
    // current state
    val source2 = MemoryStream[StreamProbe]
    val scored2 = Similarity.ivfPqTopKStream(spark, dir, source2.toDF(),
      "vec_id", "embedding", cents, model, nprobe = 2, k = 5)
    val q2 = scored2.writeStream.format("memory").queryName("swap_stream2")
      .outputMode("complete").start()
    try {
      source2.addData(probeRows.toSeq); q2.processAllAvailable()
      val want1 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
        emb.orderBy("vec_id").limit(4), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 5).collect())
      assert(asSet(spark.table("swap_stream2").collect()) == want1,
        "a restarted stream must serve the post-compact state")
    } finally q2.stop()
  }

  test("mid-stream delete: invisible to the in-flight snapshot, immediate via foreachBatch re-plan") {
    // the takedown-vs-serving-stream contract: an in-flight stream's
    // tombstone listing is plan-time-fixed, so a delete between
    // triggers does NOT mask rows for it (snapshot semantics, same as
    // appends) — production restarts serving streams on takedown or
    // serves through foreachBatch, which re-plans per micro-batch and
    // picks tombstones up immediately. Both halves pinned here.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_sdel").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir)
    val want0 = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
      emb.orderBy("vec_id").limit(3), "vec_id", "embedding",
      cents, model, nprobe = 2, k = 5).collect())
    val probeRows = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").cast("long"),
        graft.functions.VectorOps.toDouble(col("embedding")))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => StreamProbe(id, v) }
    val source = MemoryStream[StreamProbe]
    val q = Similarity.ivfPqTopKStream(spark, dir, source.toDF(),
        "vec_id", "embedding", cents, model, nprobe = 2, k = 5)
      .writeStream.format("memory").queryName("sdel_stream")
      .outputMode("complete").start()
    try {
      source.addData(probeRows.take(1).toSeq); q.processAllAvailable()
      // DELETE the current top hit of probe 1 mid-stream
      val victim = want0.filter(_._1 == probeRows(0).vec_id)
        .minBy(_._3)._2
      Similarity.deleteFromIvfPqIndex(spark,
        Seq(victim).toDF("vec_id"), "vec_id", dir)
      source.addData(probeRows.drop(1).toSeq); q.processAllAvailable()
      // in-flight stream: snapshot semantics — the deleted id still
      // serves (complete mode re-outputs everything)
      assert(asSet(spark.table("sdel_stream").collect()) == want0,
        "an in-flight stream must keep its plan-time snapshot across a delete")
      // a fresh (re-planned) batch serve masks it immediately — the
      // foreachBatch production pattern
      val fresh = asSet(Similarity.ivfPqTopKIndexed(spark, dir,
        emb.orderBy("vec_id").limit(3), "vec_id", "embedding",
        cents, model, nprobe = 2, k = 5).collect())
      assert(!fresh.exists(_._2 == victim) && fresh != want0,
        "a re-planned serve must mask the deleted id immediately")
    } finally q.stop()
  }
}
