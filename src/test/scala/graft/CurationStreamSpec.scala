package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Curation
import graft.streaming.CurationStream

/** Row for MemoryStream (top-level for encoder derivation). */
case class KeyedDoc(doc_id: Long, src: String, text: String)

/** Streaming per-key admission cap: quota state persists across
  * micro-batches, and when arrival order equals id order the admitted
  * set matches the batch capPerKey exactly. */
class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("capPerKey admits first n per key across batches; equals batch on id-ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    val q = CurationStream.capPerKey(source.toDF(), "src", n = 2)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()
    val all = Seq(
      KeyedDoc(1, "a", "t1"), KeyedDoc(2, "a", "t2"),
      KeyedDoc(3, "b", "t3"),
      KeyedDoc(7, null, "t7"), KeyedDoc(8, "null", "t8")) // NULL key ≠ "null" key
    val late = Seq(
      KeyedDoc(4, "a", "t4"), // over quota: a already admitted 2
      KeyedDoc(5, "b", "t5"), // fills b's quota
      KeyedDoc(6, "b", "t6"), // over quota
      KeyedDoc(9, null, "t9"), KeyedDoc(10, "null", "t10")) // each fills its OWN quota
    try {
      source.addData(all); q.processAllAvailable()
      source.addData(late); q.processAllAvailable()
      val admitted = spark.table("cap_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(admitted == Seq(1L, 2L, 3L, 5L, 7L, 8L, 9L, 10L))
      // id-ordered arrival ⇒ streaming set == batch capPerKey set
      val batch = Curation.capPerKey((all ++ late).toDF(), "src", "doc_id", 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(admitted == batch)
    } finally q.stop()
  }

  test("capPerKey(orderCol) admits the lowest ids when a quota fills mid-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    val q = CurationStream.capPerKey(source.toDF(), "src", n = 2, orderCol = Some("doc_id"))
      .writeStream.format("memory").queryName("cap_ord_out")
      .outputMode("append").start()
    try {
      // one batch, ids deliberately NOT in arrival order: without the
      // sort the winners depend on the shuffle iterator; with it the
      // two lowest ids per key win, deterministically
      source.addData(Seq(
        KeyedDoc(9, "a", "t9"), KeyedDoc(3, "a", "t3"), KeyedDoc(5, "a", "t5"),
        KeyedDoc(4, "b", "t4"), KeyedDoc(2, "b", "t2"), KeyedDoc(1, "b", "t1")))
      q.processAllAvailable()
      val admitted = spark.table("cap_ord_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(admitted == Seq(1L, 2L, 3L, 5L))
    } finally q.stop()
  }

  test("stateless curation ops (normalize → chunk) run unchanged on a stream, equal batch") {
    // normalizeText and chunkByTokens are rowwise projections/
    // generators — no state, no watermark — so the SAME operator
    // composition runs on readStream verbatim; this pins that the
    // streaming micro-batch output equals the batch run row-for-row.
    import spark.implicits._
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val norm = TextAnalysis.normalizeText(df, "doc_id", "text")
      TextAnalysis.chunkByTokens(
        norm.withColumnRenamed("norm_text", "text"), "doc_id", "text",
        maxTokens = 4, overlap = 1)
    }
    val q = pipeline(source.toDF())
      .writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append").start()
    val rows = Seq(
      KeyedDoc(1, "a", "  One\ttwo  three four five six SEVEN  "),
      KeyedDoc(2, "a", "tiny"))
    try {
      source.addData(rows.take(1)); q.processAllAvailable()
      source.addData(rows.drop(1)); q.processAllAvailable()
      val streamed = spark.table("curate_stream_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      val batch = pipeline(rows.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(streamed == batch)
      assert(streamed.head._3 == "one two three four") // normalized before chunking
    } finally q.stop()
  }

  test("dropContaminated: streaming equals batch; planted leak dropped, clean docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val passage = "the exact benchmark question about photosynthesis energy pathways"
    val bench = Seq((100L, s"Q: $passage A: chloroplasts")).toDF("bid", "btext")
    val docs = Seq(
      KeyedDoc(1, "a", s"intro text then $passage then more prose"), // leaked → dropped
      // "clean" here also means: shares no 5-char substring with the
      // bench text (even one shared word like "about" can surface a
      // common winnow fingerprint — that's the detector working)
      KeyedDoc(2, "a", "a perfectly clean training document describing pasta recipes"),
      KeyedDoc(3, "b", "another clean one discussing bridge engineering at length"))
    val source = MemoryStream[KeyedDoc]
    val q = CurationStream.dropContaminated(source.toDF(), "text", bench, "btext")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      source.addData(docs.take(2)); q.processAllAvailable()
      source.addData(docs.drop(2)); q.processAllAvailable()
      val streamed = spark.table("decon_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == Seq(2L, 3L))
      // a document's fate depends only on its own text ⇒ batch result identical
      val batch = CurationStream.dropContaminated(docs.toDF(), "text", bench, "btext")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch)
      // and the decision agrees with the batch report at minShared=1
      val flagged = Curation.winnowContamination(docs.toDF(), "doc_id", "text",
        bench, "bid", "btext", minShared = 1)
        .select("doc_id").as[Long].collect().toSet
      assert(flagged == Set(1L))
    } finally q.stop()
  }

  test("dropContaminated refuses an over-budget benchmark fingerprint set") {
    import spark.implicits._
    val bench = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("bid", "btext")
    val docs = Seq(KeyedDoc(1, "a", "x")).toDF()
    intercept[IllegalArgumentException] {
      CurationStream.dropContaminated(docs, "text", bench, "btext", maxBenchFps = 1)
    }
  }

  test("kmvDistinct stream state equals the batch sketch over all rows seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedDoc]
    val q = CurationStream.kmvDistinct(source.toDF(), "src", "text", k = 8)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    // key "big" crosses the k=8 boundary only after the second batch;
    // key "small" stays exact; duplicate values must not inflate
    val batch1 = (1 to 6).map(i => KeyedDoc(i.toLong, "big", s"v$i")) ++
      Seq(KeyedDoc(100, "small", "s1"), KeyedDoc(101, "small", "s2"))
    val batch2 = (4 to 30).map(i => KeyedDoc(200L + i, "big", s"v$i")) ++
      Seq(KeyedDoc(300, "small", "s1")) // duplicate value
    try {
      source.addData(batch1); q.processAllAvailable()
      source.addData(batch2); q.processAllAvailable()
      // final state per key: n_sketch is monotone, then kth_min minimal
      val rows = spark.table("kmv_out")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) Long.MaxValue else r.getLong(2), r.getDouble(3)))
      val finalByKey = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.maxBy(r => (r._2, -r._3))
      }
      val expected = Curation.kmvDistinct(
        (batch1 ++ batch2).toDF(), "src", "text", k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) Long.MaxValue else r.getLong(2), r.getDouble(3)))
        .map(r => r._1 -> r).toMap
      assert(finalByKey === expected)
      assert(expected("big")._2 === 8L) // sketch saturated → estimator path
      assert(expected("small")._2 === 2L) // exact path, duplicate ignored
    } finally q.stop()
  }
}
