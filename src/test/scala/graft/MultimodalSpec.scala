package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, Similarity}

/** Multimodal binary-column plumbing: ingest schema, the deterministic
  * fake decode (hex-pair byte arithmetic vs the mapPartitions batch
  * path), frame sampling reassembly, feature extraction feeding
  * similarity search, and stride resize. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world this is a test document"),
    (2L, "abc"),
    (3L, "x" * 300), // spans two 256-byte frames
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private lazy val mm = Multimodal.withContent(docs, "doc_id", "text")

  test("withContent: binary payload + typed metadata, height = ceil(n/16)") {
    val rows = mm.select($"doc_id", $"content", $"meta.format", $"meta.width",
      $"meta.height", $"meta.channels", $"meta.n_bytes").collect()
    rows.foreach { r =>
      val content = r.getAs[Array[Byte]](1)
      assert(r.getString(2) == "gray8" && r.getInt(3) == 16 && r.getInt(5) == 1)
      assert(r.getLong(6) == content.length)
      assert(r.getInt(4) == (content.length + 15) / 16)
    }
    assert(rows.find(_.getLong(0) == 2L).get.getAs[Array[Byte]](1).toSeq ==
      "abc".getBytes("UTF-8").toSeq)
  }

  test("pixelStats: exact byte arithmetic") {
    val r = Multimodal.pixelStats(mm, "doc_id", "content")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val abc = "abc".getBytes("UTF-8").map(_ & 0xff)
    assert(r(2L) == ((3L, abc.map(_.toLong).sum, abc.min.toLong, abc.max.toLong,
      abc.sum.toDouble / 3)))
    val x300 = r(3L)
    assert(x300._1 == 300L && x300._2 == 300L * 'x'.toInt && x300._5 == 'x'.toInt.toDouble)
  }

  test("decodeBatched: batch sizes respected, results equal the SQL-path stats") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val decode: Seq[(Long, Array[Byte])] => Seq[Multimodal.Decoded] = batch => {
      seen.add(batch.size)
      Multimodal.fakeDecode(batch)
    }
    val out = Multimodal.decodeBatched(mm, "doc_id", "content", batchSize = 3)(decode)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out.size == 4)
    seen.forEach(sz => assert(sz <= 3 && sz > 0))
    val stats = Multimodal.pixelStats(mm, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    out.foreach { case (id, (w, h, mean)) =>
      assert(w == 16)
      assert(math.abs(mean - stats(id)) < 1e-12)
      val n = docs.filter($"doc_id" === id).select($"text").as[String].head().length
      assert(h == (n + 15) / 16)
    }
  }

  test("frameSample: frames reassemble to the payload, last frame short") {
    val frames = Multimodal.frameSample(mm, "doc_id", "content", frameBytes = 256)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
      .groupBy(_._1)
    val content = mm.select($"doc_id", $"content")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    content.foreach { case (id, bytes) =>
      val fs = frames(id).sortBy(_._2).map(_._3)
      assert(fs.length == (bytes.length + 255) / 256)
      assert(fs.flatten.toSeq == bytes.toSeq)
      fs.init.foreach(f => assert(f.length == 256))
      assert(fs.last.length == bytes.length - 256 * (fs.length - 1))
    }
    // maxFrames caps the explode
    val capped = Multimodal.frameSample(mm, "doc_id", "content", 256, maxFrames = 1)
    assert(capped.filter($"doc_id" === 3L).count() == 1)
  }

  test("empty payload: zero frames, empty resize, mean_px 0.0 matching fakeDecode") {
    val withEmpty = Multimodal.withContent(
      Seq((1L, ""), (2L, "abc")).toDF("doc_id", "text"), "doc_id", "text")
    // sequence(1,0) descends in Spark — must NOT yield frames for doc 1
    val frames = Multimodal.frameSample(withEmpty, "doc_id", "content", 256)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!frames.contains(1L) && frames(2L) == 1L)
    val resized = Multimodal.resizeByStride(withEmpty, "doc_id", "content", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(resized(1L).isEmpty)
    val stats = Multimodal.pixelStats(withEmpty, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(stats(1L) == ((0L, 0L, 0.0))) // n_px, sum_px (not null), mean_px
    val decoded = Multimodal.decodeBatched(withEmpty, "doc_id", "content", 2)(Multimodal.fakeDecode)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(decoded(1L) == 0.0 && decoded(1L) == stats(1L)._3) // mean, not sum_px
  }

  test("featureExtract: deterministic [0,1) embeddings that feed similarity search") {
    val e1 = Multimodal.featureExtract(mm, "doc_id", "content", d = 8)
    val rows = e1.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.values.forall(v => v.length == 8 && v.forall(x => x >= 0.0 && x < 1.0)))
    val e2 = Multimodal.featureExtract(mm, "doc_id", "content", d = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == e2)
    // identical payloads ⇒ identical embeddings; different ⇒ different
    assert(rows(1L) != rows(2L))
    val topk = Similarity.topKCosine(e1, "doc_id", "embedding",
      e1.filter($"doc_id" === 1L), "doc_id", "embedding", k = 2).collect()
    assert(topk.length == 2 && topk.forall(_.getLong(0) == 1L))
  }

  test("dHash + imageNearDup: identical and one-pixel-edited images pair, empty payload emits no fp") {
    import graft.operators.Dedup
    val img = ("the quick brown fox jumps over the lazy dog " * 4).take(144)
    val edited = "x" + img.drop(1)               // one-pixel brightness edit
    val other = ("zz yy xx ww vv uu tt ss rr qq pp oo nn mm " * 4).take(144)
    val df = Seq((1L, img), (2L, img), (3L, edited), (4L, other), (5L, ""))
      .toDF("doc_id", "img")
    val pay = Multimodal.withContent(df, "doc_id", "img")
    // empty payload: no fingerprint row at all
    assert(Multimodal.dHash(pay, "doc_id", "content").count() === 4L)
    val pairs = Multimodal.imageNearDup(pay, "doc_id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    Dedup.releaseCaches()
    assert(pairs((1L, 2L)) === 0)                // identical images: 0 bits apart
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3) // edit survives
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L || a == 5L || b == 5L })
  }

  test("native DHash64 kernel is bit-identical to the staged-HOF twin incl. edge sizes") {
    // n = 1 (all samples the same byte), 71/72/73 (around the sample
    // count), 144 (exact 2x), a long payload, and high-bit bytes
    val payloads = Seq(
      1L -> "a", 2L -> "ab", 3L -> ("x" * 71), 4L -> ("ab" * 36),
      5L -> ("the quick brown fox " * 20), 6L -> ("zyxw" * 100),
      7L -> new String(Array.tabulate(200)(i => ((i * 37) % 256).toChar))
    )
    val df = payloads.toDF("doc_id", "img")
    val pay = Multimodal.withContent(df, "doc_id", "img")
    val kernel = Multimodal.dHash(pay, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val twin = Multimodal.dHashHof(pay, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel === twin)
    assert(kernel.values.forall(_.matches("[0-9a-f]{16}")))
  }

  test("resizeByStride: every stride-th pixel, metadata recomputed") {
    val r = Multimodal.resizeByStride(mm, "doc_id", "content", stride = 4)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getStruct(2))).toList
    val content = mm.select($"doc_id", $"content")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    r.foreach { case (id, px, meta) =>
      val bytes = content(id).map(b => (b & 0xff).toLong)
      val expect = bytes.indices.collect { case i if i % 4 == 0 => bytes(i) }.toSeq
      assert(px == expect)
      assert(meta.getAs[Long]("n_bytes") == expect.length.toLong)
      assert(meta.getAs[Int]("height") == (expect.length + 15) / 16)
    }
  }

  test("parameter contracts refuse loudly (review r15)") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "content")
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(df, "id", "content", frameBytes = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(df, "id", "content", frameBytes = -4)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizeByStride(df, "id", "content", stride = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.featureExtract(df, "id", "content", d = 0)
    }
  }
}
