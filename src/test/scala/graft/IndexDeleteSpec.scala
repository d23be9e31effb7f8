package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, KMeans, Similarity}

/** Tombstone deletion for the three persisted indexes (VERDICT r16
  * item 2 — the takedown mutation a 100 TB training-data pipeline is
  * legally forced to run): delete masks immediately, compact drops
  * physically, a deleted id re-appends after the compact, and every
  * torn intermediate state refuses loudly. */
class IndexDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def asSet(d: org.apache.spark.sql.DataFrame) = d.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("IVF-PQ delete lifecycle: mask → compact drop → re-append; torn states refuse") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val probes = emb.orderBy("vec_id").limit(3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_del").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir)
    def serve() = asSet(Similarity.ivfPqTopKIndexed(spark, dir, probes,
      "vec_id", "embedding", cents, model, nprobe = 2, k = 5))
    val full = serve()

    // 1. delete: the serve must immediately equal the in-memory
    // search over the SURVIVORS — same codebook, same quantizer
    val doomedIds = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    Similarity.deleteFromIvfPqIndex(spark, doomedIds, "vec_id", dir)
    val masked = serve()
    val wantMasked = asSet(Similarity.ivfPqTopK(
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      probes, "vec_id", "embedding", cents, model, nprobe = 2, k = 5))
    assert(masked == wantMasked && masked != full,
      "a delete must mask immediately and visibly")

    // idempotence: re-deleting the same ids changes nothing (deleted
    // count included — a doubled count would poison every row check)
    Similarity.deleteFromIvfPqIndex(spark, doomedIds, "vec_id", dir)
    assert(serve() == masked)

    // 2. re-append BEFORE compact refuses loudly — the dead row is
    // still physical, so a silent re-append would mask both rows
    val back = emb.filter(col("vec_id") % 7 === 3).limit(2)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndex(spark, back, "vec_id", "embedding", model, dir)
    }
    assert(e1.getMessage.contains("tombstoned"))

    // 3. compact drops physically: new generation holds live rows
    // only, tombstones cleared, serve unchanged
    Similarity.compactIvfPqIndex(spark, dir)
    assert(serve() == masked)
    val g1 = spark.read.parquet(s"$dir/g1")
    assert(g1.count() == emb.filter(col("vec_id") % 7 =!= 3).count(),
      "compaction must physically drop tombstoned rows")
    assert(g1.filter(col("id") % 7 === 3).count() == 0)

    // 4. a deleted id re-appends cleanly after the compact
    Similarity.appendIvfPqIndex(spark,
      emb.filter(col("vec_id") % 7 === 3), "vec_id", "embedding", model, dir)
    assert(serve() == full,
      "re-appending every deleted row must restore the full-corpus serve")

    // 5. torn delete (tombstones written, meta not) refuses at serve
    emb.limit(1).select(col("vec_id").cast("long").as("id"))
      .write.mode("append").parquet(s"$dir/_tomb/g1")
    val e2 = intercept[IllegalArgumentException] { serve() }
    assert(e2.getMessage.contains("tombstones"))
  }

  test("float IVF delete lifecycle: mask → compact drop → re-append") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val probes = emb.orderBy("vec_id").limit(3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_del").toString + "/i"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, dir)
    def serve() = asSet(Similarity.ivfTopKIndexed(spark, dir, probes,
      "vec_id", "embedding", cents, nprobe = 2, k = 5))
    val full = serve()
    val doomedIds = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    Similarity.deleteFromIvfIndex(spark, doomedIds, "vec_id", dir)
    val masked = serve()
    val wantMasked = asSet(Similarity.ivfTopK(
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      probes, "vec_id", "embedding", cents, nprobe = 2, k = 5))
    assert(masked == wantMasked && masked != full)
    // re-append pre-compact refuses
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(spark,
        emb.filter(col("vec_id") % 7 === 3).limit(2), "vec_id", "embedding", dir)
    }
    assert(e1.getMessage.contains("tombstoned"))
    // compact drops physically (root swap layout — tombstone dir goes
    // with the swapped-away root) and the deleted ids re-append
    Similarity.compactIvfIndex(spark, dir)
    assert(serve() == masked)
    assert(spark.read.parquet(dir).filter(col("id") % 7 === 3).count() == 0)
    assert(!new java.io.File(s"$dir/_tomb").exists,
      "the tombstone set must not survive the compact")
    Similarity.appendIvfIndex(spark,
      emb.filter(col("vec_id") % 7 === 3), "vec_id", "embedding", dir)
    assert(serve() == full)
  }

  test("MinHash delete lifecycle: a deleted doc stops vetoing immediately; compact drops it") {
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val dir = java.nio.file.Files.createTempDirectory("mh_del").toString + "/i"
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", dir,
      n = 3, h = 16, parity = true)
    def admitted() = Dedup.dropSeenNearDup(batch,
        Dedup.readMinhashIndex(spark, dir, n = 3, h = 16, parity = true),
        "doc_id", "text", n = 3, h = 16, b = 8, minAgree = 0.5, parity = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val before = admitted()
    // delete a third of the corpus from the index: the batch must now
    // dedup exactly as if the index had been built without those docs
    val doomed = corpus.filter(col("doc_id") % 3 === 1).select("doc_id")
    Dedup.deleteFromMinhashIndex(spark, doomed, "doc_id", dir)
    val after = admitted()
    val want = {
      val idx = Dedup.minhashIndex(corpus.filter(col("doc_id") % 3 =!= 1),
        "doc_id", "text", n = 3, h = 16, parity = true)
      Dedup.dropSeenNearDup(batch, idx, "doc_id", "text",
        n = 3, h = 16, b = 8, minAgree = 0.5, parity = true)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(after == want,
      "a masked index must dedup exactly like one built without the deleted docs")
    assert(before.subsetOf(after),
      "deleting index docs can only ADMIT more batch docs")
    // re-append pre-compact refuses; post-compact succeeds
    val e1 = intercept[IllegalArgumentException] {
      Dedup.appendMinhashIndex(spark, corpus.filter(col("doc_id") % 3 === 1),
        "doc_id", "text", dir)
    }
    assert(e1.getMessage.contains("tombstoned"))
    Dedup.compactMinhashIndex(spark, dir)
    assert(admitted() == after, "compaction must not change the dedup verdicts")
    assert(spark.read.parquet(s"$dir/data")
      .filter(col("id") % 3 === 1 && col("id") % 4 =!= 0).count() == 0,
      "compaction must physically drop tombstoned signatures")
    Dedup.appendMinhashIndex(spark, corpus.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", dir)
    assert(admitted() == before,
      "re-appending the deleted docs must restore the original verdicts")
  }

  // ── Crash-healing (ADVICE r17): a delete that crashed between its
  // tombstone append and its meta write leaves tombstones >
  // meta.deleted; the retry used to be a no-op (nothing new to
  // anti-join, meta never caught up, every verified serve and compact
  // refused forever). Deletes now reconcile the meta from the
  // tombstone data — the source of truth — on entry, so the
  // documented remedy ('re-run the delete') actually repairs.

  test("IVF-PQ: a crashed delete (tombstones ahead of meta) heals on the retry") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val probes = emb.orderBy("vec_id").limit(3)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_heal").toString + "/i"
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, dir)
    def serve() = asSet(Similarity.ivfPqTopKIndexed(spark, dir, probes,
      "vec_id", "embedding", cents, model, nprobe = 2, k = 5))
    // simulate the crash window: tombstones land, the meta write never
    // happens (exactly the state a killed driver leaves)
    emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").cast("long").as("id"))
      .write.mode("append").parquet(s"$dir/_tomb/g0")
    // every verified serve refuses, naming the real remedy
    val e = intercept[IllegalArgumentException] { serve() }
    assert(e.getMessage.contains("re-run the delete")
      && e.getMessage.contains("self-heal"), e.getMessage)
    // the user's retry of the SAME delete heals the meta and is then
    // a no-op on the tombstone set (idempotent)
    Similarity.deleteFromIvfPqIndex(spark,
      emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", dir)
    val masked = serve()
    assert(masked == asSet(Similarity.ivfPqTopK(
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      probes, "vec_id", "embedding", cents, model, nprobe = 2, k = 5)),
      "the healed index must serve the survivors")
    // compact now proceeds (it used to refuse forever)
    Similarity.compactIvfPqIndex(spark, dir)
    assert(serve() == masked)
  }

  test("float IVF: a crashed delete heals on the retry; lost tombstones refuse with the rebuild diagnosis") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
    val probes = emb.orderBy("vec_id").limit(3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_heal").toString + "/i"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", cents, dir)
    def serve() = asSet(Similarity.ivfTopKIndexed(spark, dir, probes,
      "vec_id", "embedding", cents, nprobe = 2, k = 5))
    emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").cast("long").as("id"))
      .write.mode("append").parquet(s"$dir/_tomb")
    val e = intercept[IllegalArgumentException] { serve() }
    assert(e.getMessage.contains("re-run the delete"), e.getMessage)
    // retry with a DIFFERENT (empty-intersection) id set still heals —
    // the reconciliation runs on entry, not only when new ids land
    Similarity.deleteFromIvfIndex(spark,
      Seq(-1L).toDF("vec_id"), "vec_id", dir)
    assert(serve() == asSet(Similarity.ivfTopK(
      emb.filter(col("vec_id") % 7 =!= 3), "vec_id", "embedding",
      probes, "vec_id", "embedding", cents, nprobe = 2, k = 5)))
    // the OTHER direction — tombstone files lost (meta ahead) — has no
    // record to heal from: the delete refuses with the rebuild
    // diagnosis instead of silently zeroing the takedown
    val fs = new java.io.File(s"$dir/_tomb")
    org.apache.commons.io.FileUtils.deleteDirectory(fs)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.deleteFromIvfIndex(spark, Seq(-1L).toDF("vec_id"), "vec_id", dir)
    }
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
  }

  test("MinHash: a crashed delete heals on the retry") {
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("mh_heal").toString + "/i"
    Dedup.writeMinhashIndex(corpus, "doc_id", "text", dir,
      n = 3, h = 16, parity = true)
    corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id").as("id"))
      .write.mode("append").parquet(s"$dir/_tomb")
    val e = intercept[IllegalArgumentException] {
      Dedup.readMinhashIndex(spark, dir, n = 3, h = 16, parity = true).count()
    }
    assert(e.getMessage.contains("re-run"), e.getMessage)
    Dedup.deleteFromMinhashIndex(spark,
      corpus.filter(col("doc_id") % 3 === 1).select("doc_id"), "doc_id", dir)
    // healed: reads serve the survivors, compact proceeds
    assert(Dedup.readMinhashIndex(spark, dir, n = 3, h = 16, parity = true)
      .filter(col("id") % 3 === 1).count() == 0)
    Dedup.compactMinhashIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/data")
      .filter(col("id") % 3 === 1).count() == 0)
  }
}
