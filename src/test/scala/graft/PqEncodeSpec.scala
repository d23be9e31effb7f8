package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KMeans, Similarity}
import graft.functions.VectorOps

/** Bit-parity pins for the native PQ kernels (PqEncodeExpr /
  * AdcDistExpr) against their HOF twins, plus the cid-indexed
  * codebook-lookup contract (review r15): a Lloyd-trained codebook
  * can lose empty cells (KMeans.fit keepEmpty=false), and the retired
  * position-indexed literal read the WRONG codeword for every code
  * above a vanished cid. Gate models train at maxIter=0 (cids always
  * contiguous), so these pins are the only guard for trained models. */
class PqEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native encode == HOF encode, bit for bit (contiguous gate model)") {
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val a = Similarity.encodePQ(emb, "embedding", model)
      .select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Similarity.encodePQHof(emb, "embedding", model)
      .select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("native ADC == HOF ADC, bit for bit, through the serve") {
    val model = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 4, k = 16, maxIter = 0)
    val codes = Similarity.encodePQ(emb, "embedding", model)
      .select("vec_id", "codes")
    val pv = VectorOps.toDouble(
      typedlit(emb.orderBy("vec_id").limit(1).collect()(0)
        .getSeq[Float](1).map(_.toDouble)))
    val hof = codes.select($"vec_id",
      Similarity.adcDistHof($"codes", pv, model).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val nat = codes.select($"vec_id",
      Similarity.adcDistNative($"codes", pv, model).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nat.nonEmpty && nat.keySet == hof.keySet)
    nat.foreach { case (id, d) =>
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(hof(id)),
        s"ADC mismatch for vec $id: native $d vs HOF ${hof(id)}")
    }
  }

  test("vanished-cid codebook: lookup is by cid, and native == HOF") {
    // k=4 with cid 3 vanished: codes referencing cid 4 must read
    // codeword 4, not the 3rd list position (the retired positional
    // literal returned codeword 4 for code 3 and null for code 4)
    val books: IndexedSeq[KMeans.Centroids] = IndexedSeq(
      Array(1 -> Array(0.0, 0.0), 2 -> Array(10.0, 0.0),
        4 -> Array(0.0, 10.0)),
      Array(1 -> Array(1.0, 1.0), 2 -> Array(-5.0, 2.0),
        4 -> Array(7.0, -3.0)))
    val model = Similarity.PQModel(d = 4, m = 2, k = 4, codebooks = books)
    val rows = Seq(
      (1L, Seq(0.1, 0.2, 1.0, 1.1)),   // nearest: cid 1 / cid 1
      (2L, Seq(0.5, 9.0, 6.5, -2.5)),  // nearest: cid 4 / cid 4
      (3L, Seq(9.5, 0.5, -4.5, 2.2))   // nearest: cid 2 / cid 2
    ).toDF("vec_id", "v")
    val nat = Similarity.encodePQ(rows, "v", model)
      .select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = Similarity.encodePQHof(rows, "v", model)
      .select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(nat == hof)
    assert(nat(2L) == Seq(4, 4), s"expected cid 4 picked, got ${nat(2L)}")
    // ADC against code 4 must use codeword 4's values
    val probe = VectorOps.toDouble(typedlit(Seq(0.0, 10.0, 7.0, -3.0)))
    val coded = Seq((2L, Seq(4, 4))).toDF("vec_id", "codes")
    val dN = coded.select(
      Similarity.adcDistNative($"codes", probe, model).as("d"))
      .collect()(0).getDouble(0)
    val dH = coded.select(
      Similarity.adcDistHof($"codes", probe, model).as("d"))
      .collect()(0).getDouble(0)
    assert(dN == 0.0 && dH == 0.0,
      s"probe equal to codeword 4|4 must be at ADC distance 0, got $dN / $dH")
    // a code referencing the vanished cid nulls on BOTH paths
    val bad = Seq((9L, Seq(3, 1))).toDF("vec_id", "codes")
    assert(bad.select(Similarity.adcDistNative($"codes", probe, model))
      .collect()(0).isNullAt(0))
    assert(bad.select(Similarity.adcDistHof($"codes", probe, model))
      .collect()(0).isNullAt(0))
  }

  test("malformed inputs: native nulls; HOF throws under ANSI element_at") {
    val books: IndexedSeq[KMeans.Centroids] = IndexedSeq(
      Array(1 -> Array(0.0, 0.0), 2 -> Array(1.0, 1.0)),
      Array(1 -> Array(2.0, 2.0), 2 -> Array(3.0, 3.0)))
    val model = Similarity.PQModel(d = 4, m = 2, k = 2, codebooks = books)
    val probe = VectorOps.toDouble(typedlit(Seq(0.0, 0.0, 2.0, 2.0)))
    // out-of-range code, code 0, too many codes: the native kernel
    // NULLS (adcValid); the HOF twin THROWS under ANSI element_at —
    // the kernel is strictly gentler, so pin native-only here
    val cases = Seq(
      (1L, Seq(0, 1)),   // code below 1
      (2L, Seq(1, 3)),   // code above k
      (3L, Seq(1, 1, 1)) // more codes than subspaces
    ).toDF("vec_id", "codes")
    val n = cases.select($"vec_id",
      Similarity.adcDistNative($"codes", probe, model).as("d")).collect()
    assert(n.forall(_.isNullAt(1)))
    intercept[Exception] {
      cases.select($"vec_id",
        Similarity.adcDistHof($"codes", probe, model).as("d")).collect()
    }
    // a too-short vector nulls the encode on BOTH paths (review r15:
    // without encodePQHof's validity gate, the HOF would emit a real
    // code for the full subspace and FABRICATE the lowest cid for the
    // truncated one — [1, 1] here — silently indexing garbage codes)
    val short = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v")
    assert(Similarity.encodePQ(short, "v", model)
      .select($"codes").collect()(0).isNullAt(0))
    assert(Similarity.encodePQHof(short, "v", model)
      .select($"codes").collect()(0).isNullAt(0))
    // ... and so does the NULL vector itself
    val nul = Seq((2L, null: Seq[Double])).toDF("vec_id", "v")
    assert(Similarity.encodePQ(nul, "v", model)
      .select($"codes").collect()(0).isNullAt(0))
    assert(Similarity.encodePQHof(nul, "v", model)
      .select($"codes").collect()(0).isNullAt(0))
  }

  test("vanished-cid kernel expressions stay canonicalization-equal") {
    // review r15: denseBooks used to fill absent-cid slots with NaN,
    // and Scala boxed-double equality is numeric (NaN != NaN) — so a
    // vanished-cid AdcDistExpr/PqEncodeExpr compared unequal even to
    // an identical copy of itself, silently defeating plan
    // canonicalization and subexpression reuse for every Lloyd-trained
    // model that lost a cell. Absent slots now hold 0.0 (never read —
    // `present` gates every lookup), restoring case-class equality.
    val books: IndexedSeq[KMeans.Centroids] = IndexedSeq(
      Array(1 -> Array(0.0, 0.0), 2 -> Array(10.0, 0.0),
        4 -> Array(0.0, 10.0)),
      Array(1 -> Array(1.0, 1.0), 2 -> Array(-5.0, 2.0),
        4 -> Array(7.0, -3.0)))
    val model = Similarity.PQModel(d = 4, m = 2, k = 4, codebooks = books)
    val probe = VectorOps.toDouble(typedlit(Seq(0.0, 10.0, 7.0, -3.0)))
    // compare at the level that matters: canonicalized analyzed plans
    // (TreeNode equality is structural, so a NaN books field poisoned
    // it — two runs of the same query compared unequal)
    val dfc = Seq((1L, Seq(1, 1))).toDF("vec_id", "codes")
    def adcPlan() = dfc.select(
        Similarity.adcDistNative($"codes", probe, model).as("d"))
      .queryExecution.analyzed.canonicalized
    assert(adcPlan() == adcPlan(),
      "two identical vanished-cid ADC plans must canonicalize equal")
    val df = Seq((1L, Seq(0.1, 0.2, 1.0, 1.1))).toDF("vec_id", "v")
    def encPlan() = Similarity.encodePQ(df, "v", model)
      .queryExecution.analyzed.canonicalized
    assert(encPlan() == encPlan(),
      "two identical vanished-cid encode plans must canonicalize equal")
  }

  // ── Residual PQ (IVF-ADC proper — VERDICT r15 item 1) ────────────

  test("cellResidual kernel == HOF twin bit-for-bit on valid input; nulls on malformed") {
    val cents: KMeans.Centroids = Array(
      1 -> Array(1.0, 2.0, 3.0), 3 -> Array(-0.5, 0.25, 7.0),
      7 -> Array(0.0, 0.0, 0.125))
    val rows = Seq(
      (1L, Seq(0.3, 0.7, -2.5), 1), (2L, Seq(10.0, -1.0, 0.5), 3),
      (3L, Seq(0.1, 0.2, 0.3), 7), (4L, Seq(-4.0, 5.5, 6.25), 1))
    val df = rows.toDF("id", "v", "cell")
    def collectRes(c: org.apache.spark.sql.Column) =
      df.select($"id", c.as("r")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val nat = collectRes(graft.functions.VectorKernels.cellResidualCol(
      $"v", $"cell", cents.map(_._1).sorted,
      cents.sortBy(_._1).flatMap(_._2), 3))
    val hof = collectRes(Similarity.cellResidualHof($"v", $"cell", cents))
    assert(nat.nonEmpty && nat.keySet == hof.keySet)
    nat.foreach { case (id, r) =>
      assert(r.map(java.lang.Double.doubleToLongBits) ==
        hof(id).map(java.lang.Double.doubleToLongBits),
        s"residual mismatch for row $id: $r vs ${hof(id)}")
    }
    // malformed: wrong length, a null element, a null vector, a null
    // cell, and an unknown cell id all NULL the kernel result (the
    // HOF twin diverges only on the length mismatch — zip_with pads —
    // the kernels' documented gentler contract)
    val bad = Seq(
      (1L, Seq(1.0, 2.0), 1),            // too short
      (2L, null: Seq[Double], 1),        // null vector
      (3L, Seq(1.0, 2.0, 3.0), 99))      // unknown cell
      .toDF("id", "v", "cell")
      .union(Seq((4L, Seq(1.0), 1)).toDF("id", "v", "cell")
        .select($"id", array(lit(1.0), lit(null).cast("double"), lit(3.0)).as("v"), $"cell"))
      .union(Seq((5L, Seq(1.0, 2.0, 3.0), 1)).toDF("id", "v", "cell")
        .select($"id", $"v", lit(null).cast("int").as("cell")))
    val got = bad.select($"id", graft.functions.VectorKernels.cellResidualCol(
      $"v", $"cell", cents.map(_._1).sorted,
      cents.sortBy(_._1).flatMap(_._2), 3).as("r")).collect()
    got.foreach(r => assert(r.isNullAt(1),
      s"malformed row ${r.getLong(0)} must null the residual"))
  }

  test("residual-vs-raw parity at nprobe=all on a lossless corpus") {
    // 16-vector corpus, k=16, FirstK, maxIter=0: every vector is its
    // own codeword, so quantization is lossless in BOTH modes —
    // raw-mode adist IS the exact squared distance bit-for-bit, and
    // residual-mode adist is (q−c)−(x−c) summed, equal up to FP
    // cancellation (NOT bit-equal — (a−c)−(b−c) ≠ a−b in floats).
    // With nprobe = all cells nothing is pruned, so the two modes
    // must return the SAME neighbors in the SAME order, and residual
    // distances must sit within 1e-9 relative of raw's exact ones.
    val corpus = emb.orderBy("vec_id").limit(16).cache()
    try {
      val cents = KMeans.initCentroids(corpus, "vec_id", "embedding",
        KMeans.FirstK(4))
      val raw = Similarity.trainPQ(corpus, "vec_id", "embedding", d = 64,
        m = 4, k = 16, maxIter = 0)
      val res = Similarity.trainPQResidual(corpus, "vec_id", "embedding",
        d = 64, cents, m = 4, k = 16, maxIter = 0)
      assert(res.residualTo.isDefined && !raw.residual)
      val probes = corpus.orderBy("vec_id").limit(3)
      def serve(m: Similarity.PQModel) =
        Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
          probes, "vec_id", "embedding", cents, m, nprobe = 4, k = 15)
          .collect()
          .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getDouble(3)))
          .toMap
      val a = serve(raw)
      val b = serve(res)
      assert(a.nonEmpty && a.keySet == b.keySet)
      a.foreach { case (key, (idRaw, dRaw)) =>
        val (idRes, dRes) = b(key)
        assert(idRaw == idRes,
          s"neighbor order diverged at $key: raw $idRaw vs residual $idRes")
        assert(math.abs(dRes - dRaw) <= 1e-9 * math.max(dRaw, 1.0),
          s"residual adist $dRes too far from exact $dRaw at $key")
      }
    } finally { corpus.unpersist(); () }
  }

  test("residual provenance refusals: flat pqTopK, drifted quantizer, mixed-mode append") {
    val cents = KMeans.initCentroids(emb, "vec_id", "embedding",
      KMeans.FirstK(4))
    val res = Similarity.trainPQResidual(emb, "vec_id", "embedding",
      d = 64, cents, m = 4, k = 16, maxIter = 0)
    val probes = emb.orderBy("vec_id").limit(2)
    // flat PQ has no coarse cell to subtract — refuse loudly
    val codes = Similarity.encodePQ(emb, "embedding",
      Similarity.trainPQ(emb, "vec_id", "embedding", d = 64, m = 4,
        k = 16, maxIter = 0)).select("vec_id", "codes")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(codes, "vec_id", "codes", probes, "vec_id",
        "embedding", res, k = 5)
    }
    assert(e1.getMessage.contains("residual"))
    // the public encode entry takes RAW vectors — a residual model
    // would silently quantize garbage (review r16)
    val e0 = intercept[IllegalArgumentException] {
      Similarity.encodePQ(emb, "embedding", res)
    }
    assert(e0.getMessage.contains("residual"))
    // building under a DIFFERENT quantizer than the codebook's —
    // residuals would subtract the wrong centroids
    val drifted: KMeans.Centroids = cents.map { case (cid, v) =>
      if (cid == 1) cid -> v.map(_ + 0.25) else cid -> v }
    val dir = java.nio.file.Files.createTempDirectory("pqres").toString
    val e2 = intercept[IllegalArgumentException] {
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", drifted, res,
        s"$dir/bad")
    }
    assert(e2.getMessage.contains("different"))
    // a raw model can never serve (or append to) a residual index:
    // the fingerprint covers the mode, so the mixed-mode append is
    // refused as a codebook mismatch
    Similarity.buildIvfPqIndex(emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", cents, res, s"$dir/idx")
    val rawSameBooks = res.copy(residualTo = None)
    assert(Similarity.pqFingerprint(rawSameBooks) !=
      Similarity.pqFingerprint(res),
      "raw and residual models with identical books must never alias")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndex(spark, emb.filter($"vec_id" % 2 =!= 0),
        "vec_id", "embedding", rawSameBooks, s"$dir/idx")
    }
    assert(e3.getMessage.contains("does not match"))
    // savePQ/loadPQ round-trips the residual provenance (v2 artifact)
    // — fingerprint equality covers books + mode + quantizer binding
    // bit-exactly (Centroids are Arrays, so == would be reference eq)
    Similarity.savePQ(spark, s"$dir/pq", res)
    val loaded = Similarity.loadPQ(spark, s"$dir/pq")
    assert(loaded.residualTo == res.residualTo &&
      Similarity.pqFingerprint(loaded) == Similarity.pqFingerprint(res),
      "v2 artifact must round-trip residualTo bit-exactly")
  }
}
