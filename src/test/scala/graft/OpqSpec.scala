package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}
import graft.functions.VectorOps

/** OPQ (Ge et al. CVPR'13, non-parametric alternating variant):
  * Procrustes hand case + orthogonality, the trainer's quantization-
  * error win over unrotated PQ, and the rotation-invariance of exact
  * geometry that lets OPQ compose with the whole IVF-PQ stack. */
class OpqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def matmulT(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    Array.tabulate(d, d)((i, j) => (0 until d).map(k => a(i)(k) * a(j)(k)).sum)
  }

  test("procrustes: hand case and orthogonality on a generic cross-moment") {
    // M = [[0, -2], [2, 0]]: MᵀM = 4I, σ = (2, 2), U = M/2 →
    // R = U·Vᵀ = [[0, -1], [1, 0]] — the 90° rotation, by hand
    val r = Similarity.procrustes(Array(Array(0.0, -2.0), Array(2.0, 0.0)))
    assert(math.abs(r(0)(0)) < 1e-12 && math.abs(r(0)(1) + 1.0) < 1e-12 &&
      math.abs(r(1)(0) - 1.0) < 1e-12 && math.abs(r(1)(1)) < 1e-12,
      s"hand Procrustes: ${r.map(_.mkString(",")).mkString(";")}")
    // generic deterministic M: R·Rᵀ = I within Jacobi tolerance.
    // (ANY sin(f(i) + g(j)) matrix is rank ≤ 2 by angle addition —
    // the fract-hash breaks separability and keeps M full-rank; the
    // refusal below pins that a genuinely deficient M refuses.)
    val d = 16
    val m = Array.tabulate(d, d) { (i, j) =>
      val v = math.sin((i * d + j + 1) * 12.9898) * 43758.5453
      v - math.floor(v)
    }
    val rr = matmulT(Similarity.procrustes(m))
    (0 until d).foreach { i =>
      (0 until d).foreach { j =>
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(rr(i)(j) - want) < 1e-10,
          s"RRᵀ[$i][$j] = ${rr(i)(j)}")
      }
    }
    // a rank-deficient cross-moment refuses loudly instead of
    // completing an arbitrary (layout-dependent) rotation
    val low = Array.tabulate(d, d)((i, j) => math.sin(i * 7 + j * 3 + 1.0))
    val e = intercept[IllegalArgumentException] { Similarity.procrustes(low) }
    assert(e.getMessage.contains("rank-deficient"))
  }

  test("trainOpq: orthogonal rotation that does not lose to unrotated PQ") {
    val model = Similarity.trainOpq(emb, "vec_id", "embedding", d = 64,
      m = 8, k = 16, iters = 3, pqMaxIter = 3)
    // orthogonality — the property that makes OPQ a free pre-step for
    // the whole stack (exact L2/cosine geometry unchanged)
    val rr = matmulT(model.rotation)
    (0 until 64).foreach { i =>
      (0 until 64).foreach { j =>
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(rr(i)(j) - want) < 1e-9, s"RRᵀ[$i][$j] = ${rr(i)(j)}")
      }
    }
    // quantization MSE: the alternation must not end WORSE than the
    // identity-rotation baseline (it usually wins; the margin is
    // corpus-dependent, so the pin is "no loss" + the measured ratio
    // is printed for the stress record)
    val plain = Similarity.trainPQ(emb, "vec_id", "embedding", d = 64,
      m = 8, k = 16, maxIter = 3)
    val mseIdentity = Similarity.quantizationMse(
      emb.select(VectorOps.toDouble(col("embedding")).as("v")), "v", plain)
    val rotated = Similarity.rotateVectors(emb, "vec_id", "embedding",
      model.rotation, "r")
    val mseOpq = Similarity.quantizationMse(rotated, "r", model.pq)
    info(f"quantization MSE: identity $mseIdentity%.6f vs OPQ $mseOpq%.6f " +
      f"(ratio ${mseOpq / mseIdentity}%.4f)")
    assert(mseOpq <= mseIdentity * 1.0001,
      f"OPQ must not lose to unrotated PQ: $mseOpq%.6f vs $mseIdentity%.6f")
  }

  test("trainOpqIvf: the full-stack (coarse + residual) reconstruction never loses to unrotated") {
    // the production objective: x̂ = c(y) + decode(codes(y − c(y))).
    // trainOpq's raw-PQ objective is misaligned with the residual
    // serve (measured at the 1M stress); this trainer alternates
    // against the served reconstruction itself.
    val model = Similarity.trainOpqIvf(emb, "vec_id", "embedding", d = 64,
      kCells = 8, m = 8, k = 16, iters = 3, lloydIter = 3, pqMaxIter = 2)
    val rr = matmulT(model.rotation)
    (0 until 64).foreach { i =>
      (0 until 64).foreach { j =>
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(rr(i)(j) - want) < 1e-9, s"RRᵀ[$i][$j] = ${rr(i)(j)}")
      }
    }
    // unrotated baseline with the identical training recipe
    val cents0f = KMeans.fit(emb, "vec_id", "embedding",
      KMeans.FirstK(8), maxIter = 3).centroids
    val pq0 = Similarity.trainPQResidual(emb, "vec_id", "embedding",
      d = 64, cents0f, m = 8, k = 16, maxIter = 2)
    val raw = emb.select(graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
    val mse0 = Similarity.ivfPqReconstructionMse(raw, "v", cents0f, pq0)
    val rotated = Similarity.rotateVectors(emb, "vec_id", "embedding",
      model.rotation, "r")
    val mse1 = Similarity.ivfPqReconstructionMse(rotated, "r",
      model.cents, model.pq)
    info(f"full-stack reconstruction MSE: unrotated $mse0%.6f vs OPQ-IVF " +
      f"$mse1%.6f (ratio ${mse1 / mse0}%.4f)")
    assert(mse1 <= mse0 * 1.0001,
      f"OPQ-IVF must not lose to the unrotated residual stack: $mse1%.6f vs $mse0%.6f")
  }

  test("rotation invariance: exact squared distances survive the rotation bit-near") {
    // m=8 (dsub=8, 16 codewords spanning 8 dims) keeps the
    // reconstruction full-rank at this tiny corpus; m=4's 16
    // codewords in a 16-dim subspace sit exactly at the span
    // boundary and trip the Procrustes rank refusal
    val model = Similarity.trainOpq(emb, "vec_id", "embedding",
      d = 64, m = 8, k = 16, iters = 2, pqMaxIter = 2)
    val rot = Similarity.rotateVectors(emb.limit(50), "vec_id", "embedding",
      model.rotation, "r")
    val both = emb.limit(50)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("x"))
      .join(rot, "vec_id")
    val pairs = both.as("a").crossJoin(both.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(VectorOps.sqDist(col("a.x"), col("b.x")).as("raw"),
        VectorOps.sqDist(col("a.r"), col("b.r")).as("rotated"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(a - b) <= 1e-9 * math.max(a, 1.0),
        s"rotation must preserve exact distances: $a vs $b")
    }
  }

  test("saveOpq/loadOpq: bit-exact round trip; swapped or corrupt halves refused") {
    // VERDICT r16 item 1: the rotation freezes like a codebook —
    // versioned artifact, fingerprint pairing, loud refusals
    val model = Similarity.trainOpq(emb, "vec_id", "embedding", d = 64,
      m = 8, k = 16, iters = 1, pqMaxIter = 1)
    val base = java.nio.file.Files.createTempDirectory("opq_art_").toString
    val path = s"$base/m"
    Similarity.saveOpq(spark, path, model)
    val lm = Similarity.loadOpq(spark, path)
    assert(lm.rotation.map(_.toSeq).toSeq == model.rotation.map(_.toSeq).toSeq,
      "rotation must round-trip bit-exactly")
    assert(Similarity.pqFingerprint(lm.pq) == Similarity.pqFingerprint(model.pq))
    // a hand-swapped pq/ directory (codebooks from a DIFFERENT
    // training run) refuses at load — serving them would silently
    // decode garbage under the paired rotation
    val other = Similarity.trainOpq(emb.filter($"vec_id" % 2 === 0),
      "vec_id", "embedding", d = 64, m = 8, k = 16, iters = 1, pqMaxIter = 1)
    val sPath = s"$base/swapped"
    Similarity.saveOpq(spark, sPath, model)
    Similarity.savePQ(spark, s"$sPath/pq", other.pq) // the swap
    val e1 = intercept[IllegalArgumentException] { Similarity.loadOpq(spark, sPath) }
    assert(e1.getMessage.contains("pairing"))
    // a bit-corrupted rotation refuses by fingerprint
    val cPath = s"$base/corrupt"
    Similarity.saveOpq(spark, cPath, model)
    spark.read.parquet(s"$cPath/rotation")
      .withColumn("r", transform(col("r"), x => x + lit(1e-3)))
      .write.mode("overwrite").parquet(s"$cPath/rotation2")
    val fs = new java.io.File(s"$cPath/rotation")
    org.apache.commons.io.FileUtils.deleteDirectory(fs)
    new java.io.File(s"$cPath/rotation2").renameTo(fs)
    val e2 = intercept[IllegalArgumentException] { Similarity.loadOpq(spark, cPath) }
    assert(e2.getMessage.contains("fingerprint"))
  }

  test("saveOpqIvf/loadOpqIvf round trip; rotated persisted-index lifecycle with mixed-space refusals") {
    // the q_opq_refresh surface in miniature: freeze the triple, load
    // it, build/append/serve a rotated index, and pin every
    // mixed-space refusal direction (ADVICE r16: an OPQ index served
    // with unrotated probes must refuse, not return garbage)
    val rot = EntryVector.opqTestRotation(64)
    val re = Similarity.rotateVectors(emb, "vec_id", "embedding", rot, "r")
    val cents = KMeans.initCentroids(re, "vec_id", "r", KMeans.FirstK(8))
    val pq = Similarity.trainPQ(re, "vec_id", "r", d = 64, m = 4, k = 16,
      maxIter = 0)
    val model = Similarity.OpqIvfModel(rot, cents, pq)
    val base = java.nio.file.Files.createTempDirectory("opqivf_").toString
    Similarity.saveOpqIvf(spark, s"$base/opq", model)
    val lm = Similarity.loadOpqIvf(spark, s"$base/opq")
    assert(lm.rotation.map(_.toSeq).toSeq == rot.map(_.toSeq).toSeq)
    assert(Similarity.pqFingerprint(lm.pq) == Similarity.pqFingerprint(pq))
    // lifecycle: build 2/3 rotated, append 1/3 rotated, serve RAW
    // probes through the rotated entry — must equal the in-memory
    // search over pre-rotated inputs bit-for-bit
    val idx = s"$base/index"
    Similarity.buildIvfPqIndexRotated(emb.filter($"vec_id" % 3 =!= 0),
      "vec_id", "embedding", lm, idx)
    Similarity.appendIvfPqIndexRotated(spark, emb.filter($"vec_id" % 3 === 0),
      "vec_id", "embedding", lm, idx)
    val probes = emb.orderBy("vec_id").limit(3)
    def asSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val got = asSet(Similarity.ivfPqTopKIndexedRotated(spark, idx,
      probes, "vec_id", "embedding", lm, nprobe = 2, k = 5))
    val want = asSet(Similarity.ivfPqTopK(re, "vec_id", "r",
      re.orderBy("vec_id").limit(3), "vec_id", "r", cents, pq,
      nprobe = 2, k = 5))
    assert(got == want && got.nonEmpty,
      "rotated persisted serve must equal the in-memory rotated search")
    // the index survives a compact (meta copied verbatim, rotation
    // provenance included) and still serves identically
    Similarity.compactIvfPqIndex(spark, idx)
    assert(asSet(Similarity.ivfPqTopKIndexedRotated(spark, idx,
      probes, "vec_id", "embedding", lm, nprobe = 2, k = 5)) == got)
    // refusal 1: the PLAIN serve against a rotated index
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, idx, probes, "vec_id", "embedding",
        cents, pq, nprobe = 2, k = 5)
    }
    assert(e1.getMessage.contains("ROTATED"))
    // refusal 2: the rotated serve against a PLAIN index
    val plainIdx = s"$base/plain"
    Similarity.buildIvfPqIndex(re, "vec_id", "r", cents, pq, plainIdx)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexedRotated(spark, plainIdx, probes,
        "vec_id", "embedding", lm, nprobe = 2, k = 5)
    }
    assert(e2.getMessage.contains("UNROTATED"))
    // refusal 3: a DIFFERENT rotation (drifted artifact) at append
    val rot2 = rot.map(_.clone())
    rot2(0) = rot(1).clone(); rot2(1) = rot(0).clone() // still orthogonal
    val lm2 = Similarity.OpqIvfModel(rot2, cents, pq)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndexRotated(spark,
        emb.limit(2).select(($"vec_id" + 700000L).as("vec_id"), $"embedding"),
        "vec_id", "embedding", lm2, idx)
    }
    assert(e3.getMessage.contains("DIFFERENT OPQ rotation"))
    // refusal 4: the plain APPEND against a rotated index
    val e4 = intercept[IllegalArgumentException] {
      Similarity.appendIvfPqIndex(spark,
        emb.limit(2).select(($"vec_id" + 700000L).as("vec_id"), $"embedding"),
        "vec_id", "embedding", pq, idx)
    }
    assert(e4.getMessage.contains("ROTATED"))
  }
}
