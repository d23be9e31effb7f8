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
}
