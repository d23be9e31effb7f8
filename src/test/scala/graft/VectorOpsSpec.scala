package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def oneRow(a: Seq[Double], b: Seq[Double]) =
    Seq((a, b)).toDF("a", "b")

  test("euclidean matches reference formula (KMeans.java:116-122)") {
    val d = oneRow(Seq(0.0, 3.0), Seq(4.0, 0.0))
      .select(VectorOps.euclidean($"a", $"b")).as[Double].head()
    assert(d === 5.0)
  }

  test("sqDist is exact on integer-valued doubles") {
    val d = oneRow(Seq(1.0, 2.0, 3.0), Seq(3.0, 5.0, 3.0))
      .select(VectorOps.sqDist($"a", $"b")).as[Double].head()
    assert(d === 13.0)
  }

  test("dot / norm2 / cosine") {
    val r = oneRow(Seq(1.0, 0.0), Seq(0.0, 1.0))
      .select(VectorOps.dot($"a", $"b"), VectorOps.norm2($"a"),
        VectorOps.cosine($"a", $"b")).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 0.0)
    val same = oneRow(Seq(2.0, 2.0), Seq(4.0, 4.0))
      .select(VectorOps.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(same - 1.0) < 1e-12)
  }

  test("cosine with zero vector is null, not NaN") {
    val r = oneRow(Seq(0.0, 0.0), Seq(1.0, 1.0))
      .select(VectorOps.cosine($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("vecAdd / vecScale") {
    val r = oneRow(Seq(1.0, 2.0), Seq(10.0, 20.0))
      .select(VectorOps.vecAdd($"a", $"b"), VectorOps.vecScale($"a", lit(3.0))).head()
    assert(r.getSeq[Double](0) == Seq(11.0, 22.0))
    assert(r.getSeq[Double](1) == Seq(3.0, 6.0))
  }

  test("native sqDist/dot kernels are bit-identical to the HOF twins") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val d = 1 + rnd.nextInt(80)
      (i.toLong,
        Seq.fill(d)(rnd.nextDouble() * 2e3 - 1e3),
        Seq.fill(d)(rnd.nextDouble() * 2e3 - 1e3))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
      VectorOps.sqDist($"a", $"b"), VectorOps.dot($"a", $"b"),
      VectorOps.sqDistHof($"a", $"b"), VectorOps.dotHof($"a", $"b")).collect()
    got.foreach { r =>
      // bitwise equality, not tolerance — identical fold order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"sqDist row ${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"dot row ${r.getLong(0)}")
    }
  }

  test("native kernels null on length mismatch and null elements, 0.0 on empty") {
    val df = Seq((1L, Seq(1.0, 2.0), Seq(1.0)),
      (2L, Seq.empty[Double], Seq.empty[Double])).toDF("id", "a", "b")
    val r = df.orderBy($"id")
      .select(VectorOps.sqDist($"a", $"b"), VectorOps.dot($"a", $"b")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))       // length mismatch
    assert(r(1).getDouble(0) === 0.0 && r(1).getDouble(1) === 0.0)
    val withNull = spark.sql("SELECT array(1.0d, CAST(NULL AS DOUBLE)) a, array(1.0d, 2.0d) b")
    val rn = withNull.select(VectorOps.sqDist($"a", $"b"), VectorOps.dot($"a", $"b")).head()
    assert(rn.isNullAt(0) && rn.isNullAt(1))
  }

  test("quantizeInt8: codes in [0,255], endpoints exact, reconstruction within half a step") {
    val vecs = Seq(
      Seq(-1.0, 0.0, 0.25, 1.0),
      Seq(3.0, 3.0, 3.0),               // constant vector → all codes 0
      (1 to 64).map(i => math.sin(i.toDouble)).toSeq
    ).toDF("v")
    val q = vecs.select($"v", VectorOps.quantizeInt8($"v").as("q"))
      .select($"v", $"q.codes".as("codes"), $"q.lo".as("lo"), $"q.hi".as("hi"),
        VectorOps.dequantizeInt8($"q").as("vhat"))
    q.collect().foreach { r =>
      val v = r.getSeq[Double](0)
      val codes = r.getSeq[Int](1)
      val (lo, hi) = (r.getDouble(2), r.getDouble(3))
      val vhat = r.getSeq[Double](4)
      assert(codes.forall(c => c >= 0 && c <= 255))
      assert(lo === v.min && hi === v.max)
      if (hi > lo) {
        // extremes hit the end codes exactly
        assert(codes(v.indexOf(lo)) === 0 && codes(v.indexOf(hi)) === 255)
        val step = (hi - lo) / 255.0
        v.zip(vhat).foreach { case (x, xh) =>
          assert(math.abs(x - xh) <= step / 2 + 1e-12,
            s"reconstruction error ${math.abs(x - xh)} > half-step ${step / 2}")
        }
      } else {
        assert(codes.forall(_ == 0) && vhat.forall(_ == lo))
      }
    }
  }
}
