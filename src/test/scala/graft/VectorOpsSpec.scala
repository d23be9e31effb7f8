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
}
