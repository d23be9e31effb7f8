package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterMetrics

/** Distributed contingency-table Jaccard must equal the reference's
  * literal n×n matrix loops (`KMeans.java:623-665`), including the
  * diagonal pairs and the -1 outlier exclusion. */
class ClusterMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(pairs: Seq[(Int, Int)]): Unit = {
    import spark.implicits._
    val (m11, m0, j) = ClusterMetrics.jaccardLocal(pairs)
    val row = ClusterMetrics.jaccard(pairs.toDF("truth", "pred"), "truth", "pred").collect()(0)
    assert(row.getLong(0) === m11)
    assert(row.getLong(1) === m0)
    assert(row.getDouble(2) === j)
  }

  test("matches reference matrix loops on a hand-built assignment") {
    check(Seq((1, 1), (1, 1), (1, 2), (2, 2), (2, 2), (3, 3)))
  }

  test("excludes -1 labels from co-membership on both sides") {
    // -1 rows never co-member (not even with themselves): KMeans.java:629,640
    check(Seq((-1, 1), (-1, 1), (1, -1), (1, 1), (2, 2), (-1, -1)))
  }

  test("perfect clustering gives jaccard = 1.0") {
    val pairs = Seq((1, 5), (1, 5), (2, 7), (2, 7), (3, 9))
    check(pairs)
    val (_, m0, j) = ClusterMetrics.jaccardLocal(pairs)
    assert(m0 === 0L)
    assert(j === 1.0)
  }

  test("matches on pseudo-random labelings with outliers") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(5) - 1, rnd.nextInt(4) - 1))
    check(pairs)
  }
}
