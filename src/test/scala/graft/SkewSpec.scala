package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join: result equality with the plain join, and the hot key
  * actually spreads across salt values. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // hot key 7 carries 80% of left rows
    val left = ((1 to 400).map(i => (i.toLong, 7L)) ++
      (401 to 500).map(i => (i.toLong, (i % 10).toLong)))
      .toDF("row_id", "key")
    val right = (0 to 10).map(k => (k.toLong, s"payload_$k")).toDF("key", "payload")
    val plain = left.join(right, "key")
      .select("row_id", "key", "payload").collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", salts = 8, saltSrc = col("row_id"))
      .select("row_id", "key", "payload").collect().toSet
    assert(salted == plain && plain.size == 500)
  }

  test("salting spreads a hot key across salt buckets") {
    val left = (1 to 1000).map(i => (i.toLong, 7L)).toDF("row_id", "key")
    val saltCounts = left
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(saltCounts.keySet.size == 8) // every salt bucket hit
    assert(saltCounts.values.max < 1000L * 3 / 8) // no bucket dominates
  }

  test("skewReport: exact counts, shares, ceil salt factors, topK cut") {
    val rows = Seq.fill(25)("hot") ++ Seq.fill(10)("warm") ++ Seq.fill(5)("cold")
    val got = Skew.skewReport(rows.toDF("k"), "k", topK = 2, targetRows = 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.keySet === Set("hot", "warm"), "topK=2 keeps the two heaviest")
    assert(got("hot") === ((25L, 0.625, 3L)))  // ceil(25/10) = 3
    assert(got("warm") === ((10L, 0.25, 1L)))  // exactly 10/10 → 1, not 2
  }
}
