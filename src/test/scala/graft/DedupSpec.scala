package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val unrelated = "completely different words about spark engines and parquet files here"

  test("shingles: distinct trigrams, empty below n tokens") {
    val df = Seq("a b c d", "a b", "x y x y x y").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1) === Seq.empty)
    // "x y x", "y x y" repeat — distinct keeps 2
    assert(rows(2).sorted === Seq("x y x", "y x y"))
  }

  test("exact dedup groups duplicates and keeps lowest id") {
    val df = Seq((1L, base), (2L, nearDup), (3L, base), (4L, base)).toDF("doc_id", "text")
    val groups = Dedup.exactGroups(df, "doc_id", Seq("text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(groups === Array((3L, 1L), (1L, 2L))) // base×3 keep 1, nearDup×1 keep 2
    val kept = Dedup.dropExactDuplicates(df, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L))
  }

  test("minhash LSH surfaces near-duplicates, not unrelated docs") {
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(df, "doc_id", "text", n = 3, h = 16, b = 8, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    // 13 tokens -> 11 trigrams each, differing only in the last token
    // -> 10 shared of 12 distinct-union
    assert(math.abs(pairs(0)._3 - 10.0 / 12.0) < 1e-12)
  }

  test("identical docs collide in every band") {
    val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val buckets = Dedup.minhashBuckets(df, "doc_id", "text", n = 3, h = 16, b = 8)
    val byBand = buckets.groupBy("band", "bucket").count()
      .filter(col("count") === 2).count()
    assert(byBand === 8L)
  }

  test("simhash: identical tokens give identical fingerprints; near-dups are close") {
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, unrelated)).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(Dedup.tokens(col("text"))).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L).length === 16)
    val dist = df.as("a").crossJoin(df.as("b"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.hammingHex(col("a.fp"), col("b.fp")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(dist((1L, 2L)) === 0)
    assert(dist((1L, 3L)) < dist((1L, 4L))) // near-dup closer than unrelated
    assert(dist((1L, 3L)) === dist((3L, 1L)))
  }
}
