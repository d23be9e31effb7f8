package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: stability, nesting, stratification. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (1L to 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("deterministicSample: stable, nested across rates, edge rates exact") {
    val s10a = Sampling.deterministicSample(ids, "id", 0.1).select("id").as[Long].collect().toSet
    val s10b = Sampling.deterministicSample(ids, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s10a == s10b) // rerun-stable
    val s30 = Sampling.deterministicSample(ids, "id", 0.3).select("id").as[Long].collect().toSet
    assert(s10a.subsetOf(s30)) // nested samples
    assert(math.abs(s10a.size - 200) < 80) // ≈10% of 2000
    assert(Sampling.deterministicSample(ids, "id", 0.0).count() == 0L)
    assert(Sampling.deterministicSample(ids, "id", 1.0).count() == 2000L)
  }

  test("trainTestSplit: duplicate ids land on the same side, repartition-stable") {
    val withDups = ids.union(ids.limit(500))
    val sides = Sampling.trainTestSplit(withDups, "id", 0.25)
      .groupBy("id").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(sides == 0L)
    val a = Sampling.trainTestSplit(ids, "id", 0.25)
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    val b = Sampling.trainTestSplit(ids.repartition(7), "id", 0.25)
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    assert(a == b) // partitioning cannot change the split
  }

  test("trainTestSplit refuses to overwrite an existing split column") {
    val once = Sampling.trainTestSplit(ids, "id", 0.25)
    intercept[IllegalArgumentException] {
      Sampling.trainTestSplit(once, "id", 0.5)
    }
  }

  test("groupSplit: one side per group, null-safe, still repartition-stable") {
    val docs = (1L to 600L).map(i => (i, s"host${i % 40}")).toDF("id", "host")
    val split = Sampling.groupSplit(docs, "host", 0.25)
    // every group entirely on one side — the leakage-safety contract
    val mixed = split.groupBy("host").agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(mixed == 0L)
    // both sides populated at this frac on 40 groups
    assert(split.select("split").distinct().count() == 2L)
    // null group keys get a deterministic side, not a null
    val withNull = docs.withColumn("host",
      when($"id" <= 10, lit(null: String)).otherwise($"host"))
    val nullSides = Sampling.groupSplit(withNull, "host", 0.25)
      .filter($"host".isNull).select("split").distinct().as[String].collect()
    assert(nullSides.length == 1)
    // partitioning cannot change the assignment
    val a = Sampling.groupSplit(docs, "host", 0.25)
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    val b = Sampling.groupSplit(docs.repartition(7), "host", 0.25)
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("stratifiedSample honors per-stratum rates") {
    val kept = Sampling.stratifiedSample(ids, "id", "lang",
      rates = Map("en" -> 1.0), defaultRate = 0.0)
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // de rate 0, en rate 1
    assert(kept.count() == ids.filter($"lang" === "en").count())
  }
}
