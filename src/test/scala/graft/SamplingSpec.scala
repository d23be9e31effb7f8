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

  test("stratifiedSample honors per-stratum rates") {
    val kept = Sampling.stratifiedSample(ids, "id", "lang",
      rates = Map("en" -> 1.0), defaultRate = 0.0)
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // de rate 0, en rate 1
    assert(kept.count() == ids.filter($"lang" === "en").count())
  }
}
