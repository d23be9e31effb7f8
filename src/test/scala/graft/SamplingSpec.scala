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

  test("splitLeakage: per-row split leaks near-dup pairs, groupSplit cannot") {
    // pairs (1,2) and (3,4) are "near-dups"; group key shared per pair
    val docs = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"), (4L, "g2"),
      (5L, "g3"), (6L, "g4")).toDF("doc_id", "host")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id1", "id2")
    // per-row split: ids of a pair hash independently -> may straddle;
    // assert the audit reports exactly the pairs whose sides differ
    val rowSplit = Sampling.trainTestSplit(docs, "doc_id", 0.5)
    val sides = rowSplit.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = Seq((1L, 2L), (3L, 4L)).filter { case (a, b) => sides(a) != sides(b) }
    val leaked = Sampling.splitLeakage(pairs, "id1", "id2", rowSplit, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(leaked.sorted === expected.sorted)
    // group split by the key near-dups share: zero leakage, always
    val gs = Sampling.groupSplit(docs, "host", 0.5)
    assert(Sampling.splitLeakage(pairs, "id1", "id2", gs, "doc_id").count() === 0L)
  }

  test("dropLeakedTest removes exactly the leaked test docs; zero leakage after") {
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "test"), (4L, "train"),
      (5L, "test")).toDF("doc_id", "split")
    // (1,2) leaks (train-test), (2,3) is test-test (fine), (4,1) train-train
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("id1", "id2")
    val clean = Sampling.dropLeakedTest(assign, "doc_id", pairs, "id1", "id2")
    val ids = clean.select("doc_id").as[Long].collect().sorted
    assert(ids === Array(1L, 3L, 4L, 5L))    // only doc 2 (leaked test) dropped
    assert(Sampling.splitLeakage(pairs, "id1", "id2", clean, "doc_id").count() === 0L)
    // multi-way split: a (val, train) crossing pair must doom NOTHING
    // (neither side is test) — train and val stay untouched; and the
    // test side of a (val, test) pair is doomed regardless of column
    // order
    val three = Seq((1L, "train"), (2L, "val"), (3L, "test")).toDF("doc_id", "split")
    val p2 = Seq((2L, 1L), (2L, 3L)).toDF("id1", "id2") // val-train, val-test
    val c2 = Sampling.dropLeakedTest(three, "doc_id", p2, "id1", "id2")
      .select("doc_id").as[Long].collect().sorted
    assert(c2 === Array(1L, 2L))             // only test doc 3 dropped
  }

  test("weightedSample: k rows, dense ranks, weight<=0 excluded, repartition-stable") {
    val df = (1L to 200L).map(i => (i, if (i <= 5) 0.0 else i.toDouble))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length === 20)
    assert(got.map(_._2).sorted === (1L to 20L).toArray)
    assert(got.forall(_._1 > 5L), "zero-weight rows can never be drawn")
    val again = Sampling.weightedSample(df.repartition(7), "id", "w", k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    assert(again === got.sortBy(_._2), "sample must not depend on partitioning")
    // heavier weights really do tilt the draw: weight 1e6 vs weight 1
    // on 200 ids — the heavy block (ids 101+) should dominate the top 20
    val tilted = (1L to 200L).map(i => (i, if (i > 100) 1e6 else 1.0)).toDF("id", "w")
    val heavy = Sampling.weightedSample(tilted, "id", "w", k = 20)
      .collect().count(_.getLong(0) > 100L)
    assert(heavy >= 18, s"expected the heavy block to dominate, got $heavy/20")
  }

  test("stratifiedSample honors per-stratum rates") {
    val kept = Sampling.stratifiedSample(ids, "id", "lang",
      rates = Map("en" -> 1.0), defaultRate = 0.0)
    val langs = kept.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // de rate 0, en rate 1
    assert(kept.count() == ids.filter($"lang" === "en").count())
  }

  test("kFoldGroups: md5-unit bucketing, group-coherent, k-covering") {
    val df = (1L to 400L).map(i => (i, s"grp${i % 40}")).toDF("id", "g")
    val folds = Sampling.kFoldGroups(df, "g", 5)
    // every row of a group lands in the same fold
    assert(folds.groupBy("g").agg(countDistinct("fold").as("n"))
      .filter($"n" =!= 1L).count() === 0L)
    // folds live in [0, 5) and (with 40 groups) all folds occur
    val seen = folds.select("fold").distinct().as[Long].collect().toSet
    assert(seen.subsetOf((0L until 5L).toSet) && seen.size >= 3)
    // the bucket formula is exactly ⌊md5-unit(group)·k⌋ (clamped):
    // cross-check one group against a hand-computed md5
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("grp7".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val expected = math.min((java.lang.Long.parseLong(md, 16).toDouble
      / 4294967296.0 * 5).toLong, 4L)
    val got = folds.filter($"g" === "grp7").select("fold").distinct()
      .as[Long].collect()
    assert(got.toSeq === Seq(expected))
    // null group keys are one deterministic sentinel group, not dropped
    val withNull = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("id", "g")
    val nf = Sampling.kFoldGroups(withNull, "g", 5)
      .filter($"g".isNull).select("fold").distinct().as[Long].collect()
    assert(nf.length === 1)
  }

  test("splitBalanceChi2 equals a driver-side recomputation, zero cells included") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    val row = Sampling.splitBalanceChi2(df, "id", "g", testFrac = 0.2).collect()(0)
    assert(row.getLong(0) === 300L)
    assert(row.getLong(1) === 3L && row.getLong(2) === 2L)
    // recompute from the same deterministic assignment
    val cells = Sampling.trainTestSplit(df, "id", 0.2)
      .groupBy("g", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val gs = Seq("s0", "s1", "s2"); val sides = Seq("test", "train")
    val ng = gs.map(g => g -> sides.map(s => cells.getOrElse((g, s), 0L)).sum).toMap
    val ns = sides.map(s => s -> gs.map(g => cells.getOrElse((g, s), 0L)).sum).toMap
    val n = 300.0
    val terms = for (g <- gs; s <- sides) yield {
      val e = ng(g).toDouble * ns(s).toDouble / n
      val o = cells.getOrElse((g, s), 0L).toDouble
      (o - e) * (o - e) / e
    }
    val expected = terms.sorted.foldLeft(0.0)(_ + _)
    assert(row.getDouble(3) === expected)
  }

  test("poissonFromUnit: inverse CDF brackets, mean ≈ 1 over a unit grid") {
    val us = (0 until 1000).map(i => (i + 0.5) / 1000.0)
    val got = us.toDF("u")
      .select(Sampling.poissonFromUnit(col("u")).as("k")).as[Long].collect()
    assert(got.min === 0L)
    // P(X=0) = e^-1 ≈ 0.368: the low grid points map to 0
    assert(got.count(_ == 0L) === 368)
    // grid mean of an inverse-CDF draw approximates E[X] = 1
    val mean = got.sum.toDouble / got.length
    assert(mean > 0.95 && mean < 1.05, s"grid mean $mean")
    assert(got.max <= 8L)
  }

  test("bootstrapConversionCI: CI brackets the rate, stable under repartitioning") {
    val per = (1L to 400L).map(i => (i, i % 2, if (i % 5 == 0) 1L else 0L))
      .toDF("id", "arm", "conv")
    val a = Sampling.bootstrapConversionCI(per, "id", "arm", "conv", b = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val b2 = Sampling.bootstrapConversionCI(per.repartition(7), "id", "arm", "conv",
      b = 100).collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(a === b2, "bootstrap must not depend on partitioning")
    a.foreach { case (arm, (n, rate, lo, hi)) =>
      assert(n === 200L, s"arm $arm")
      assert(rate === 0.2)
      assert(lo <= rate && rate <= hi, s"arm $arm: [$lo, $hi] vs $rate")
      assert(hi - lo < 0.2, s"arm $arm: CI implausibly wide [$lo, $hi]")
    }
  }

  test("bootstrapConversionCI: an arm losing ALL replicates keeps its point row, NULL CI") {
    // id 49320 is a pinned md5 fixture: all 10 of its Poisson(1)
    // draws for b = 10 are zero (P ≈ e^-10 — found by search, stable
    // forever because the coin is md5("id:r")). The arm must surface
    // with its point rate and NULL bounds, not vanish (left join).
    val per = ((1L to 20L).map(i => (i, "big", i % 2))
      :+ ((49320L, "doomed", 1L))).toDF("id", "arm", "conv")
    val rows = Sampling.bootstrapConversionCI(per, "id", "arm", "conv", b = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val doomed = rows("doomed")
    assert(doomed.getLong(1) === 1L && doomed.getDouble(2) === 1.0,
      "point stats must survive")
    assert(doomed.isNullAt(3) && doomed.isNullAt(4),
      "no surviving replicate -> NULL CI bounds, not a missing arm")
    assert(!rows("big").isNullAt(3) && !rows("big").isNullAt(4))
  }

  test("bootstrapConversionCI: a 1-unit arm (dropped replicates) still gets both bounds") {
    // ADVICE r10: a single-unit arm loses ~37% of its replicates to
    // zero Poisson weight; ranking against the NOMINAL b left ci_hi
    // silently NULL. The cutoffs now come from the surviving count.
    val per = ((1L to 50L).map(i => (i, "big", if (i % 5 == 0) 1L else 0L))
      :+ ((999L, "tiny", 1L))).toDF("id", "arm", "conv")
    val rows = Sampling.bootstrapConversionCI(per, "id", "arm", "conv", b = 100)
      .collect().map(r => r.getString(0) -> r).toMap
    val tiny = rows("tiny")
    assert(!tiny.isNullAt(3) && !tiny.isNullAt(4),
      "both CI bounds must materialize even when replicates drop")
    // every surviving replicate of the all-converting unit has rate 1
    assert(tiny.getDouble(3) === 1.0 && tiny.getDouble(4) === 1.0)
    val big = rows("big")
    assert(!big.isNullAt(3) && !big.isNullAt(4))
    assert(big.getDouble(3) <= big.getDouble(2) && big.getDouble(2) <= big.getDouble(4))
  }

  test("weightedSampleKPerKey: A-ES race matches a driver recomputation; no Window planned") {
    val rows = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "k", "w")
    val got = Sampling.weightedSampleKPerKey(df, "k", "id", "w", k = 3, seed = 42L)
    // local twin of the exponential race (same md5 unit, same Math.log)
    def unit(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"42:$id".getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967296.0
    }
    val expected = rows.groupBy(_._2).flatMap { case (key, rs) =>
      rs.map { case (id, _, w) => (id, -math.log(unit(id)) / w) }
        .sortBy { case (id, p) => (p, id) }.take(3).zipWithIndex
        .map { case ((id, _), i) => (key, id, (i + 1).toLong) }
    }.toSet
    assert(got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet === expected)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "the point: a bounded partial agg, never a per-key window sort")
    val again = Sampling.weightedSampleKPerKey(df.repartition(7), "k", "id", "w", 3, 42L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === expected, "repartition-stable")
    // zero/NULL/NaN weights are excluded, never sampled (NaN needs
    // its own guard: Spark orders NaN above any number, so a plain
    // w > 0.0 filter would admit it)
    val withZero = (rows :+ ((99L, "even", 0.0))
      :+ ((98L, "even", Double.NaN))).toDF("id", "k", "w")
    val ids = Sampling.weightedSampleKPerKey(withZero, "k", "id", "w", 100, 42L)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(99L) && !ids.contains(98L) && ids.size === 40)
  }

  test("weightedSampleKPerKey rejects non-long-castable id columns loudly (ADVICE r11)") {
    // string/UUID doc ids would silently cast("long") to NULL in the
    // TopKAgg race — the degradation must be an error, not a NULL id
    val df = Seq(("doc-a", "k", 1.0), ("doc-b", "k", 2.0)).toDF("id", "k", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSampleKPerKey(df, "k", "id", "w", k = 1)
    }
    assert(e.getMessage.contains("long-castable id column"))
  }

  test("splitBalanceChi2: dof is (g-1)(s-1) — zero when one split level materializes") {
    // ADVICE r10: with an extreme testFrac only 'train' materializes;
    // the true dof of the g×1 table is 0 (and chi2 is 0), not g−1.
    val df = (1L to 60L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    val row = Sampling.splitBalanceChi2(df, "id", "g", testFrac = 1e-12).collect()(0)
    assert(row.getLong(1) === 3L, "three groups")
    assert(row.getLong(2) === 0L, "g×1 table has zero degrees of freedom")
    assert(row.getDouble(3) === 0.0, "observed == expected when s=1")
  }

  test("weightedSample excludes NaN weights (review r15)") {
    // NaN > 0.0 is TRUE under Spark's ordering and pow(u, 1/NaN)
    // sorts above every real key — a NaN-weighted row would hijack
    // rank 1 and displace a legitimate row
    val df = Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.0), (4L, 0.5))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!got.contains(2L), s"NaN-weighted row sampled: $got")
    assert(got == Set(1L, 3L, 4L))
  }

  test("splitBalanceChi2 counts a NULL group as a real group (review r15)") {
    // the old equality grid join dropped the NULL group's observed
    // counts (inflating chi2) while countDistinct excluded it from
    // dof — statistic and dof disagreed with the table actually built
    val rows = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) None else Some(s"g${i % 2}")))
    val df = rows.toDF("id", "grp")
    val out = Sampling.splitBalanceChi2(df, "id", "grp", testFrac = 0.5)
      .collect()(0)
    assert(out.getLong(1) == 3L,
      s"groups {null, g0, g1} must count 3; got ${out.getLong(1)}")
    val chi2 = out.getDouble(3)
    assert(!chi2.isNaN && chi2 >= 0.0 && chi2 < 40.0,
      s"chi2 must be a sane statistic over the true 3x2 table, got $chi2")
  }
}
