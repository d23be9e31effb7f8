package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("capPerKey keeps the n lowest ids per key") {
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c")
    ).toDF("id", "k")
    val kept = Curation.capPerKey(df, "k", "id", 2)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(kept === Set(("a", 1L), ("a", 2L), ("b", 4L), ("b", 5L), ("c", 6L)))
  }

  test("packByTokenBudget: shards respect the budget and never split a document") {
    val df = Seq(
      (1L, "k", "a b c"),            // 3 tokens, cum-before 0  -> shard 0
      (2L, "k", "a b c d"),          // 4 tokens, cum-before 3  -> shard 0
      (3L, "k", "a b c d e"),        // 5 tokens, cum-before 7  -> shard 0
      (4L, "k", "a b"),              // 2 tokens, cum-before 12 -> shard 1
      (5L, "k", (1 to 25).map(_ => "x").mkString(" ")), // 25 > budget: starts in shard 1, spills over unsplit
      (6L, "k", "a"),                // cum-before 39 -> shard 3
      (7L, "other", "a b c")         // independent key -> shard 0
    ).toDF("id", "k", "text")
    val got = Curation.packByTokenBudget(df, "k", "id", "text", budget = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) === ((3L, 0L)) && got(2L) === ((4L, 0L)) && got(3L) === ((5L, 0L)))
    assert(got(4L) === ((2L, 1L)))
    assert(got(5L) === ((25L, 1L)))  // starts in shard 1 (cum-before 14), unsplit
    assert(got(6L) === ((1L, 3L)))   // cum-before 39 div 10
    assert(got(7L) === ((3L, 0L)))
    // within every (key, shard), docs that STARTED the shard obey the
    // budget prefix rule: exclusive prefix sum div budget is constant
    val all = Curation.packByTokenBudget(df, "k", "id", "text", budget = 10L)
      .filter($"k" === "k").orderBy($"id").collect()
    val cums = all.scanLeft(0L)((acc, r) => acc + r.getLong(3)).init
    all.zip(cums).foreach { case (r, cumBefore) =>
      assert(r.getLong(4) === cumBefore / 10L)
    }
  }

  test("shuffleShards is deterministic, balanced-ish, and shard tracks the key range") {
    val df = (1L to 400L).map(i => (i, s"doc$i")).toDF("id", "text")
    val a = Curation.shuffleShards(df, "id", 8)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    val b = Curation.shuffleShards(df.repartition(13), "id", 8)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq) // partitioning-independent
    val byShard = a.groupBy(_._3)
    assert(a.forall(x => x._3 >= 0 && x._3 < 8))
    assert(byShard.size === 8) // 400 md5-uniform rows hit all 8 shards
    // shards are contiguous ranges of the shuffle key: max key of
    // shard s sorts before min key of shard s+1
    val bounds = byShard.toSeq.sortBy(_._1).map { case (s, xs) =>
      (s, xs.map(_._2).min, xs.map(_._2).max) }
    bounds.sliding(2).foreach {
      case Seq((_, _, hiPrev), (_, loNext, _)) => assert(hiPrev < loNext)
      case _ =>
    }
  }

  test("shuffled materializes one range partitioning: per-partition sorted, shard-aligned") {
    val df = (1L to 400L).map(i => (i, s"doc$i")).toDF("id", "text")
    val out = Curation.shuffled(df, "id", 8)
    assert(out.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val parts = out.select("shuffle_key", "shard").rdd
      .mapPartitions(it => Iterator(it.map(r => (r.getString(0), r.getInt(1))).toSeq))
      .collect().filter(_.nonEmpty)
    parts.foreach { p =>
      assert(p.map(_._1) == p.map(_._1).sorted) // sorted within partition
      assert(p.map(_._2).distinct == p.map(_._2).distinct.sorted) // shard ids non-interleaved
    }
    // every row survives the shuffle exactly once
    assert(out.count() === 400L)
  }

  test("histogram: exact widths, max clamped to last bucket, nulls excluded") {
    val df = (Seq.fill(5)(0L) ++ Seq(25L, 50L, 99L, 100L))
      .map(java.lang.Long.valueOf).map(Option(_)).padTo(10, None) // one null row
      .map(o => Tuple1(o.map(Long2long))).toDF("v")
    val h = Curation.histogram(df, "v", buckets = 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(h(0) === ((5L, 0.0, 10.0)))   // five zeros
    assert(h(2) === ((1L, 20.0, 30.0)))  // 25
    assert(h(5) === ((1L, 50.0, 60.0)))  // 50
    assert(h(9) === ((2L, 90.0, 100.0))) // 99 and the clamped max
    assert(h.values.map(_._1).sum === 9L) // null excluded
    // degenerate constant column: everything in bucket 0
    val const = Seq(7L, 7L, 7L).map(v => Tuple1(v)).toDF("v")
    val hc = Curation.histogram(const, "v", buckets = 4).collect()
    assert(hc.length == 1 && hc(0).getInt(0) == 0 && hc(0).getLong(1) == 3L)
  }

  test("madOutlierGate keeps the median band, drops the outlier, MAD=0 keeps equals only") {
    // key a: metrics 10,10,11,12,100 → med=11 (rank ceil(5/2)=3),
    // devs 1,1,0,1,89 → mad=1 (rank 3 of 0,1,1,1,89) → keep |x-11|<=2
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 11L), (4L, "a", 12L), (5L, "a", 100L),
      // key b: all equal → mad 0 → only exact median survives
      (6L, "b", 5L), (7L, "b", 5L), (8L, "b", 6L),
      // null metric drops (its own key so it doesn't shift a's ranks)
      (9L, "c", -1L)
    ).toDF("id", "k", "m")
      .withColumn("m", when($"m" === -1L, lit(null: java.lang.Long)).otherwise($"m"))
    val kept = Curation.madOutlierGate(df, "k", "id", "m", nMads = 2.0)
      .select("id").as[Long].collect().toSet
    // b: n=3, ranks of (5,5,6): med = rank-2 value = 5; devs 0,0,1 → mad=0
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 7L))
  }

  test("sourceProfile reports exact discrete percentiles per key") {
    // key a: lengths 1..4 tokens → p50 = 2nd smallest = 2, p90/p99 = 4th = 4
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x x"), (3L, "a", "x x x"), (4L, "a", "x x x x"),
      (5L, "b", "y y y y y")).toDF("id", "src", "text")
    val r = Curation.sourceProfile(df, "src", "id", "text")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r("a") === ((4L, 10L, 2L, 4L, 4L)))
    assert(r("b") === ((1L, 5L, 5L, 5L, 5L)))
  }

  test("rebalanceSources down-samples to the target mix, drops unspecified sources") {
    // a: 40 rows, b: 10, c: 10; target 50/50 a-b → N = min(40/.5, 10/.5) = 20
    // → rate a = .5*20/40 = 0.25, rate b = 1.0, c dropped
    val df = ((1L to 40L).map(i => (i, "a")) ++ (41L to 50L).map(i => (i, "b")) ++
      (51L to 60L).map(i => (i, "c"))).toDF("id", "src")
    val kept = Curation.rebalanceSources(df, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val bySrc = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("c", 0) === 0)
    assert(bySrc("b") === 10) // rate 1.0 keeps all
    assert(bySrc("a") > 0 && bySrc("a") < 40) // rate 0.25, hash-chosen
    // deterministic: same call, same set
    val again = Curation.rebalanceSources(df, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(kept.sorted.toSeq === again.sorted.toSeq)
  }

  test("upsampleToMix repeats under-represented sources across epochs, never drops") {
    // a=100, b=50; equal targets → binding source a stays 1×, b gets 2× exactly
    val df = ((1L to 100L).map(i => (i, "a")) ++ (101L to 150L).map(i => (i, "b")))
      .toDF("id", "src")
    val up = Curation.upsampleToMix(df, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
    val perSrc = up.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc("a") === 100L && perSrc("b") === 100L)
    // epochs are contiguous from 0 per row
    val epochs = up.filter($"src" === "b").groupBy("id")
      .agg(sort_array(collect_list($"epoch")).as("es"))
      .select("es").collect().map(_.getSeq[Int](0))
    assert(epochs.forall(_ == Seq(0, 1)))
    // fractional multipliers: every row appears floor(m) or ceil(m) times,
    // assignment repartition-stable
    val df2 = ((1L to 60L).map(i => (i, "a")) ++ (61L to 100L).map(i => (i, "b")))
      .toDF("id", "src")
    val m = Map("a" -> 0.5, "b" -> 0.5) // m_b = 1.5
    val c1 = Curation.upsampleToMix(df2, "src", "id", m)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = Curation.upsampleToMix(df2.repartition(7), "src", "id", m)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 === c2)
    assert((1L to 60L).forall(c1(_) == 1L))
    assert((61L to 100L).forall(i => c1(i) == 1L || c1(i) == 2L))
    // sources not in the target map pass through with one copy at epoch 0
    val df3 = df.union(Seq((200L, "other")).toDF("id", "src"))
    val other = Curation.upsampleToMix(df3, "src", "id", Map("a" -> 0.5, "b" -> 0.5))
      .filter($"src" === "other").collect()
    assert(other.length == 1 && other(0).getInt(2) == 0)
    // refuses a second pass
    intercept[IllegalArgumentException] {
      Curation.upsampleToMix(up, "src", "id", Map("a" -> 1.0))
    }
  }

  test("winnowContamination flags the planted shared passage, broadcast side in plan") {
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = Seq(
      (10L, s"unrelated words entirely different content here $passage"),
      (11L, "completely separate text with no overlap whatsoever in it"),
      (12L, s"$passage padded with some extra trailing context words")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, s"benchmark item containing $passage verbatim"))
      .toDF("pid", "ptext")
    val hits = Curation.winnowContamination(corpus, "doc_id", "text",
      probes, "pid", "ptext", k = 5, w = 4, minShared = 10)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe side must broadcast, got:\n$plan")
    val got = hits.collect().map(r => r.getLong(0)).toSet
    assert(got === Set(10L, 12L), s"got $got")
  }

  test("ngramContamination: exact shared n-grams counted distinct, probe broadcast") {
    val run = "alpha beta gamma delta epsilon" // a 5-gram
    val corpus = Seq(
      (10L, s"one two three $run four five"),        // contains the run once
      (11L, s"$run six $run seven"),                 // twice -> still distinct=1 shared
      (12L, "totally unrelated words here with nothing shared at all")
    ).toDF("doc_id", "text")
    val probes = Seq((1L, s"benchmark question about $run indeed"))
      .toDF("pid", "ptext")
    val hits = Curation.ngramContamination(corpus, "doc_id", "text",
      probes, "pid", "ptext", n = 5, minShared = 1)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe side must broadcast, got:\n$plan")
    val got = hits.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet === Set(10L, 11L))
    assert(got(10L) === 1L && got(11L) === 1L) // distinct grams, not occurrences
  }

  test("distributionDrift: fractions, absent keys as zero, drift math") {
    val old = Seq("a", "a", "a", "b").toDF("src")
    val cur = Seq("a", "a", "b", "c").toDF("src")
    val got = Curation.distributionDrift(old, cur, "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got("a") === ((3L, 2L, 0.75, 0.5, 0.25)))
    assert(got("b") === ((1L, 1L, 0.25, 0.25, 0.0)))
    // key absent in old: n_old 0, frac_old 0-valued via coalesce in drift
    val c = got("c")
    assert(c._1 === 0L && c._2 === 1L && c._5 === 0.25)
  }

  test("negativeSamples: k per anchor, never self, deterministic, valid ids") {
    val df = (1L to 20L).map(i => (i, s"doc$i")).toDF("id", "text")
    val a = Curation.negativeSamples(df, "id", k = 3, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    Dedup.releaseCaches()
    assert(a.length === 60)                          // 20 anchors × 3
    assert(a.forall { case (id, _, neg) => id != neg }, "anchor sampled as its own negative")
    val ids = (1L to 20L).toSet
    assert(a.forall { case (_, _, neg) => ids(neg) }, "negative id not in corpus")
    // deterministic across reruns and partitionings
    val b = Curation.negativeSamples(df.repartition(7), "id", k = 3, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    Dedup.releaseCaches()
    assert(a.sorted.toSeq === b.sorted.toSeq)
  }

  test("sampleKPerKey: exactly k per key, repartition-stable, unbiased by id order") {
    val df = (1L to 100L).map(i => (i, s"k${i % 4}")).toDF("id", "key")
    val got = Curation.sampleKPerKey(df, "key", "id", k = 5, seed = 1L)
    assert(got.groupBy("key").count().collect().forall(_.getLong(1) === 5L))
    val a = got.select("id").as[Long].collect().toSet
    val b = Curation.sampleKPerKey(df.repartition(9), "key", "id", k = 5, seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // hash ranking, not first-k: the admitted set is not simply 1..5 per key
    assert(a !== (1L to 20L).toSet)
    // a short key yields all its rows
    val short = Curation.sampleKPerKey(df.filter($"id" <= 2), "key", "id", k = 5)
    assert(short.count() === 2L)
  }

  test("curriculumShards: contiguous score-ordered cut, every shard populated") {
    val df = (1L to 10L).map(i => (i, (11 - i).toInt)).toDF("id", "score")
    val got = Curation.curriculumShards(df, "score", "id", nShards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    Dedup.releaseCaches()
    // lowest score = id 10 -> rank 1, shard 0; shard = (rank-1)*4 div 10
    assert(got(10L) === ((1L, 0)))
    assert(got(1L) === ((10L, 3)))          // highest score -> last shard
    // ALL nShards populated even though 4 does not divide 10 (the
    // ceil-div cut would leave shard 3 empty); sizes within one
    val sizes = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes === Map(0 -> 3, 1 -> 2, 2 -> 3, 3 -> 2))
  }

  test("globalRunningSum refuses NULL values loudly") {
    val df = Seq((1L, Some(1L)), (2L, None: Option[Long]), (3L, Some(3L)))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      Curation.globalRunningSum(df, "v", "cum", 2, col("id")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("hardNegatives: same-cell only, never self, singleton cells emit nothing") {
    import graft.operators.KMeans
    val ca = Array.tabulate(8)(i => math.sin(i + 1))
    val cb = ca.map(-_)
    val cents: KMeans.Centroids = Array((1, ca), (2, cb))
    // ids 1-4 near ca, id 9 alone near cb
    val rows = (1L to 4L).map(i => (i, ca.map(_ * (1 + i * 0.001)).toSeq)) :+
      ((9L, cb.toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val got = Curation.hardNegatives(df, "vec_id", "embedding", cents, k = 2, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    Dedup.releaseCaches()
    assert(got.length === 8)                               // 4 anchors × 2; singleton emits none
    assert(got.forall { case (id, c, _, neg) => c === 1 && id != neg && neg <= 4L })
    assert(!got.exists(_._1 == 9L))
  }

  test("pseudonymize: stable, null-preserving, salt-rotating, join-preserving") {
    val a = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None)).toDF("eid", "uid")
    val p1 = Curation.pseudonymize(a, Seq("uid"), "s1")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(p1(3L).isEmpty) // NULL stays NULL, never a joinable sentinel
    assert(p1(1L).get.length === 32 && p1(1L).get != "10")
    // same (salt, value) in another table → same pseudonym (joins survive)
    val b = Seq((99L, Some(10L))).toDF("other", "uid")
    val p2 = Curation.pseudonymize(b, Seq("uid"), "s1").collect()(0).getString(1)
    assert(p2 === p1(1L).get)
    // rotating the salt unlinks
    val p3 = Curation.pseudonymize(a, Seq("uid"), "s2")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(p3(1L).get != p1(1L).get)
    // distinct values stay distinct (no collisions on this domain)
    assert(p1(1L).get != p1(2L).get)
  }

  test("filterByQuantile drops the bottom q per key with exact integer cut") {
    // key "a": metrics 1..10 -> ceil(0.2*10)=2 dropped (ids 1,2)
    // key "b": metrics all EQUAL -> tie split by id: ceil(0.2*5)=1 dropped (id 11)
    val df = ((1L to 10L).map(i => (i, "a", i * 10)) ++
      (11L to 15L).map(i => (i, "b", 7L))).toDF("id", "k", "m")
    val kept = Curation.filterByQuantile(df, "k", "id", "m", q = 0.2)
      .collect().map(r => r.getLong(0)).toSet
    assert(kept === ((3L to 10L) ++ (12L to 15L)).toSet)
    assert(Curation.filterByQuantile(df, "k", "id", "m", q = 0.0).count() === 15)
    // columns pass through unchanged
    assert(Curation.filterByQuantile(df, "k", "id", "m", 0.2).columns.toSeq
      === Seq("id", "k", "m"))
  }

  test("globalRank matches the single-partition window twin, across partitionings") {
    import org.apache.spark.sql.expressions.Window
    // keys with heavy duplication so the tie-break column matters
    val df = (1L to 997L).map(i => (i, (i * 7919) % 50)).toDF("id", "score")
    val expected = df.withColumn("rank",
        row_number().over(Window.orderBy($"score".desc, $"id")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (np <- Seq(3, 8); input <- Seq(df, df.repartition(13))) {
      val got = Curation.globalRank(input, "rank", np, $"score".desc, $"id")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expected, s"np=$np mismatch")
    }
    // ranks are a dense 1..n permutation
    val ranks = Curation.globalRank(df, "rank", 5, $"score".desc, $"id")
      .collect().map(_.getLong(2)).sorted
    assert(ranks.toSeq === (1L to 997L).toSeq)
  }

  test("globalRank plans no single-partition global sort") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "score")
    val ranked = Curation.globalRank(df, "rank", 4, $"score", $"id")
    val plan = ranked.queryExecution.executedPlan.toString
    // the ranking Window form would show Window + Exchange SinglePartition;
    // here the sorted relation is a materialized np-partition checkpoint
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition exchange in:\n$plan")
    assert(ranked.rdd.getNumPartitions === 4,
      s"expected the np-partition range layout, got ${ranked.rdd.getNumPartitions}")
  }

  test("keepBestPerKey: argmax with min-id tie-break, matches window twin, no Window in plan") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, "a", "x", 10L), (2L, "a", "x", 30L), (3L, "a", "x", 30L), // tie on 30 -> id 2
      (4L, "a", "y", 5L), (5L, "b", "x", 7L), (6L, "b", "x", 9L)
    ).toDF("id", "k1", "k2", "score")
    val best = Curation.keepBestPerKey(df, Seq("k1", "k2"), "score", "id")
    assert(best.columns.toSeq === Seq("id", "k1", "k2", "score"))
    val got = best.collect().map(r => (r.getString(1), r.getString(2)) -> r.getLong(0)).toMap
    assert(got === Map(("a", "x") -> 2L, ("a", "y") -> 4L, ("b", "x") -> 6L))
    // parity with the row_number()=1 window twin on random-ish data
    val big = (1L to 500L).map(i => (i, s"k${i % 23}", "z", (i * 31) % 97)).toDF("id", "k1", "k2", "score")
    val twin = big.withColumn("rn",
        row_number().over(Window.partitionBy($"k1", $"k2").orderBy($"score".desc, $"id")))
      .filter($"rn" === 1).drop("rn")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    val ours = Curation.keepBestPerKey(big, Seq("k1", "k2"), "score", "id")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(ours === twin)
    // partial-agg shape: an Aggregate pair (struct buffer → SortAggregate),
    // never a ranking Window; partial + final = map-side combine present
    val plan = Curation.keepBestPerKey(big, Seq("k1", "k2"), "score", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
    val nAgg = "(SortAggregate|HashAggregate|ObjectHashAggregate)".r
      .findAllIn(plan).length
    assert(nAgg >= 2, s"expected partial+final aggregate pair, got:\n$plan")
  }

  test("interleaveMix: every prefix holds the target mix, deterministic, unknown keys excluded") {
    val df = ((1L to 30L).map(i => (i, "a")) ++ (31L to 60L).map(i => (i, "b")) ++
      (61L to 65L).map(i => (i, "zz"))).toDF("id", "src")
    val plan = Curation.interleaveMix(df, "src", "id", Map("a" -> 2.0, "b" -> 1.0))
      .orderBy("order_pos").select("src").as[String].collect()
    Dedup.releaseCaches()
    assert(plan.length === 60)               // zz (weight absent) excluded
    // every prefix of length 3k holds exactly 2k a's and k b's
    for (k <- 1 to 15) {
      val prefix = plan.take(3 * k)
      assert(prefix.count(_ == "a") === 2 * k, s"prefix ${3 * k}: ${prefix.mkString}")
    }
    // repartitioning cannot change the schedule
    val again = Curation.interleaveMix(df.repartition(7), "src", "id",
      Map("a" -> 2.0, "b" -> 1.0)).orderBy("order_pos").select("src").as[String].collect()
    Dedup.releaseCaches()
    assert(plan.toSeq === again.toSeq)
  }

  test("quantileNormalize: endpoints map to endpoints, distributions equalize") {
    // key a: scores 1..4; key b: scores 100..103; global sorted:
    // 1,2,3,4,100,101,102,103 (N=8)
    val df = (1L to 4L).map(i => (i, "a", i)) ++ (5L to 8L).map(i => (i, "b", i + 95))
    val got = Curation.quantileNormalize(df.toDF("id", "k", "s"), "k", "s", "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    Dedup.releaseCaches()
    // r of m=4 -> global rank 1 + (r-1)*7 div 3 = 1, 3, 5, 8
    val expect = Seq(1L, 3L, 100L, 103L)
    assert((1L to 4L).map(got) === expect)   // key a
    assert((5L to 8L).map(got) === expect)   // key b: SAME mapped values
    // singleton key maps to the global median rank
    val single = Curation.quantileNormalize(
      (df :+ ((9L, "c", 1000L))).toDF("id", "k", "s"), "k", "s", "id")
      .filter($"k" === "c").head().getLong(3)
    Dedup.releaseCaches()
    // N=9, median rank 1 + 4 = 5 -> value 100
    assert(single === 100L)
  }

  test("materializePacked: id-ordered reassembly at the separator, exact counts") {
    val df = Seq(
      (1L, "k", "a b c"), (2L, "k", "d e"), (3L, "k", "f g h i"), (4L, "m", "x")
    ).toDF("id", "key", "text")
    // budget 5: doc1 starts at 0 (shard 0), doc2 at 3 (shard 0), doc3
    // at 5 (shard 1); key m: doc4 alone
    val got = Curation.materializePacked(df, "key", "id", "text", budget = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("k", 0L)) === (("a b c <|eos|> d e", 5L, 2L)))
    assert(got(("k", 1L)) === (("f g h i", 4L, 1L)))
    assert(got(("m", 0L)) === (("x", 1L, 1L)))
  }

  test("globalRunningSum matches the window twin and survives coalesce(1)") {
    val df = (1L to 200L).map(i => (i, (i * 13 % 7) + 1)).toDF("id", "v")
      .select($"id", $"v".cast("long").as("v"))
    val twin = df.withColumn("cum",
        sum("v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ours = Curation.globalRunningSum(df, "v", "cum", 4, col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ours === twin)
    // REGRESSION PIN: a downstream coalesce(1) concatenates planning
    // partitions into one task — the offsets must still apply (the
    // pid rides as a column, never TaskContext)
    val coalesced = Curation.globalRunningSum(df, "v", "cum", 4, col("id"))
      .coalesce(1).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(coalesced === twin)
    // integral-only contract
    intercept[IllegalArgumentException] {
      Curation.globalRunningSum(df.withColumn("v", $"v".cast("double")), "v", "c", 4, col("id"))
    }
  }

  test("sampleToTokenBudget: budget respected, nested across budgets, deterministic") {
    val df = (1L to 50L).map(i => (i, 10L)).toDF("id", "tok")
    val small = Curation.sampleToTokenBudget(df, "id", "tok", budget = 100L)
    assert(small.count() === 10L)                        // exactly 100/10 rows
    assert(small.agg(max("cum_tokens")).head().getLong(0) <= 100L)
    val big = Curation.sampleToTokenBudget(df, "id", "tok", budget = 300L)
    val smallIds = small.select("id").as[Long].collect().toSet
    val bigIds = big.select("id").as[Long].collect().toSet
    assert(smallIds.subsetOf(bigIds))                    // nested prefixes
    val rerun = Curation.sampleToTokenBudget(df.repartition(7), "id", "tok", budget = 100L)
      .select("id").as[Long].collect().toSet
    assert(rerun === smallIds)                           // repartition-stable
  }

  test("quantilesByKey: type-7 interpolation, per-key, repartition-stable") {
    val df = (Seq.tabulate(5)(i => ("a", (i + 1).toLong)) ++
      Seq.tabulate(4)(i => ("b", (10 * (i + 1)).toLong))).toDF("src", "v")
    // a: 1..5 -> p0=1, p.5=3, p1=5 ; b: 10,20,30,40 -> p.5: h=2.5 -> 25
    val got = Curation.quantilesByKey(df, "src", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got(("a", 0.0)) === ((1.0, 5L)))
    assert(got(("a", 0.5)) === ((3.0, 5L)))
    assert(got(("a", 1.0)) === ((5.0, 5L)))
    assert(got(("b", 0.5)) === ((25.0, 4L)))
    assert(got(("b", 1.0)) === ((40.0, 4L)))
    val again = Curation.quantilesByKey(df.repartition(7), "src", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(again === got)
    // singleton key: every quantile is the lone value
    val one = Seq(("c", 7L)).toDF("src", "v")
    val g1 = Curation.quantilesByKey(one, "src", "v", Seq(0.5))
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    assert(g1 === Array((7.0, 1L)))
    // NULL keys refuse LOUDLY with the contract named — previously an
    // opaque NPE in the key byte-sort (robustScale/winsorizeByKey
    // join back on the string key, so NULL has no rank space)
    val withNull = Seq((Some("c"), 7L), (None, 9L))
      .toDF("src", "v")
    val err = intercept[IllegalArgumentException] {
      Curation.quantilesByKey(withNull, "src", "v", Seq(0.5))
    }
    assert(err.getMessage.contains("NULL keys"))
    graft.operators.Dedup.releaseCaches()
  }

  test("snapshotDiff reports added/removed/changed deltas only") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "text")
    val cur = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("id", "text")
    val got = Curation.snapshotDiff(old, cur, "id", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // 1 unchanged (absent), 2 changed, 3+4 removed, 5 added
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "removed", 5L -> "added"))
    // multi-column keys: a NULL moving between columns is a change
    val o2 = Seq((1L, Some("x"), None: Option[String])).toDF("id", "a", "b")
    val c2 = Seq((1L, None: Option[String], Some("x"))).toDF("id", "a", "b")
    val d2 = Curation.snapshotDiff(o2, c2, "id", Seq("a", "b")).collect()
    assert(d2.length === 1 && d2(0).getString(1) === "changed")
  }

  test("fkOrphans: orphaned keys with counts; NULLs and matched keys excluded") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Curation.fkOrphans(child, "fk", parent, "pk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(9L -> 3L))
  }

  test("nullProfile counts nulls and blanks per column in one pass") {
    val df = Seq(
      (Some(1L), Some("hello"), Some("a")),
      (Some(2L), Some("   "), None),
      (None, None, Some("")),
      (Some(4L), Some(""), Some("b"))
    ).toDF("id", "text", "tag")
    val got = Curation.nullProfile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got("id") === ((4L, 1L, -1L)))   // numeric: blank not applicable
    assert(got("text") === ((4L, 1L, 2L)))  // "   " and "" are blank
    assert(got("tag") === ((4L, 1L, 1L)))
    // column subset selection
    val sub = Curation.nullProfile(df, Seq("tag")).collect()
    assert(sub.length === 1 && sub(0).getString(0) === "tag")
  }

  test("zOrderIndex: hand-checked bit interleave at bits=2") {
    // min=0 max=3 in both dims → xi = x, yi = y exactly
    val df = Seq((1L, 0L, 0L), (2L, 1L, 2L), (3L, 3L, 3L), (4L, 2L, 1L), (5L, 0L, 3L))
      .toDF("id", "x", "y")
    val got = Curation.zOrderIndex(df, "id", "x", "y", bits = 2, nBuckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // z = interleave(x even positions, y odd): (1,2)→1+8=9; (3,3)→5+10=15;
    // (2,1)→4+2=6; (0,3)→0+2+8=10. bucket = z >> 2.
    assert(got === Map(1L -> ((0L, 0L)), 2L -> ((9L, 2L)), 3L -> ((15L, 3L)),
      4L -> ((6L, 1L)), 5L -> ((10L, 2L))))
  }

  test("zOrderIndex: an aligned box maps to a single bucket (data-skipping)") {
    // 64×64 grid, bits=6 (identity scaling), 16 buckets (z >> 8):
    // the 8×8 box at the origin has z < 64 → exactly one bucket,
    // while a row-major layout would spread it across 8 stripes
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x * 64 + y, x, y))
    val z = Curation.zOrderIndex(grid.toDF("id", "x", "y"), "id", "x", "y",
      bits = 6, nBuckets = 16)
    val boxBuckets = z.filter(col("x") < 8 && col("y") < 8)
      .select("zbucket").distinct().collect().map(_.getLong(0))
    assert(boxBuckets.toSeq === Seq(0L))
    // all 16 buckets are used and equally sized (4096 / 16 = 256)
    val sizes = z.groupBy("zbucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes.keySet === (0L until 16L).toSet)
    assert(sizes.values.forall(_ === 256L))
  }

  test("zOrderIndex guards: range overflow and non-power-of-two buckets") {
    val df = Seq((1L, 0L, 0L), (2L, Long.MaxValue / 2, 1L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Curation.zOrderIndex(df, "id", "x", "y", bits = 16)
    }
    intercept[IllegalArgumentException] {
      Curation.zOrderIndex(df, "id", "x", "y", bits = 8, nBuckets = 5)
    }
    // a range wider than Long.MaxValue used to WRAP inside the guard
    // itself (maxX − minX in long), letting the over-wide dimension
    // through to engine-side overflow (review r15)
    val wide = Seq((1L, -6000000000000000000L, 0L),
      (2L, 6000000000000000000L, 1L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Curation.zOrderIndex(wide, "id", "x", "y", bits = 16)
    }
    assert(e.getMessage.contains("too wide"))
  }

  test("sourceProfile refuses colliding percentile labels (review r15)") {
    val df = Seq((1L, "s1", "a b c")).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.sourceProfile(df, "source", "doc_id", "text",
        percentiles = Seq(0.005, 0.01))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("kmvDistinct: exact below k, estimator within bounds above k") {
    // key "small" has 5 distinct values < k=8 → exact path
    // key "big" has 500 distinct values → sketch path
    val rows = (1 to 5).map(i => ("small", s"v$i")) ++
      (1 to 500).map(i => ("big", s"value-$i")) ++
      (1 to 50).map(i => ("big", s"value-$i")) // duplicates must not matter
    val got = Curation.kmvDistinct(rows.toDF("k", "v"), "k", "v", k = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getDouble(3)))).toMap
    val (smallN, smallKth, smallEst) = got("small")
    assert(smallN === 5L && smallKth === -1L && smallEst === 5.0)
    val (bigN, bigKth, bigEst) = got("big")
    assert(bigN === 8L && bigKth > 0L)
    // KMV with k=8 has ~38% stddev; deterministic hashes keep this stable
    assert(bigEst > 150.0 && bigEst < 1500.0, s"est=$bigEst")
  }

  test("kmvDistinct is invariant to input partitioning") {
    val rows = (1 to 300).map(i => ("k", s"doc-$i"))
    val df = rows.toDF("k", "v")
    val a = Curation.kmvDistinct(df.repartition(1), "k", "v", k = 16).collect()(0)
    val b = Curation.kmvDistinct(df.repartition(13), "k", "v", k = 16).collect()(0)
    assert(a.getLong(1) === b.getLong(1))
    assert(a.getLong(2) === b.getLong(2))
    assert(a.getDouble(3) === b.getDouble(3))
  }

  test("ngramNovelty: distinct-gram doc frequency, hand-checked") {
    // word 2-grams: d1 {"a b","b c"}; d2 {"a b","b x"}; d3 none
    val docs = Seq((1L, "a b c"), (2L, "a b x"), (3L, "q")).toDF("doc_id", "text")
    val got = Curation.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(1L) === ((2L, 1L, Some(0.5)))) // "b c" unique, "a b" shared
    assert(got(2L) === ((2L, 1L, Some(0.5)))) // "b x" unique
    assert(got(3L) === ((0L, 0L, None)))      // too short for any 2-gram
    // duplicated grams WITHIN one doc count once (shingles are distinct
    // per doc): "a b a b" slides "a b","b a","a b" → {"a b","b a"}
    val rep = Curation.ngramNovelty(Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .collect()(0)
    assert(rep.getLong(1) === 2L && rep.getLong(2) === 2L && rep.getDouble(3) === 1.0)
  }

  test("containmentScore: probe gram coverage against the corpus") {
    // corpus "a b c d" word-2-grams: {"a b","b c","c d"}
    val corpus = Seq((10L, "a b c d")).toDF("doc_id", "text")
    val probes = Seq((1L, "b c d"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val got = Curation.containmentScore(corpus, "text", probes, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(1L) === ((2L, 2L, Some(1.0)))) // {"b c","c d"} fully covered
    assert(got(2L) === ((1L, 0L, Some(0.0)))) // {"x y"} not covered
    assert(got(3L) === ((0L, 0L, None)))      // too short
  }

  test("temperatureShares: alpha=0.5 flattens between natural and uniform") {
    // 90/9/1 split: natural shares 0.9/0.09/0.01
    val df = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 99).map(i => (i.toLong, "mid")) ++ Seq((100L, "small")))
      .toDF("doc_id", "source")
    val got = Curation.temperatureShares(df, "source", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("big")._1 === 90L && got("big")._2 === 0.9)
    // weights sum to 1 and the head is flattened toward uniform:
    // natural < temp < uniform for the tail, reverse for the head
    val wsum = got.values.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-12)
    assert(got("big")._3 < 0.9 && got("big")._3 > 1.0 / 3)
    assert(got("small")._3 > 0.01 && got("small")._3 < 1.0 / 3)
    // the binding source (largest n/weight) sits at exactly 1 epoch;
    // everything else upsamples
    val eps = got.values.map(_._4)
    assert(math.abs(eps.min - 1.0) < 1e-12)
    assert(got("small")._4 > got("mid")._4 && got("mid")._4 > got("big")._4)
  }

  test("temperatureShares: alpha=1.0 is the identity mix (all epochs 1)") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val got = Curation.temperatureShares(df, "source", alpha = 1.0).collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-15) // weight == share
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    }
  }

  test("matchDistribution: binding bin keeps all, surplus bins thin, unmatchable throws") {
    // src bins: {0: 4 rows, 1: 2 rows}; ref bins: {0: 1, 1: 1}
    // λ = min(4/1, 2/1) = 2 → rate(bin 0) = 1·2/4 = 0.5, rate(bin 1) = 1·2/2 = 1.0
    // bin-0 ids chosen so their md5 unit hashes straddle 0.5
    // (hashUnit: 6→0.088, 9→0.273 keep; 3→0.925, 5→0.894 drop)
    val src = Seq((3L, 0L), (5L, 0L), (6L, 0L), (9L, 0L), (10L, 1L), (11L, 1L))
      .toDF("doc_id", "bin")
    val ref = Seq((100L, 0L), (101L, 1L)).toDF("doc_id", "bin")
    val got = Curation.matchDistribution(src, ref, "doc_id", "bin")
      .collect().map(r => r.getLong(0)).toSet
    assert(got === Set(6L, 9L, 10L, 11L),
      "rate-1.0 bin keeps all; the 0.5-rate bin keeps exactly the under-0.5 hashes")
    val again = Curation.matchDistribution(src, ref, "doc_id", "bin")
      .collect().map(r => r.getLong(0)).toSet
    assert(got === again, "id-hash acceptance must be rerun-stable")
    // a reference bin absent from the source is unmatchable
    val badRef = Seq((200L, 7L)).toDF("doc_id", "bin")
    intercept[IllegalArgumentException](
      Curation.matchDistribution(src, badRef, "doc_id", "bin"))
  }

  test("mergeSnapshot: incoming wins, current-only kept, actions label no-ops") {
    val cur = Seq((1L, "old", "s1"), (2L, "same", "s1"), (3L, "solo", "s2"))
      .toDF("doc_id", "text", "source")
    val inc = Seq((1L, "new", "s1"), (2L, "same", "s1"), (9L, "fresh", "s3"))
      .toDF("doc_id", "text", "source")
    val got = Curation.mergeSnapshot(cur, inc, "doc_id", Seq("text", "source"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(3)))).toMap
    assert(got(1L) === (("new", "updated")))
    assert(got(2L) === (("same", "unchanged")))
    assert(got(3L) === (("solo", "kept")))
    assert(got(9L) === (("fresh", "inserted")))
  }

  test("corpusDrift: identical snapshots are 0, disjoint vocabularies are 1") {
    val a = Seq((1L, "x y z")).toDF("doc_id", "text")
    val b = Seq((2L, "x y z")).toDF("doc_id", "text")
    val same = Curation.corpusDrift(a, b, "text").collect()(0)
    assert(same.getDouble(5) === 0.0 && same.getLong(4) === 3L)
    val c = Seq((3L, "p q")).toDF("doc_id", "text")
    val disj = Curation.corpusDrift(a, c, "text").collect()(0)
    assert(disj.getDouble(5) === 1.0 && disj.getLong(4) === 0L)
  }

  test("corpusDrift: known half-shift gives exact rational TVD") {
    // v1 = {x,x}, v2 = {x,y}: |2*2-1*2| + |0*2-1*2| = 2+2 = 4; 4/(2*2*2) = 0.5
    val v1 = Seq((1L, "x x")).toDF("doc_id", "text")
    val v2 = Seq((2L, "x y")).toDF("doc_id", "text")
    val r = Curation.corpusDrift(v1, v2, "text").collect()(0)
    assert(r.getDouble(5) === 0.5)
    val movers = Curation.corpusDriftTerms(v1, v2, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(movers.toSeq === Seq(("x", 2L), ("y", 2L))) // tie broken term asc
  }

  test("temperatureShares: rejects non-sqrt-composable alpha, null keys excluded") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("doc_id", "source")
    intercept[IllegalArgumentException](
      Curation.temperatureShares(df, "source", alpha = 0.3))
    val got = Curation.temperatureShares(df, "source", alpha = 0.5).collect()
    assert(got.length === 1 && got(0).getString(0) === "a")
  }

  test("paretoFrontier matches brute-force dominance on a seeded random set") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(200)(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.map(_._1).toSet
    val df = pts.toDF("id", "x", "y")
    val got = Curation.paretoFrontier(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("paretoFrontier: exact twins both survive; same-x lower-y is dominated") {
    val df = Seq(
      (1L, 10L, 5L), (2L, 10L, 5L), // identical twins
      (3L, 10L, 4L),                // same x, strictly lower y — out
      (4L, 9L, 5L),                 // strictly smaller x, equal y — dominates 1 and 2
      (5L, 20L, 9L)                 // worse x but best y — on the frontier
    ).toDF("id", "x", "y")
    val got = Curation.paretoFrontier(df, "x", "y")
      .select("id").collect().map(_.getLong(0)).toSet
    // 4 dominates 1,2 (x strictly smaller, y equal); 3 dominated by all of them
    assert(got === Set(4L, 5L))
  }

  test("paretoFrontier rejects non-integer columns") {
    val df = Seq((1L, 1.5, 2L)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException](Curation.paretoFrontier(df, "x", "y"))
    assert(e.getMessage.contains("int/long"))
  }

  test("pearsonByKey: exact ±1 on linear keys, NULL on degenerate ones") {
    val in = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),   // y = 2x → r = 1
      ("b", 1.0, 3.0), ("b", 2.0, 2.0), ("b", 3.0, 1.0),   // y = 4−x → r = −1
      ("c", 1.0, 5.0), ("c", 2.0, 5.0),                    // var(y) = 0 → NULL
      ("d", 7.0, 7.0)                                      // n = 1 → NULL
    ).toDF("k", "x", "y")
    val got = Curation.pearsonByKey(in, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // ±1 up to one ulp of the sqrt round-trip ((√v)² ≈ v)
    assert(math.abs(got("a").get - 1.0) < 1e-14)
    assert(math.abs(got("b").get + 1.0) < 1e-14)
    assert(got("c") === None)
    assert(got("d") === None)
  }

  test("robustScale: (x − median)/IQR per key; degenerate IQR yields NULL") {
    // key a: 1..5 → q1=2, med=3, q3=4, IQR=2 → r(5.0) = 1.0, r(3.0) = 0.0
    // key b: constant → IQR=0 → NULL
    val in = (1L to 5L).map(i => (i, "a", i.toDouble)) ++
      Seq((6L, "b", 7.0), (7L, "b", 7.0), (8L, "b", 7.0))
    val got = Curation.robustScale(in.toDF("id", "k", "v"), "id", "k", "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(3L) === Some(0.0))
    assert(got(5L) === Some(1.0))
    assert(got(1L) === Some(-1.0))
    assert(got(6L) === None, "zero-IQR key must yield NULL, not a blow-up")
  }

  test("heavyHitters equals the exact HAVING set, under any partitioning") {
    // Zipf-ish: "h0" ×400, "h1" ×150, 450 singletons → with k=10 the
    // threshold is n/10 = 100: exactly {h0, h1} qualify
    val rows = Seq.fill(400)("h0") ++ Seq.fill(150)("h1") ++
      (1 to 450).map(i => s"rare$i")
    val n = rows.length.toLong
    val expect = Map("h0" -> 400L, "h1" -> 150L)
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("key").repartition(parts)
      val got = Curation.heavyHitters(df, "key", k = 10)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got.view.mapValues(_._1).toMap === expect, s"parts=$parts")
      assert(got("h0")._2 === 400.0 / n)
    }
  }

  test("heavyHitters: adversarial order (heavy key last) still survives MG") {
    // heavy key arrives AFTER k distinct fillers have claimed every
    // counter — the decrement path must still let it in
    val rows = (1 to 60).map(i => s"f$i") ++ Seq.fill(80)("heavy")
    val got = Curation.heavyHitters(rows.toDF("key").repartition(1), "key", k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("heavy" -> 80L)) // 80 > 140/4 = 35; fillers are 1 < 35
  }

  test("heavyHitters: nothing over threshold yields an empty result, not a crash") {
    val rows = (1 to 50).map(i => s"u$i")
    assert(Curation.heavyHitters(rows.toDF("key"), "key", k = 10).count() === 0L)
  }

  test("winsorizeByKey: interior rows unchanged, tails clipped to the quantiles") {
    // key a: 1..20 → p05 = 1.95, p95 = 19.05 (type-7); 1 → 1.95, 20 → 19.05
    val in = (1L to 20L).map(i => (i, "a", i.toDouble))
    val got = Curation.winsorizeByKey(in.toDF("id", "k", "v"), "id", "k", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // replicate the type-7 arithmetic exactly: h = (n−1)p + 1,
    // q = v_lo + (h − ⌊h⌋)(v_hi − v_lo) — 19·0.05 is not exact in IEEE
    def q7(p: Double): Double = {
      val h = 19.0 * p + 1.0
      val lo = math.floor(h)
      lo + (h - lo) * 1.0 // values are 1..20, so v_lo = lo and v_hi − v_lo = 1
    }
    assert(got(1L) === q7(0.05))
    assert(got(20L) === q7(0.95))
    assert(got(10L) === 10.0, "interior values pass through untouched")
    assert(got.size === 20, "winsorizing keeps every row")
  }

  test("topKPerKey equals the window twin, without planning a Window") {
    val df = (1L to 30L).map(i => (i, s"k${i % 3}", (i * 7 % 13).toDouble))
      .toDF("id", "k", "s")
    val fast = Curation.topKPerKey(df, "k", "id", "s", k = 4)
    val got = fast.collect()
      .map(r => (r.getString(0), r.getLong(2)) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    val twin = df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("s").desc, col("id"))))
      .filter(col("rn") <= 4).collect()
      .map(r => (r.getString(1), r.getInt(3).toLong) -> ((r.getLong(0), r.getDouble(2))))
      .toMap
    assert(got === twin)
    assert(!fast.queryExecution.executedPlan.toString.contains("Window"),
      "the point: a bounded partial agg, never a per-key window sort")
  }

  test("topKPerKey rejects non-long-castable id columns loudly (ADVICE r11)") {
    val df = Seq(("uuid-1", "k", 1.0)).toDF("id", "k", "s")
    val e = intercept[IllegalArgumentException] {
      Curation.topKPerKey(df, "k", "id", "s", k = 2)
    }
    assert(e.getMessage.contains("long-castable id column"))
  }

  test("unionEvolved: by-name alignment with null fill — never positional pairing") {
    val v1 = Seq((1L, "t1", "s1")).toDF("id", "text", "source")
    // v2 declares columns in a DIFFERENT position order + one new col
    val v2 = Seq(("s2", 2L, "en", "t2")).toDF("source", "id", "lang", "text")
    val got = Curation.unionEvolved(Seq(v1, v2)).collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        ((r.getString(r.fieldIndex("text")), r.getString(r.fieldIndex("source")),
          Option(r.getString(r.fieldIndex("lang")))))).toMap
    assert(got(1L) === (("t1", "s1", None)), "old generation: new column null-filled")
    assert(got(2L) === (("t2", "s2", Some("en"))),
      "by-name alignment must survive positional reordering")
  }

  test("cumeDistByKey matches the engine's own cume_dist window, per key") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L)
    ).toDF("id", "k", "v")
    val got = Curation.cumeDistByKey(df, "k", "v")
      .select("id", "cd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // key a: v=10 → 2/4, v=20 → 3/4, v=30 → 4/4; key b singleton → 1
    assert(got(1L) === 0.5 && got(2L) === 0.5)
    assert(got(3L) === 0.75)
    assert(got(4L) === 1.0)
    assert(got(5L) === 1.0)
    // parity with the built-in window (the definition being decomposed)
    val builtin = df.withColumn("cd", org.apache.spark.sql.functions.cume_dist()
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")))
      .select("id", "cd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(builtin === got)
  }

  test("cumeDistByKey keeps NULL-valued rows (null-safe join; ASC = NULLS FIRST)") {
    // ADVICE r10: the old plain equi-join silently DROPPED rows whose
    // value (or key) was NULL. Contract now: NULLs order first (the
    // Spark window default), so cd(null) = nulls_in_key / rows_in_key,
    // and every input row survives.
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("a"), None), (3L, Some("a"), Some(20L)),
      (4L, None, Some(7L))
    ).toDF("id", "k", "v")
    val out = Curation.cumeDistByKey(df, "k", "v")
    assert(out.count() === 4L, "no input row may disappear")
    val got = out.select("id", "cd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // key a: NULL first → 1/3; v=10 → 2/3; v=20 → 3/3. NULL key: 1/1.
    assert(got(2L) === 1.0 / 3.0)
    assert(got(1L) === 2.0 / 3.0)
    assert(got(3L) === 1.0)
    assert(got(4L) === 1.0)
    // parity with the built-in window on the same nullable input
    val builtin = df.withColumn("cd", org.apache.spark.sql.functions.cume_dist()
        .over(org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")))
      .select("id", "cd")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(builtin === got)
  }

  test("filterFunnel: stages compose by AND; NULL predicate counts as fail") {
    val df = Seq(
      (1L, Some(10L)), (2L, Some(5L)), (3L, Some(1L)), (4L, None)
    ).toDF("id", "v")
    val got = Curation.filterFunnel(df, Seq(
      "nonneg" -> (col("v") >= 1L),       // NULL row fails here, not errors
      "big" -> (col("v") >= 5L)))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) === (("nonneg", 4L, 3L, 0.75)))
    assert(got(2L) === (("big", 3L, 2L, 2.0 / 3.0)))
  }

  test("giniConcentration: uniform is 0, one-holder is (n-1)/n, partitioning-stable") {
    val uniform = (1L to 8L).map(i => (i, 100L)).toDF("id", "v")
    val u = Curation.giniConcentration(uniform, "id", "v").collect()(0)
    assert(u.getLong(0) === 8L && u.getLong(1) === 800L)
    assert(u.getDouble(2) === 0.0)
    // all mass on one row of n=4: G = 2·4T/(4T) − 5/4 = 3/4
    val onep = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 60L)).toDF("id", "v")
    for (parts <- Seq(1, 3)) {
      val g = Curation.giniConcentration(onep.repartition(parts), "id", "v")
        .collect()(0)
      assert(g.getDouble(2) === 0.75, s"parts=$parts")
    }
  }

  test("cmsTable/cmsEstimate: upper bound always, exact without collisions, tables merge by addition") {
    val vals = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val items = Seq("a", "b", "c", "zz_unseen").toDF("v")
    val exact = Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "zz_unseen" -> 0L)
    // wide table: 3 distinct values in 512 buckets × 4 rows — a
    // collision in EVERY row is (3²/512)⁴-improbable; estimates exact
    val wide = Curation.cmsTable(vals, "v", depth = 4, width = 512)
    val estW = Curation.cmsEstimate(wide, items, "v", depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == exact, s"no-collision estimates must be exact: $estW")
    // width=2 forces collisions: still NEVER an underestimate (the
    // CMS contract the gate relies on)
    val tight = Curation.cmsTable(vals, "v", depth = 2, width = 2)
    val estT = Curation.cmsEstimate(tight, items, "v", depth = 2, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, n) =>
      assert(estT(v) >= n, s"CMS underestimated $v: ${estT(v)} < $n")
    }
    // mergeability: table(a ∪ b) == elementwise sum of the two tables
    val (ha, hb) = (vals.filter(col("id") % 2 === 0), vals.filter(col("id") % 2 =!= 0))
    val summed = Curation.cmsTable(ha, "v", 4, 512)
      .unionAll(Curation.cmsTable(hb, "v", 4, 512))
      .groupBy("row", "bucket").agg(sum("n").as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = wide.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(summed == whole, "shard tables must merge to the whole-corpus table")
    // geometry guards
    intercept[IllegalArgumentException] { Curation.cmsTable(vals, "v", 0, 512) }
    intercept[IllegalArgumentException] { Curation.cmsEstimate(wide, items, "v", 4, 1) }
  }
}
