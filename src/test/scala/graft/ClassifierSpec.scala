package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Logistic-regression trainer: driver-replay parity, convergence,
  * standardizer contracts, loud guards. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Small separable fixture: y = 1 iff x1 > x2 (deterministic values,
  // no randomness — the specs replay the math on the driver).
  private lazy val toy = (1 to 40).map { i =>
    val x1 = (i % 7).toDouble
    val x2 = ((i * 3) % 5).toDouble
    (i.toLong, Array(x1, x2), if (x1 > x2) 1 else 0)
  }.toDF("id", "x", "y")

  test("trainLogReg matches an exact driver-side replay of the same GD") {
    val rows = toy.select("x", "y").collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1).toDouble))
    val iters = 5; val lr = 0.3
    var w = Array(0.0, 0.0); var b = 0.0
    for (_ <- 1 to iters) {
      val contribs = rows.map { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(b + x.zip(w).map { case (a, c) => a * c }.sum)))
        (x.map(_ * (p - y)), p - y)
      }
      val n = rows.length
      val g = Array(contribs.map(_._1(0)).sum / n, contribs.map(_._1(1)).sum / n)
      val gb = contribs.map(_._2).sum / n
      w = Array(w(0) - lr * g(0), w(1) - lr * g(1)); b -= lr * gb
    }
    val m = Classifier.trainLogReg(toy, "x", "y", iters, lr)
    // distributed partial-agg vs driver loop: same continuous math,
    // only summation order differs — agreement to ~1e-12 is the claim
    // the 1e-4 oracle grid rests on
    assert(math.abs(m.bias - b) < 1e-9, s"bias ${m.bias} vs replay $b")
    m.weights.zip(w).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-9, s"weight $got vs replay $exp")
    }
    assert(m.lossHistory.size == iters)
  }

  test("loss history is non-increasing and the model separates the toy data") {
    val m = Classifier.trainLogReg(toy, "x", "y", iters = 30, lr = 0.5)
    m.lossHistory.sliding(2).foreach { case Seq(a, bb) =>
      assert(bb <= a + 1e-12, s"loss increased: $a -> $bb")
    }
    val scored = Classifier.scoreLogReg(toy, "x", m)
    val acc = scored.select(avg(((col("score") >= 0.5) === (col("y") === 1))
      .cast("double"))).head().getDouble(0)
    assert(acc >= 0.9, s"separable toy data should score >=0.9, got $acc")
  }

  test("fitStandardizer: mean/std per dim; constant dims get scale 1 and z=0") {
    val df = Seq(
      (Array(1.0, 5.0, 2.0)), (Array(3.0, 5.0, 4.0)), (Array(5.0, 5.0, 6.0))
    ).toDF("x")
    val st = Classifier.fitStandardizer(df, "x")
    assert(st.mean.toSeq == Seq(3.0, 5.0, 4.0))
    assert(math.abs(st.scale(0) - math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(st.scale(1) == 1.0) // constant dim: population sd 0 -> 1
    val z = df.select(Classifier.standardizeColumn(col("x"), st).as("z"))
      .collect().map(_.getSeq[Double](0))
    assert(z.forall(_(1) == 0.0), "constant dim must standardize to exactly 0")
    assert(math.abs(z.map(_(0)).sum) < 1e-12) // centered
  }

  test("hashedFeatures: fixed width, empty-text rows keep a zero vector") {
    val docs = Seq((1L, "join key the"), (2L, ""), (3L, "join join")).toDF("id", "text")
    val f = Classifier.hashedFeatures(docs, "id", "text", dim = 16)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(f.length == 3 && f.forall(_._2.length == 16))
    assert(f(2)._2.map(math.abs).sum > 0.0, "tokens must land in buckets")
    // doc 2's text "" still tokenizes to [""] -> one bucket; the row
    // survives the LEFT join either way
    assert(f(1)._1 == 2L)
  }

  test("guards: bad iters/lr, dim-0 features, NaN-producing labels fail loudly") {
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(toy, "x", "y", iters = 0, lr = 0.1)
    }
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(toy, "x", "y", iters = 5, lr = -1.0)
    }
    val empty = Seq((1L, Array.empty[Double], 0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(empty, "x", "y", iters = 1, lr = 0.1)
    }
    val ragged = Seq((1L, Array(1.0, 2.0), 0), (2L, Array(1.0), 1)).toDF("id", "x", "y")
    val e = intercept[Exception] {
      Classifier.trainLogReg(ragged, "x", "y", iters = 1, lr = 0.1)
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("ragged"))
  }

  test("confusion: exact counts on a hand-checkable fixture") {
    val df = Seq(
      (1, true), (1, true), (1, false),            // 2 tp, 1 fn
      (0, true), (0, false), (0, false), (0, false) // 1 fp, 3 tn
    ).toDF("y", "pred")
    val r = Classifier.confusion(df, "y", "pred").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 3L, 1L)))
  }

  test("rocAucParts matches brute-force pairwise AUC, including ties") {
    // scores with deliberate ties across and within classes
    val rows = Seq((1, 9L), (1, 7L), (1, 7L), (1, 3L),
      (0, 7L), (0, 3L), (0, 2L), (0, 2L), (0, 1L))
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    val brute = (for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    val parts = Classifier.rocAucParts(rows.toDF("y", "s"), "y", "s").head()
    val num = parts.getDecimal(0).longValueExact()
    val den = parts.getDecimal(1).longValueExact()
    assert(den == 2L * pos.size * neg.size)
    assert(num.toDouble / den == brute, s"$num/$den vs brute $brute")
  }

  test("calibrationBins: exact counts, both edges clamp, floor semantics for negatives") {
    val df = Seq(
      (1, 50L), (0, 999L),   // bin 0
      (1, 8500L),            // bin 8
      (1, 9999L), (1, 10000L) // bin 9 (10000 clamps)
    ).toDF("y", "s4")
    val bins = Classifier.calibrationBins(df, "y", "s4", 1000L, 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(bins == Map(0 -> ((2L, 1L, 1049L)), 8 -> ((1L, 1L, 8500L)),
      9 -> ((2L, 2L, 19999L))))
    // negative scores (NB log-odds): floor division, not truncation —
    // (-w, 0) belongs below bin 0 and clamps into it EXPLICITLY, the
    // same edge rule as the top; a truncating div would silently file
    // -500 inside [0, 1000)'s interior as if it were nonnegative
    val neg = Seq((0, -500L), (0, -1500L), (1, 500L)).toDF("y", "s4")
    val nb = Classifier.calibrationBins(neg, "y", "s4", 1000L, 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nb == Map(0 -> ((3L, 1L, -1500L))),
      s"negative scores must clamp into bin 0 via floor semantics: $nb")
    intercept[IllegalArgumentException] {
      Classifier.calibrationBins(df, "y", "s4", 0L, 10)
    }
    // column names that need backticks resolve (ADVICE r12: the old
    // expr()-interpolated floor division broke on them)
    val odd = df.withColumnRenamed("s4", "score col.v")
    val ob = Classifier.calibrationBins(odd, "y", "score col.v", 1000L, 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ob == bins, s"odd column name must bin identically: $ob")
  }

  test("rocAucParts: a single-class input surfaces auc_den = 0 in-band") {
    val onlyPos = Seq((1, 5L), (1, 3L)).toDF("y", "s")
    val r = Classifier.rocAucParts(onlyPos, "y", "s").head()
    assert(r.getDecimal(1).longValueExact() == 0L)
  }

  test("hashedFeaturesRowwise is bit-equal to the shuffled builder and plans as a pure map") {
    // NULL text included (ADVICE r12): both builders must yield the
    // all-zero vector — the batch LEFT join zero-fills, and the
    // rowwise coalesce-to-empty-tokens must agree, or a streaming
    // admission filter silently drops what the batch scorer scores
    val docs = Seq((1L, "join key the a key"), (2L, ""), (3L, "x y z x"),
      (4L, "join join join"), (5L, "solo"), (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val batch = Classifier.hashedFeatures(docs, "id", "text", dim = 16)
      .orderBy("id").collect().map(_.getSeq[Double](1))
    val row = docs.select(col("id"),
        Classifier.hashedFeaturesRowwise(col("text"), dim = 16).as("features"))
      .orderBy("id").collect().map(_.getSeq[Double](1))
    assert(batch.length == row.length)
    batch.zip(row).foreach { case (b, r) =>
      assert(b == r, s"rowwise features diverge: $b vs $r")
    }
    // the online-filter claim: scoring with rowwise features is one
    // shuffle-free projection
    val m = Classifier.LogRegModel(Array.fill(16)(0.1), 0.0, Nil)
    val plan = docs.select(Classifier.scoreColumn(
        Classifier.hashedFeaturesRowwise(col("text"), 16), m).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rowwise scoring must be a zero-shuffle map:\n$plan")
    // the dense per-token accumulator is O(dim·tokens) per row, so
    // the rowwise builder refuses dims past 4096 (VERDICT r12) —
    // wide feature spaces belong on hashedFeatures' COO path
    intercept[IllegalArgumentException] {
      Classifier.hashedFeaturesRowwise(col("text"), dim = 8192)
    }
  }

  test("saveLogReg/loadLogReg: bit-exact round trip; drifted artifacts refused") {
    val st = Classifier.Standardizer(Array(1.5, -2.25), Array(0.5, 3.0))
    val m = Classifier.LogRegModel(Array(0.125, -7.75), 0.0625, Seq(0.7, 0.6))
    val path = java.nio.file.Files.createTempDirectory("lr_model_").toString + "/m"
    Classifier.saveLogReg(spark, path, st, m)
    val (lst, lm) = Classifier.loadLogReg(spark, path)
    // exact: doubles survive parquet bit-for-bit
    assert(lst.mean.toSeq == st.mean.toSeq && lst.scale.toSeq == st.scale.toSeq)
    assert(lm.weights.toSeq == m.weights.toSeq && lm.bias == m.bias)
    assert(lm.lossHistory == m.lossHistory)
    // version drift refused
    val vPath = path + "_v"
    spark.read.parquet(path).withColumn("version", lit(99))
      .write.parquet(vPath)
    val e1 = intercept[IllegalArgumentException] {
      Classifier.loadLogReg(spark, vPath)
    }
    assert(e1.getMessage.contains("version"))
    // corrupt (two-row) artifact refused
    val dPath = path + "_d"
    spark.read.parquet(path).union(spark.read.parquet(path))
      .write.parquet(dPath)
    val e2 = intercept[IllegalArgumentException] {
      Classifier.loadLogReg(spark, dPath)
    }
    assert(e2.getMessage.contains("rows"))
    // mismatched dims refused at save
    intercept[IllegalArgumentException] {
      Classifier.saveLogReg(spark, path + "_x",
        Classifier.Standardizer(Array(0.0), Array(1.0)), m)
    }
  }

  test("training plan: gradient is ONE partial-aggregated job, scoring is map-only") {
    // scoring adds no exchange: the model is a plan literal
    val m = Classifier.LogRegModel(Array(0.5, -0.25), 0.1, Nil)
    val scorePlan = Classifier.scoreLogReg(toy, "x", m)
      .queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"),
      s"scoring must be a zero-shuffle projection:\n$scorePlan")
    // the gradient aggregation runs partial (map-side) before the
    // exchange — the d+2-doubles-per-task shuffle contract
    val grad = toy.select(graft.functions.VectorMeanAgg.vecMean(
      concat(col("x"), array(lit(1.0)))).as("g"))
    val gplan = grad.queryExecution.executedPlan.toString
    assert(gplan.contains("ObjectHashAggregate") || gplan.contains("SortAggregate"),
      s"expected an aggregate exec:\n$gplan")
    assert(gplan.contains("partial_"),
      s"gradient must partial-aggregate before the exchange:\n$gplan")
  }

  test("native gradient-row kernel ≡ interpreted HOF twin, including null propagation (r19)") {
    // exact-in-double values; rows exercise the clean fast path, a
    // null element, a null residual, an empty vector, a null loss,
    // and a NULL vector (→ NULL row, like transform→concat)
    val df = Seq(
      (Option(Seq(Option(1.5), Option(-2.25), Option(0.0))), Option(0.375), Option(1.25)),
      (Option(Seq(Option(1.0), None, Option(3.0))), Option(0.5), Option(2.0)),
      (Option(Seq(Option(1.0), Option(2.0))), None, Option(2.0)),
      (Option(Seq.empty[Option[Double]]), Option(0.5), None),
      (Option.empty[Seq[Option[Double]]], Option(0.5), Option(1.0))
    ).toDF("x", "r", "l")
    val got = df.select(
        graft.functions.VectorKernels.gradRowCol(col("x"), col("r"), col("l")).as("k"),
        Classifier.gradRowHof(col("x"), col("r"), col("l")).as("h"))
      .collect()
    got.zipWithIndex.foreach { case (row, i) =>
      val k = if (row.isNullAt(0)) null else row.getSeq[Any](0)
      val h = if (row.isNullAt(1)) null else row.getSeq[Any](1)
      assert(k == h, s"row $i: kernel $k vs HOF $h")
    }
  }
}
