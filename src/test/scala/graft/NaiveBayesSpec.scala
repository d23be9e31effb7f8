package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes

/** Multinomial NB: exact count parity, smoothed log-odds replay, OOV
  * handling, loud guards, plan shape. */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 docs, vocab {spam ham eggs}: class 1 says "spam", class 0 says
  // "ham" — hand-countable everything.
  private lazy val toy = Seq(
    (1L, "spam spam eggs", 1),
    (2L, "spam", 1),
    (3L, "ham ham eggs", 0),
    (4L, "ham eggs", 0)
  ).toDF("id", "text", "y")

  test("trainMultinomial: per-token class counts and totals are exact") {
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y")
    val w = m.weights.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(w == Map("spam" -> ((3L, 0L)), "ham" -> ((0L, 3L)),
      "eggs" -> ((1L, 2L))))
    assert(m.vocabSize == 3L)
    assert(m.bias == 0.0) // 2 docs each side: ln(2) - ln(2)
  }

  test("log-odds match a driver-side replay of the smoothed formula") {
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y", alpha = 1.0)
    // T1 = 4 tokens in class 1, T0 = 5 in class 0, V = 3
    val (d1, d0) = (4.0 + 3.0, 5.0 + 3.0)
    def expW(c1: Long, c0: Long): Double =
      (math.log(c1 + 1.0) - math.log(d1)) - (math.log(c0 + 1.0) - math.log(d0))
    val got = m.weights.collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(got("spam") - expW(3, 0)) < 1e-12)
    assert(math.abs(got("eggs") - expW(1, 2)) < 1e-12)
    assert(math.abs(m.oovW - (math.log(d0) - math.log(d1))) < 1e-12)
  }

  test("scoreLogOdds separates the training fixture; OOV takes oovW") {
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y")
    val scores = NaiveBayes.scoreLogOdds(toy, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 0 && scores(2L) > 0, s"class-1 docs must score > 0: $scores")
    assert(scores(3L) < 0 && scores(4L) < 0, s"class-0 docs must score < 0: $scores")
    // a doc of ONLY unseen tokens scores exactly 2*oovW + bias
    val held = Seq((9L, "unseen tokens")).toDF("id", "text")
    val s9 = NaiveBayes.scoreLogOdds(held, "id", "text", m).head().getDouble(1)
    assert(math.abs(s9 - (2.0 * m.oovW + m.bias)) < 1e-12,
      s"OOV-only doc: $s9 vs ${2.0 * m.oovW + m.bias}")
  }

  test("trainMulticlass: dense counts, per-class smoothing, score replay") {
    val docs = Seq(
      (1L, "spam spam eggs", "a"),
      (2L, "spam", "a"),
      (3L, "ham ham eggs", "b"),
      (4L, "ham eggs", "b"),
      (5L, "eggs", "c")
    ).toDF("id", "text", "src")
    val m = NaiveBayes.trainMulticlass(docs, "id", "text", "src")
    assert(m.classes == Seq("a", "b", "c"))
    val w = m.weights.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // dense: every (token, class) pair exists, zeros included
    assert(w.size == 9 && w(("spam", "a")) == 3L && w(("spam", "b")) == 0L
      && w(("eggs", "c")) == 1L && w(("ham", "c")) == 0L)
    // replay one weight + prior + oov by hand: class a has T=4 tokens,
    // V=3 vocab → w(spam|a) = ln(3+1) − ln(4+3)
    val wa = m.weights.filter(col("token") === "spam" && col("cls") === "a")
      .head().getDouble(3)
    assert(math.abs(wa - (math.log(4.0) - math.log(7.0))) < 1e-12)
    assert(math.abs(m.priors("c") - (math.log(1.0) - math.log(5.0))) < 1e-12)
    assert(math.abs(m.oovW("a") - (math.log(1.0) - math.log(4.0 + 3.0))) < 1e-12)
    // scoring: class-a doc scores highest for class a
    val sc = NaiveBayes.scoreMulticlass(docs, "id", "text", m)
      .filter(col("id") === 2L).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(sc("a") > sc("b") && sc("a") > sc("c"),
      s"'spam' doc must score class a highest: $sc")
    // guards
    intercept[IllegalArgumentException] {
      NaiveBayes.trainMulticlass(docs.filter(col("src") === "a"),
        "id", "text", "src")
    }
    intercept[IllegalArgumentException] {
      NaiveBayes.trainMulticlass(docs, "id", "text", "src", alpha = 0.0)
    }
  }

  test("guards: single-class, non-binary labels, bad alpha fail loudly") {
    intercept[IllegalArgumentException] {
      NaiveBayes.trainMultinomial(toy.filter(col("y") === 1), "id", "text", "y")
    }
    intercept[IllegalArgumentException] {
      NaiveBayes.trainMultinomial(
        toy.withColumn("y", col("y") * 2), "id", "text", "y")
    }
    intercept[IllegalArgumentException] {
      NaiveBayes.trainMultinomial(toy, "id", "text", "y", alpha = 0.0)
    }
  }

  test("saveNB/loadNB: bit-exact round trip; drifted artifacts refused") {
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y")
    val path = java.nio.file.Files.createTempDirectory("nb_model_").toString + "/m"
    NaiveBayes.saveNB(spark, path, m)
    val lm = NaiveBayes.loadNB(spark, path)
    // scalars survive parquet bit-for-bit
    assert(lm.bias == m.bias && lm.oovW == m.oovW
      && lm.vocabSize == m.vocabSize && lm.alpha == m.alpha)
    // serving through the loaded table scores bit-identically
    val orig = NaiveBayes.scoreLogOdds(toy, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = NaiveBayes.scoreLogOdds(toy, "id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == orig, s"loaded model must score bit-identically: $got vs $orig")
    // version drift refused
    val vPath = path + "_v"
    spark.read.parquet(s"$path/weights").write.parquet(s"$vPath/weights")
    spark.read.parquet(s"$path/meta").withColumn("version", lit(99))
      .write.parquet(s"$vPath/meta")
    val e1 = intercept[IllegalArgumentException] { NaiveBayes.loadNB(spark, vPath) }
    assert(e1.getMessage.contains("version"))
    // weight/meta row-count disagreement (lost partition) refused
    val pPath = path + "_p"
    spark.read.parquet(s"$path/weights").limit(1).write.parquet(s"$pPath/weights")
    spark.read.parquet(s"$path/meta").write.parquet(s"$pPath/meta")
    val e2 = intercept[IllegalArgumentException] { NaiveBayes.loadNB(spark, pPath) }
    assert(e2.getMessage.contains("rows"))
    // corrupt (two-row) meta refused
    val dPath = path + "_d"
    spark.read.parquet(s"$path/weights").write.parquet(s"$dPath/weights")
    spark.read.parquet(s"$path/meta").union(spark.read.parquet(s"$path/meta"))
      .write.parquet(s"$dPath/meta")
    val e3 = intercept[IllegalArgumentException] { NaiveBayes.loadNB(spark, dPath) }
    assert(e3.getMessage.contains("rows"))
    // ADVICE r13 (landed-count commit-row convention): a model whose
    // semantic vocabSize disagrees with its weights relation saves
    // fine and must LOAD fine — the drift check compares the count
    // the saver read back after the write, never the semantic field
    val oPath = path + "_o"
    NaiveBayes.saveNB(spark, oPath, m.copy(vocabSize = m.vocabSize + 5))
    assert(NaiveBayes.loadNB(spark, oPath).vocabSize == m.vocabSize + 5,
      "vocabSize is a semantic field, not the row-drift expectation")
  }

  test("saveNBMulticlass/loadNBMulticlass: bit-exact round trip; drifted artifacts refused") {
    val docs = Seq(
      (1L, "spam spam eggs", "a"), (2L, "spam", "a"),
      (3L, "ham ham eggs", "b"), (4L, "ham eggs", "b"),
      (5L, "eggs", "c")
    ).toDF("id", "text", "src")
    val m = NaiveBayes.trainMulticlass(docs, "id", "text", "src")
    val path = java.nio.file.Files.createTempDirectory("nbmc_model_").toString + "/m"
    NaiveBayes.saveNBMulticlass(spark, path, m)
    val lm = NaiveBayes.loadNBMulticlass(spark, path)
    assert(lm.classes == m.classes && lm.alpha == m.alpha)
    assert(lm.priors == m.priors && lm.oovW == m.oovW)
    val orig = NaiveBayes.scoreMulticlass(docs, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val got = NaiveBayes.scoreMulticlass(docs, "id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == orig, "loaded multiclass model must score bit-identically")
    // lost-partition refusal: weight rows disagree with the meta
    val pPath = path + "_p"
    spark.read.parquet(s"$path/weights").limit(2).write.parquet(s"$pPath/weights")
    spark.read.parquet(s"$path/meta").write.parquet(s"$pPath/meta")
    val e1 = intercept[IllegalArgumentException] {
      NaiveBayes.loadNBMulticlass(spark, pPath)
    }
    assert(e1.getMessage.contains("rows"))
    // corrupt class list (unsorted) refused — argmax tie-break depends on it
    val cPath = path + "_c"
    spark.read.parquet(s"$path/weights").write.parquet(s"$cPath/weights")
    spark.read.parquet(s"$path/meta")
      .withColumn("classes", reverse(col("classes")))
      .write.parquet(s"$cPath/meta")
    val e2 = intercept[IllegalArgumentException] {
      NaiveBayes.loadNBMulticlass(spark, cPath)
    }
    assert(e2.getMessage.contains("class list"))
  }

  test("foreachBatch serving: per-micro-batch scoring equals whole-corpus batch scoring") {
    // The BOUNDED-STATE production variant of q_stream_nb's
    // complete-mode gate rig: each arriving micro-batch is scored
    // with the batch scorer inside foreachBatch (docs arrive whole,
    // so per-batch scoring is exact) and appended to a sink — zero
    // cross-batch streaming state, works at any corpus size. The
    // claim under test: the union of per-batch scores is the
    // whole-corpus batch scoring, bit for bit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y")
    m.weights.persist().count()
    try {
      val expected = NaiveBayes.scoreLogOdds(toy, "id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sink = scala.collection.mutable.Map.empty[Long, Double]
      val source = MemoryStream[(Long, String)]
      val q = source.toDF().toDF("id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          NaiveBayes.scoreLogOdds(batch, "id", "text", m).collect()
            .foreach(r => sink.synchronized {
              sink(r.getLong(0)) = r.getDouble(1); ()
            })
        }
        .start()
      try Seq(Seq((1L, "spam spam eggs"), (2L, "spam")),
        Seq((3L, "ham ham eggs")), Seq((4L, "ham eggs"))).foreach { b =>
        source.addData(b); q.processAllAvailable()
      } finally q.stop()
      assert(sink.toMap == expected,
        s"per-batch scores must equal the batch scorer: $sink vs $expected")
    } finally { m.weights.unpersist(); () }
  }

  test("plan shape: tf and per-token passes partial-aggregate; scoring join is not a cartesian") {
    val tfPlan = NaiveBayes.termFreqs(toy, "id", "text")
      .queryExecution.executedPlan.toString
    assert(tfPlan.contains("partial_"),
      s"termFreqs must map-side combine before the exchange:\n$tfPlan")
    val m = NaiveBayes.trainMultinomial(toy, "id", "text", "y")
    val scorePlan = NaiveBayes.scoreLogOdds(toy, "id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!scorePlan.contains("CartesianProduct")
      && !scorePlan.contains("BroadcastNestedLoopJoin"),
      s"scoring must stay an equi-join:\n$scorePlan")
  }
}
