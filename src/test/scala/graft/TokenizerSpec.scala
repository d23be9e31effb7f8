package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Tokenizer

/** BPE training/segmentation: hand-computed merge sequence on the
  * classic subword corpus, greedy repeat-fold semantics, tie-break
  * contract, and encode round-trip. */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "low low lower"),
    (2L, "newest west")
  ).toDF("doc_id", "text")

  test("wordCounts drops empty tokens and counts occurrences") {
    val wc = Tokenizer.wordCounts(Seq((1L, "a  b a")).toDF("id", "text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc === Map("a" -> 2L, "b" -> 1L))
  }

  test("bpeTrain learns the hand-computed merge sequence (with ties)") {
    // hand trace — pair counts are word-frequency weighted:
    //  r1: {l o:3, o w:3, w e:3, e s:2, s t:2, ...} → tie at 3,
    //      pair-string asc picks "l o"
    //  r2: {lo w:3, w e:3, ...} → "lo w"
    //  r3: {e s:2, s t:2, w e:2, ...} → "e s"
    //  r4: {es t:2, w es:2, ...} → "es t"
    //  r5: {w est:2, ...} → "w est"
    //  r6: all remaining count 1 → asc picks "e r"
    val got = Tokenizer.bpeTrain(corpus, "text", 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq(
      (1L, "l o", 3L), (2L, "lo w", 3L), (3L, "e s", 2L),
      (4L, "es t", 2L), (5L, "w est", 2L), (6L, "e r", 1L)))
  }

  test("mergeFold is greedy left-to-right: merged symbols don't re-merge") {
    // "abab" + (a,b): a b a b → ab ab, never (ab)(ab)→abab in one round
    val out = Tokenizer.applyBpe(Seq((1L, "abab")).toDF("id", "text"),
      "id", "text", Seq(("a", "b"))).collect()(0)
    assert(out.getString(1) === "ab ab")
    assert(out.getLong(2) === 2L)
  }

  test("applyBpe applies merges in training order across words") {
    val merges = Tokenizer.bpeTrain(corpus, "text", 6)
      .collect().sortBy(_.getLong(0))
      .map(r => { val Array(l, rr) = r.getString(1).split(" ", 2); (l, rr) }).toSeq
    val got = Tokenizer.applyBpe(
      Seq((1L, "low lower newest west"), (2L, ""), (3L, "  ")).toDF("id", "text"),
      "id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // lower: l o→"lo w e r", lo w→"low e r", e r→"low er"
    // newest: e s→"n e w es t", es t→"n e w est", w est→"n e west"
    assert(got(1L) === ("low low er n e west west", 7L))
    assert(got(2L) === ("", 0L)) // empty text → zero subwords
    assert(got(3L) === ("", 0L)) // all-space text → zero subwords
  }

  test("bpePairStats ranks by count desc then pair asc") {
    val got = Tokenizer.bpePairStats(corpus, "text", 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._3) === Seq(
      ("l o", 3L, 1L), ("o w", 3L, 2L), ("w e", 3L, 3L), ("e s", 2L, 4L)))
  }

  test("bpeTrain stops early when no pairs remain") {
    // single-char words only → zero pairs from round 1
    val got = Tokenizer.bpeTrain(Seq((1L, "a b a")).toDF("id", "text"), "text", 5)
    assert(got.count() === 0L)
  }

  test("bpeCompression: per-key chars-per-subword with a trained merge") {
    // merge (a,b): "ab ab" → 2 subwords/5 chars; "ab" → 1/2; "cd" → 2/2
    val docs = Seq((1L, "s1", "ab ab"), (2L, "s1", "ab"), (3L, "s2", "cd"))
      .toDF("id", "src", "text")
    val got = Tokenizer.bpeCompression(docs, "text", "src", Seq(("a", "b")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("s1") === ((2L, 3L, 7L, 7.0 / 3.0)))
    assert(got("s2") === ((1L, 2L, 2L, 1.0)))
    // agrees with applyBpe's n_subwords aggregated by hand
    val viaApply = Tokenizer.applyBpe(docs, "id", "text", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaApply === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("saveBpe/loadBpe: ordered round trip; drifted artifacts refused") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "y"))
    val path = java.nio.file.Files.createTempDirectory("bpe_rules_").toString + "/m"
    Tokenizer.saveBpe(spark, path, merges)
    assert(Tokenizer.loadBpe(spark, path) == merges,
      "rules must round-trip in training order")
    // segmentation through the loaded rules is identical
    val docs = Seq((1L, "abc xy b")).toDF("id", "text")
    val direct = Tokenizer.applyBpe(docs, "id", "text", merges).head()
    val loaded = Tokenizer.applyBpe(docs, "id", "text",
      Tokenizer.loadBpe(spark, path)).head()
    assert(direct == loaded)
    // version drift refused
    val vPath = path + "_v"
    spark.read.parquet(s"$path/merges").write.parquet(s"$vPath/merges")
    spark.read.parquet(s"$path/meta").withColumn("version", lit(99))
      .write.parquet(s"$vPath/meta")
    val e1 = intercept[IllegalArgumentException] { Tokenizer.loadBpe(spark, vPath) }
    assert(e1.getMessage.contains("version"))
    // lost merge row refused (count disagrees with meta)
    val pPath = path + "_p"
    spark.read.parquet(s"$path/merges").limit(2).write.parquet(s"$pPath/merges")
    spark.read.parquet(s"$path/meta").write.parquet(s"$pPath/meta")
    val e2 = intercept[IllegalArgumentException] { Tokenizer.loadBpe(spark, pPath) }
    assert(e2.getMessage.contains("rows"))
    // gappy steps refused — the fold order IS the tokenizer (steps
    // {1,3} with n_merges=2 pass the count check, fail the 1..n check)
    val gPath = path + "_g"
    spark.read.parquet(s"$path/merges").filter(col("step") =!= 2L)
      .write.parquet(s"$gPath/merges")
    spark.read.parquet(s"$path/meta")
      .withColumn("n_merges", lit(2L)).write.parquet(s"$gPath/meta")
    val e3 = intercept[IllegalArgumentException] { Tokenizer.loadBpe(spark, gPath) }
    assert(e3.getMessage.contains("steps"))
    // malformed pair refused at save
    intercept[IllegalArgumentException] {
      Tokenizer.saveBpe(spark, path + "_x", Seq(("a b", "c")))
    }
  }

  test("regex merge pass is bit-identical to the greedy HOF fold") {
    // the optimization-round rewrite (round 18): one leftmost-first
    // regexp_replace per merge round replaces the interpreted
    // aggregate-HOF fold. Adversarial symbol streams: repeats,
    // l == r, merged-symbol-adjacent repeats, multi-char symbols,
    // regex metacharacters, replacement metacharacters ($, \),
    // newline characters INSIDE symbols (the `$`-vs-`\z` anchor trap),
    // single symbols, prefix-sharing symbols.
    val syms = Seq(
      "a a b a b b", "a b a b", "a a a", "a", "b", "a b",
      "ab a b ab", "x a b y a b", "a b b a", "b a a b a b a",
      ". * ( ) [ ] { } | + ? ^ $ \\ . *", "$ \\ $ \\",
      "\n a b \n", "a b \n", "\n", "x\ny a b", "a b x\n",
      "foo bar foo bar bar", "lo w e r", "aa a a aa a")
    val pairs = Seq(("a", "b"), ("a", "a"), ("b", "a"), (".", "*"),
      ("(", ")"), ("$", "\\"), ("\n", "a"), ("b", "\n"), ("x\ny", "a"),
      ("foo", "bar"), ("a", "ab"), ("aa", "a"), ("b", "x"), ("b", "x\n"))
    val df = syms.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sym")
    pairs.foreach { case (l, r) =>
      val got = df.select(col("id"),
          Tokenizer.mergeFold(col("sym"), l, r).as("rx"),
          Tokenizer.mergeFoldHof(col("sym"), l, r).as("hof"))
        .collect()
      got.foreach { row =>
        assert(row.getString(1) === row.getString(2),
          s"pair ($l,$r) on '${syms(row.getLong(0).toInt)}'")
      }
    }
  }
}
