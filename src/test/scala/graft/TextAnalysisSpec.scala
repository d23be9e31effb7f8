package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("docStats computes exact counts and ratios") {
    val df = Seq((1L, "aa bb aa cc")).toDF("doc_id", "text")
    val r = TextAnalysis.docStats(df, "doc_id", "text").collect()(0)
    assert(r.getLong(1) === 11L) // n_chars
    assert(r.getLong(2) === 4L)  // n_tokens
    assert(r.getLong(3) === 3L)  // n_types
    assert(r.getDouble(5) === 2.0) // avg_token_len
    assert(r.getDouble(6) === 0.75) // type_token_ratio
  }

  test("subword estimate counts words, digit runs, punctuation") {
    val df = Seq((1L, "hello, world 42 x!")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.subwordCountEstimate(col("text"))).collect()(0).getInt(0)
    assert(n === 6) // hello , world 42 x !
  }

  test("quality score rewards stopword-bearing prose, penalizes repetition") {
    val df = Seq(
      (1L, "the cat sat on the mat and then the dog came in too"),
      (2L, "x x x x x x x x x x x x")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(q(1L) === 1.0)
    assert(q(2L) === 0.5) // length ok + ttr<0.95 only
  }

  test("repetitionStats computes top/dup 2-gram fractions; short docs get zeros") {
    val df = Seq(
      (1L, "a b a b a b"),   // grams: ab ba ab ba ab → 5 grams, top "a b"×3, all 5 duplicated
      (2L, "a b c d"),       // 3 grams, all distinct
      (3L, "solo")           // < 2 tokens → no grams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r(1L) === ((5L, 3.0 / 5.0, 1.0)))
    assert(r(2L) === ((3L, 1.0 / 3.0, 0.0)))
    assert(r(3L) === ((0L, 0.0, 0.0)))
  }

  test("tokenNgrams guards docs shorter than n (sequence would count down)") {
    val df = Seq((1L, "x"), (2L, "x y z")).toDF("doc_id", "text")
    val g = df.select(col("doc_id"),
        TextAnalysis.tokenNgrams(TextAnalysis.tokens(col("text")), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(g(1L).isEmpty)
    assert(g(2L) === Seq("x y z"))
  }

  test("maxTokenRun finds the longest identical-token run") {
    val df = Seq(
      (1L, "a a a b b c"),
      (2L, "a b a b"),
      (3L, "")               // one empty token → run of 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.maxTokenRun(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("scrubPii redacts URLs before emails, counts every match") {
    val df = Seq(
      (1L, "see http://u@h.com/x mail a.b@c.org or d@e.io call 555-123-4567 ok"),
      (2L, "clean text only")).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // the credential-bearing URL is ONE <URL>, not a mangled <EMAIL>
    assert(r(1L) === (("see <URL> mail <EMAIL> or <EMAIL> call <NUM> ok", 1L, 2L, 1L)))
    assert(r(2L) === (("clean text only", 0L, 0L, 0L)))
  }

  test("repetitionStats and maxTokenRun match pure references on 300 random docs") {
    // small alphabet + short docs force heavy gram ties, runs ending
    // at the array edge, and all-duplicate documents — the fold's
    // corner cases — checked against naive Scala implementations
    val rnd = new scala.util.Random(42)
    val docs = (1L to 300L).map { i =>
      val toks = Seq.fill(1 + rnd.nextInt(12))(("a" + ('a' + rnd.nextInt(3)).toChar))
      (i, toks.mkString(" "), toks)
    }
    def refStats(toks: Seq[String]): (Long, Double, Double) = {
      val grams = if (toks.length < 2) Seq.empty[String]
                  else toks.sliding(2).map(_.mkString(" ")).toSeq
      val total = grams.size.toLong
      if (total == 0L) (0L, 0.0, 0.0)
      else {
        val counts = grams.groupBy(identity).map(_._2.size.toLong)
        (total, counts.max.toDouble / total,
          counts.filter(_ > 1L).sum.toDouble / total)
      }
    }
    def refRun(toks: Seq[String]): Long =
      toks.foldLeft(("", 0L, 0L)) { case ((p, r, b), t) =>
        val nr = if (t == p) r + 1 else 1L
        (t, nr, math.max(b, nr))
      }._3
    val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val gotStats = TextAnalysis.repetitionStats(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val gotRuns = TextAnalysis.maxTokenRun(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, _, toks) =>
      assert(gotStats(id) === refStats(toks), s"repetitionStats mismatch for doc $id: $toks")
      assert(gotRuns(id) === refRun(toks), s"maxTokenRun mismatch for doc $id: $toks")
    }
  }

  test("topTerms ranks by count desc then term asc") {
    val df = Seq((1L, "b a b c a b")).toDF("doc_id", "text")
    val top = TextAnalysis.topTerms(df, "text", 2)
      .orderBy("rank").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(top.toSeq === Seq(("b", 3L, 1), ("a", 2L, 2)))
  }

  test("topTerms rank equals the Window-rank twin on a multi-partition corpus") {
    // rank comes from monotonically_increasing_id over the
    // TakeOrderedAndProject output (single partition, sort order) —
    // pin it against an explicit (cnt desc, term asc) sort of the
    // collected rows, across an input spread over many partitions
    val text = (1 to 200).map(i => s"w${i % 37} w${i % 11} filler$i").mkString(" ")
    val df = (1 to 8).map(p => (p.toLong, text)).toDF("doc_id", "text").repartition(8)
    val got = TextAnalysis.topTerms(df, "text", 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val expectedOrder = got.sortBy { case (term, cnt, _) => (-cnt, term) }
      .zipWithIndex.map { case ((term, cnt, _), i) => (term, cnt, i + 1) }
    assert(got.toSeq === expectedOrder.toSeq)
    assert(got.map(_._3).toSeq === (1 to 20))
  }

  test("curationScores is bit-equal to qualityScore + languageId run separately") {
    val profiles = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "de" -> Seq("der", "die", "und", "das"))
    val df = Seq(
      (1L, "the cat sat on the mat and then the dog came in too"),
      (2L, "der hund und die katze und das haus"),
      (3L, "x x x x x x x x x x x x"),
      (4L, "solitary")).toDF("doc_id", "text")
    val fused = TextAnalysis.curationScores(df, "text", profiles)
      .select("doc_id", "quality", "lang_pred", "lang_score")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2), r.getDouble(3)))).toMap
    val q = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val l = TextAnalysis.languageId(df, "doc_id", "text", profiles)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    for (id <- 1L to 4L) {
      assert(fused(id)._1 === q(id), s"quality mismatch doc $id")
      assert((fused(id)._2, fused(id)._3) === l(id), s"lang mismatch doc $id")
    }
  }

  test("native WinnowMins is bit-identical to the HOF twin on a mixed corpus") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (3L, "ab"), (4L, "abcde"),   // m<1, m=1 edges for k=5
      (5L, "naïve café 東京 λx mixed unicode"),
      (6L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa")).toDF("doc_id", "text")
    for ((k, w) <- Seq((5, 4), (3, 7), (1, 1))) {
      val native = TextAnalysis.winnowMins(df, "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val hof = TextAnalysis.winnowMinsHof(df, "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(native === hof, s"k=$k w=$w")
    }
  }

  test("termFrequencies yields tf per doc and df per term") {
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val tf = TextAnalysis.termFrequencies(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(tf((1L, "a")) === ((2L, 2L)))
    assert(tf((2L, "a")) === ((1L, 2L)))
    assert(tf((1L, "b")) === ((1L, 1L)))
    assert(tf((2L, "c")) === ((1L, 1L)))
  }

  test("tfIdf: corpus-wide terms get zero idf") {
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfIdf(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(rows((1L, "a")) === 0.0) // df = N → ln(1) = 0
    assert(rows((1L, "b")) > 0.0)
  }

  test("languageId picks the profile with highest token coverage") {
    val df = Seq(
      (1L, "the cat and the dog of a town"),
      (2L, "el gato y la casa de los perros"),
      (3L, "qqq www zzz")).toDF("doc_id", "text")
    val profiles = Seq(
      "en" -> Seq("the", "a", "and", "of"),
      "es" -> Seq("el", "la", "los", "y"))
    val got = TextAnalysis.languageId(df, "doc_id", "text", profiles)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === "en")
    assert(got(2L)._1 === "es")
    assert(got(3L) === (("en", 0.0))) // all-zero tie → lexicographic first
  }

  test("languageIdNgram: trigram coverage scores; short text scores 0.0, not 0/0") {
    val profiles = Seq("en" -> Seq("the", "he "), "fr" -> Seq("le ", " de"))
    val df = Seq(
      (1L, "the cat and the dog"), // contains 'the'/'he ' grams
      (2L, "le chat de paris"),    // contains 'le '/' de'
      (3L, "ab")                   // too short for any trigram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageIdNgram(df, "doc_id", "text", profiles)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == "en" && got(1L)._2 > 0.0)
    assert(got(2L)._1 == "fr" && got(2L)._2 > 0.0)
    assert(got(3L) == (("en", 0.0))) // all-zero tie -> lexicographic first, score 0.0
  }

  test("vocabSizeApprox lands within the HLL error bound of the exact count") {
    val docs = (1 to 200).map(i => (i.toLong, s"tok_${i * 5} tok_${i * 5 + 1} tok_${i * 5 + 2}"))
      .toDF("doc_id", "text") // 600 distinct tokens, no overlap
    val approx = TextAnalysis.vocabSizeApprox(docs, "text", rsd = 0.02)
      .collect()(0).getLong(0)
    assert(math.abs(approx - 600L) <= 600L / 10, s"approx=$approx vs exact=600")
  }

  test("winnow matches a local reference; shared substrings share a fingerprint") {
    def localWinnow(text: String, k: Int, w: Int): String = {
      val P = 2147483647L
      val m = text.length - (k - 1)
      if (m < 1) ""
      else {
        val hs = (0 until m).map(i =>
          text.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P))
        val mins = if (m <= w) Seq(hs.min) else (0 to m - w).map(j => hs.slice(j, j + w).min)
        mins.distinct.sorted.mkString(",")
      }
    }
    val rnd = new scala.util.Random(13)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val texts = Seq("", "ab", "abcd", "abcde", "abcdefgh") ++ (1 to 20).map(_ => randStr(5 + rnd.nextInt(120)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.winnow(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == localWinnow(t, 5, 4), s"doc $i: '$t'")
    }
    // detection guarantee: a shared substring of length >= w + k - 1
    // yields at least one common fingerprint
    val shared = randStr(30)
    val a = randStr(40) + shared + randStr(40)
    val b = randStr(40) + shared + randStr(40)
    val pair = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(pair, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1).split(",").toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("buildVocab: contiguous ids by (count desc, term asc), matches window twin") {
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a b d"), (3L, "c c b e")
    ).toDF("doc_id", "text")
    // counts: b=5 a=3 c=3 d=1 e=1 -> ids: b=1, a=2, c=3, d=4, e=5
    val got = TextAnalysis.buildVocab(docs, "text", numPartitions = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("b" -> ((5L, 1L)), "a" -> ((3L, 2L)), "c" -> ((3L, 3L)),
      "d" -> ((1L, 4L)), "e" -> ((1L, 5L))))
    // parity with a window twin on a larger synthetic vocabulary
    val big = (1L to 300L).map(i => (i, s"w${i % 71} w${i % 13} w${i % 7}"))
      .toDF("doc_id", "text")
    val twinCounts = big.select(explode(split($"text", " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val twin = twinCounts.withColumn("vocab_id",
        row_number().over(Window.orderBy($"cnt".desc, $"term")).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val ours = TextAnalysis.buildVocab(big, "text", numPartitions = 5)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ours === twin)
  }

  test("oovRate: exact fractions, vocab side broadcast in the plan") {
    val docs = Seq((1L, "a b c d"), (2L, "a a x"), (3L, "z")).toDF("doc_id", "text")
    val vocab = Seq("a", "b", "a").toDF("term") // duplicate collapses
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 2L, 0.5)))      // c, d OOV
    assert(got(2L) === ((3L, 1L, 1.0 / 3)))  // x OOV
    assert(got(3L) === ((1L, 1L, 1.0)))      // all OOV
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary must broadcast, got:\n$plan")
  }

  test("chunkByTokens: stride/overlap geometry, short docs, exact reassembly") {
    val n = 100
    val doc = (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkByTokens(df, "doc_id", "text", maxTokens = 32, overlap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 25, 49, 73 -> 4 chunks; last covers 73..100 = 28 tokens
    assert(d1.length === 4)
    assert(d1.map(_._4).toSeq === Seq(32L, 32L, 32L, 28L))
    assert(d1(0)._3.startsWith("t1 ") && d1(1)._3.startsWith("t25 ")
      && d1(3)._3.endsWith(" t100"))
    // consecutive chunks share exactly the 8-token overlap
    val c0 = d1(0)._3.split(" "); val c1 = d1(1)._3.split(" ")
    assert(c0.takeRight(8).toSeq === c1.take(8).toSeq)
    // stitching chunk 0 + non-overlap tails reassembles the document
    val stitched = (d1(0)._3.split(" ") ++ d1.drop(1).flatMap(_._3.split(" ").drop(8))).mkString(" ")
    assert(stitched === doc)
    // short docs: exactly one chunk, the doc itself
    assert(rows.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b", 2L)))
    assert(rows.filter(_._1 == 3L).toSeq === Seq((3L, 0L, "x", 1L)))
    // no-overlap mode partitions the tokens exactly
    val flat = TextAnalysis.chunkByTokens(df.filter($"doc_id" === 1L), "doc_id", "text",
        maxTokens = 30, overlap = 0)
      .collect().sortBy(_.getLong(1)).flatMap(_.getString(2).split(" "))
    assert(flat.toSeq === doc.split(" ").toSeq)
  }

  test("stripMarkup: tags out, entities decoded, spaces collapsed, tag soup survives") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "a &lt;b&gt; &amp; c &quot;d&quot; &apos;e&apos;"),
      (3L, "plain text no markup"),
      (4L, "broken <tag soup < here > stays")  // unclosed < is not a tag
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripMarkup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("hello world", 4L)))
    assert(got(2L) === (("a <b> & c \"d\" 'e'", 0L)))
    assert(got(3L) === (("plain text no markup", 0L)))
    // "<tag soup < here >" — the regexp takes the INNERMOST <...>
    // bracket pair (no nested <>), the dangling "<" survives as text
    assert(got(4L)._1 === "broken <tag soup stays" && got(4L)._2 === 1L)
  }

  test("truncateTokens: budget slice, exact kept/dropped counts, short docs untouched") {
    val df = Seq((1L, "a b c d e"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.truncateTokens(df, "doc_id", "text", maxTokens = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === (("a b c", 3L, 2L)))
    assert(got(2L) === (("x y", 2L, 0L)))
  }

  test("splitSentences: boundaries on punct+space, punctuation retained, blanks dropped") {
    val df = Seq(
      (1L, "first sentence. second one! third? tail"),
      (2L, "no punctuation at all"),
      (3L, "double punct!!  and spaces. "),
      (4L, "ends clean.")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.splitSentences(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3))).toMap
    assert(got((1L, 1)) === (("first sentence.", 4L)))
    assert(got((1L, 2)) === (("second one!", 4L)))
    assert(got((1L, 3)) === (("third?", 4L)))
    assert(got((1L, 4)) === (("tail", 4L)))
    assert(got((2L, 1)) === (("no punctuation at all", 1L)))
    assert(got((3L, 1)) === (("double punct!!", 2L)))   // punct run kept whole
    assert(got((3L, 2)) === (("and spaces.", 2L)))      // trailing blank dropped
    assert(got((4L, 1)) === (("ends clean.", 1L)))
    assert(!got.contains((3L, 3)) && !got.contains((4L, 2)))
  }

  test("normalizeText: control chars, space runs, trim, case; audit delta") {
    val df = Seq(
      (1L, "  Hello\tWorld  twice  "),
      (2L, "already clean"),
      (3L, "MiXeD Case")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.normalizeText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L)._1 === "hello world twice")
    assert(got(1L)._2 === ("  Hello\tWorld  twice  ".length - "hello world twice".length).toLong)
    assert(got(2L) === (("already clean", 0L)))
    assert(got(3L) === (("mixed case", 0L)))
    // lowercase=false preserves case but still cleans whitespace
    val keep = TextAnalysis.normalizeText(df, "doc_id", "text", lowercase = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(3L) === "MiXeD Case")
    assert(keep(1L) === "Hello World twice")
  }

  test("bm25Score: tf-monotone, zero for term-free docs, logIdf preserves order") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark spark row row"),
      (2L, "spark row row row row"),
      (3L, "table table table table table")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Score(df, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L)._1 === 5L)                        // dl = token count
    assert(got(1L)._2 > got(2L)._2, "higher tf must score higher at equal dl")
    assert(got(3L)._2 === 0.0, "a doc with no query term scores exactly 0")
    // log idf reorders nothing (ln is monotone); multi-term sums both terms
    val logGot = TextAnalysis.bm25Score(df, "doc_id", "text", Seq("spark"), logIdf = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(logGot(1L) > logGot(2L) && logGot(3L) === 0.0)
    val two = TextAnalysis.bm25Score(df, "doc_id", "text", Seq("spark", "table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(two(3L) > 0.0, "second term must contribute")
  }

  test("corpusNgramScore: corpus-frequency means, NULL for too-short docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),      // bigrams: "a b", "b c"
      (2L, "a b d"),      // bigrams: "a b", "b d"
      (3L, "z")           // too short for any bigram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.corpusNgramScore(df, "doc_id", "text", n = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    // corpus counts: "a b" -> 2, "b c" -> 1, "b d" -> 1
    assert(got(1L)._1 === 2L && got(1L)._2 === 3L && got(1L)._3 === 1.5)
    assert(got(2L)._1 === 2L && got(2L)._2 === 3L && got(2L)._3 === 1.5)
    assert(got(3L)._1 === 0L && got(3L)._2 === 0L && got(3L)._3.isNaN)
  }

  test("dropBoilerplateLines: frequent lines go, order survives, all-boiler docs empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique one\ncommon footer\nunique two"),
      (2L, "another body\ncommon footer"),
      (3L, "common footer")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dropBoilerplateLines(df, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === (("unique one\nunique two", 3L, 1L)))
    assert(got(2L) === (("another body", 2L, 1L)))
    assert(got(3L) === (("", 1L, 1L)))
    // a line repeated WITHIN one doc is not boilerplate (distinct-doc count)
    val within = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val w = TextAnalysis.dropBoilerplateLines(within, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(w(1L) === "x\nx\nx")
  }

  test("collocations: lift arithmetic, minCount guard, rank order") {
    import spark.implicits._
    // "x y" appears 3 times and x, y appear ONLY there (c=3 each) —
    // a tight collocation; "a b" appears 4 times but a, b are
    // everywhere (c=5 each) — loose
    val df = Seq(
      (1L, "x y a b a b"),
      (2L, "x y a b a b"),
      (3L, "x y b a")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(df, "text", minCount = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3), r.getLong(4)))
    // bigram totals: doc1/2 have 5 bigrams each, doc3 has 3 -> N = 13
    // lift(x,y) = 3*13/(3*3); lift(a,b) = 4*13/(5*5)
    val byPair = got.map(t => (t._1, t._2) -> t).toMap
    assert(byPair(("x", "y"))._4 === 3.0 * 13 / 9)
    assert(byPair(("a", "b"))._3 === 4L)
    assert(byPair(("a", "b"))._4 === 4.0 * 13 / 25)
    assert(byPair(("x", "y"))._5 === 1L, "the tight pair must rank first")
    // pairs under minCount never appear ("y a" occurs twice)
    assert(!got.exists(t => t._1 == "y" && t._2 == "a"))
    graft.operators.Dedup.releaseCaches()
  }

  test("vocabCoverage: exact Zipf-head fractions with rank tie-break") {
    import spark.implicits._
    // counts: a=4, b=2, c=1, d=1 (ties c/d break by term asc) → total 8
    val df = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "text", ks = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((4L, 8L, 0.5)))
    assert(got(2L) === ((6L, 8L, 0.75)))
    assert(got(3L) === ((7L, 8L, 0.875))) // rank 3 = "c" (tie with d, term asc)
  }

  test("chiSquareCollocations: exact contingency arithmetic and ranking") {
    import spark.implicits._
    // same corpus as the lift spec: N=13 bigrams; (x,y) n11=3,
    // n1p(x)=3, np1(y)=3; (a,b) n11=4, n1p(a)=4, np1(b)=5
    val df = Seq(
      (1L, "x y a b a b"),
      (2L, "x y a b a b"),
      (3L, "x y b a")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chiSquareCollocations(df, "text", minCount = 3L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // chi2(x,y): a=3 b=0 c=0 d=10, dif=30 → 13*30*30/(3*10*3*10) = 13.0
    val (n11, n1p, np1, chi2) = got(("x", "y"))
    assert((n11, n1p, np1) === ((3L, 3L, 3L)))
    assert(chi2 === 13.0 * 30 * 30 / (3.0 * 10 * 3 * 10))
    // chi2(a,b): a=4 b=0 c=1 d=8, dif=4·8−0·1=32 → 13·32²/(4·9·5·8)
    assert(got(("a", "b"))._4 === 13.0 * 32 * 32 / (4.0 * 9 * 5 * 8))
    assert(got(("x", "y"))._4 > got(("a", "b"))._4,
      "the exclusive pair must outrank the promiscuous one")
  }

  test("distinctiveTerms: lift arithmetic, smoothing, per-group rank ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", "x x y"),
      (2L, "B", "y y z")
    ).toDF("doc_id", "src", "text")
    val got = TextAnalysis.distinctiveTerms(df, "src", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    // T_A = T_B = 3, T = 6; tf: x=2, y=3, z=1
    // lift(x,A) = 2*3/(1*3) = 2 (x exclusive to A → rest-count smooths to 1)
    // lift(y,A) = 1*3/(3*3) = 1/3; lift(y,B) = 2*3/(2*3) = 1; lift(z,B) = 1*3/(1*3) = 1
    assert(got(("A", "x")) === ((2L, 2.0, 1L)))
    assert(got(("A", "y")) === ((1L, 1.0 / 3.0, 2L)))
    // B ties at 1.0 → term asc: y before z
    assert(got(("B", "y")) === ((2L, 1.0, 1L)))
    assert(got(("B", "z")) === ((1L, 1.0, 2L)))
    graft.operators.Dedup.releaseCaches()
  }

  test("lexicalDiversity: exact Simpson arithmetic, empty docs, filtered blanks") {
    val df = Seq(
      (1L, "a a a b"),   // n=4 types=2 ssq=9+1=10
      (2L, "a  b"),      // double space → blank token filtered: n=2 types=2 ssq=2
      (3L, "")           // no tokens at all
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 4L)
    assert(got(1L).getLong(2) === 2L)
    assert(got(1L).getLong(3) === 10L)
    assert(got(1L).getDouble(4) === (16.0 - 10.0) / 16.0)
    assert(got(1L).getDouble(5) === 16.0 / 10.0)
    assert(got(2L).getLong(1) === 2L)
    assert(got(2L).getLong(3) === 2L)
    assert(got(2L).getDouble(4) === 0.5)
    assert(got(3L).getLong(1) === 0L)
    assert(got(3L).getLong(2) === 0L)
    assert(got(3L).getLong(3) === 0L)
    assert(got(3L).isNullAt(4) && got(3L).isNullAt(5))
  }

  test("lexicalDiversity matches a pure reference on 200 random docs") {
    val rnd = new scala.util.Random(8L)
    val docs = (1L to 200L).map { id =>
      val n = rnd.nextInt(30)
      id -> (0 until n).map(_ => ('a' + rnd.nextInt(5)).toChar.toString).mkString(" ")
    }
    val got = TextAnalysis.lexicalDiversity(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val cs = toks.groupBy(identity).map(_._2.length.toLong)
      val ref = (toks.length.toLong, cs.size.toLong, cs.map(c => c * c).sum)
      assert(got(id) === ref, s"doc $id: '$text'")
    }
  }

  test("stopwordReport ranks by document frequency then count then term") {
    val df = Seq((1L, "the cat the"), (2L, "the dog"), (3L, "dog dog"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stopwordReport(df, "text", topK = 10)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // dog: df=2 cnt=3; the: df=2 cnt=3 (tie → term asc); cat: df=1 cnt=1
    assert(got.toSeq === Seq(
      ("dog", 2L, 3L, 2.0 / 3.0, 1L),
      ("the", 2L, 3L, 2.0 / 3.0, 2L),
      ("cat", 1L, 1L, 1.0 / 3.0, 3L)))
  }

  test("zipfProfile: head ranks, frac-of-top, cumulative corpus share") {
    val df = Seq((1L, "the cat the"), (2L, "the dog"), (3L, "dog dog"))
      .toDF("doc_id", "text")
    // counts: the=3 dog=3 cat=1, total=7
    val got = TextAnalysis.zipfProfile(df, "text", topN = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, "dog", 3L, 1.0, 3.0 / 7.0),
      (2L, "the", 3L, 1.0, 6.0 / 7.0)))
  }

  test("readability: exact counts, sentence floor, hand-checked Flesch") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 marks, 6 vowel groups
      (2L, "no punctuation here"),        // floor engages: 1 sentence
      (3L, "")                            // zero words → NULL score
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5)))).toMap
    val f1 = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(got(1L) === ((6L, 2L, 6L, 2L, f1)))
    val f2 = 206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (6.0 / 3.0)
    assert(got(2L)._2 === 0L)
    assert(got(2L)._4 === 1L) // floored
    assert(got(2L)._5 === f2)
    assert(got(3L)._1 === 0L && got(3L)._5.isNaN)
  }

  test("searchTopK: per-query ranking, zero-match docs dropped, k bound") {
    val docs = Seq(
      (1L, "join join hash table"),   // strong q_joins hit
      (2L, "hash scan"),              // q_joins (hash) + q_scans (scan)
      (3L, "the quick fox"),          // matches nothing
      (4L, "scan scan scan filter")   // strong q_scans hit
    ).toDF("doc_id", "text")
    val got = TextAnalysis.searchTopK(docs, "doc_id", "text",
      queries = Seq("q_joins" -> Seq("join", "hash"), "q_scans" -> Seq("scan", "filter")),
      k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // q_joins: doc 1 (join×2 + hash) over doc 2 (hash only);
    // q_scans: doc 4 over doc 2; doc 3 appears nowhere
    assert(got === Set(
      ("q_joins", 1L, 1L), ("q_joins", 2L, 2L),
      ("q_scans", 1L, 4L), ("q_scans", 2L, 2L)))
  }

  test("searchTopK single query agrees with bm25Score ranking") {
    val docs = Seq(
      (1L, "spark table value spark"), (2L, "table value"),
      (3L, "value"), (4L, "spark spark")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "value")
    val viaSearch = TextAnalysis.searchTopK(docs, "doc_id", "text",
      queries = Seq("q" -> terms), k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    val viaScore = TextAnalysis.bm25Score(docs, "doc_id", "text", terms)
      .filter(col("bm25") > 0).orderBy(col("bm25").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(viaSearch.toSeq === viaScore.toSeq)
  }

  test("fingerprint is the 31-base modular fold of char codes") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val fp = df.select(TextAnalysis.fingerprint(col("text"))).collect()(0).getLong(0)
    assert(fp === ((97L * 31 + 98) * 31 + 99) % 2147483647L)
    // equal text ⇒ equal fingerprint; different text ⇒ (almost surely) different
    val df2 = Seq((1L, "abc"), (2L, "abd")).toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
    assert(df2.count() === 2)
  }

  test("bigramLmScore: add-1 smoothed conditional counts, hand-checked") {
    // train: "a b a b" -> bigrams (a,b)x2, (b,a); "a c" -> (a,c)
    // cb: (a,b)=2 (b,a)=1 (a,c)=1; cu: a=3, b=1; V = |{a,b,c}| = 3
    val train = Seq((10L, "a b a b"), (11L, "a c")).toDF("doc_id", "text")
    val cand = Seq((1L, "a b"), (2L, "z z z"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(train, cand, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // "a b": inv p(b|a) = (3+3)/(2+1) = 2.0
    assert(got(1L)._1 === 1L && got(1L)._2 === Some(2.0))
    assert(math.abs(got(1L)._3.get - math.log(0.5)) < 1e-12) // ln p(b|a) = ln ½
    // "z z z": unseen context — inv = (0+3)/(0+1) = 3.0, twice
    assert(got(2L)._1 === 2L && got(2L)._2 === Some(3.0))
    // "x": no bigrams — kept with NULL score
    assert(got(3L)._1 === 0L && got(3L)._2 === None)
  }

  test("bigramLmScore ranks an in-distribution doc above shuffled gibberish") {
    val train = Seq.tabulate(20)(i => (i.toLong, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    val cand = Seq((100L, "the quick brown fox"), (101L, "fox the jumps quick"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(train, cand, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(100L) < got(101L)) // lower mean inverse probability = more typical
  }

  test("keywords: rational-idf tf-idf top-k with (score desc, term) ties") {
    // N=2. tf d1: a=2 b=1; d2: b=1 c=1. df: a=1 b=2 c=1.
    // idf a,c = 1.5/1.5 = 1.0; idf b = 0.5/2.5 = 0.2
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.keywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getDouble(3))))
      .toMap
    assert(got((1L, 1L)) === (("a", 2.0)))
    assert(got((1L, 2L)) === (("b", 0.2)))
    assert(got((2L, 1L)) === (("c", 1.0)))
    assert(got((2L, 2L)) === (("b", 0.2)))
  }

  test("invertedIndex: exact df, ascending bounded postings, per-doc dedup") {
    val docs = Seq((3L, "a b a"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(got("a") === ((3L, Seq(1L, 2L))), "df counts all docs; postings cap at 2, lowest ids")
    assert(got("b") === ((1L, Seq(3L))))
    assert(got("c") === ((1L, Seq(1L))))
  }

  test("sourceSimilarity: exact long dot/norms, canonical pair order") {
    // s1: a a b → tf {a:2, b:1}, n² = 5
    // s2: a b b → tf {a:1, b:2}, n² = 5; dot = 2+2 = 4, cos = 4/5
    // s3: c     → disjoint from both: no rows (dot would be 0)
    val docs = Seq(("s1", "a a b"), ("s2", "a b b"), ("s3", "c"))
      .toDF("source", "text")
    val got = TextAnalysis.sourceSimilarity(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    try {
      assert(got.keySet === Set(("s1", "s2")), "disjoint pairs emit nothing")
      assert(got(("s1", "s2"))._1 === 4L)
      assert(got(("s1", "s2"))._2 === 4.0 / (math.sqrt(5.0) * math.sqrt(5.0)))
    } finally graft.operators.Dedup.releaseCaches()
  }

  test("featureHash: same token always lands in the same signed bucket; repeats add") {
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.featureHash(df, "doc_id", "text", dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 64 })
    // token determinism: "a" maps identically in both docs; doc 1 has
    // it twice so its weight is exactly 2× doc 2's
    val aBuckets1 = got.filter { case ((d, _), w) => d == 1L && math.abs(w) == 2 }
    assert(aBuckets1.size === 1)
    val ((_, aB), aW) = aBuckets1.head
    assert(got((2L, aB)) === aW / 2)
    // per-doc total |weight| ≤ token count and parity matches: every
    // token contributes exactly ±1
    assert(got.collect { case ((d, _), w) if d == 1L => math.abs(w) }.sum <= 3)
  }

  test("vocabGrowth: types enter at their first doc; checkpoints count prefixes") {
    val df = Seq((1L, "a b"), (2L, "b c"), (5L, "d"), (9L, "a e f"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(df, "doc_id", "text", Seq(2L, 5L, 10L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(2L) === ((2L, 3L)))  // docs 1,2 → {a,b,c}
    assert(got(5L) === ((3L, 4L)))  // +doc 5 → {a,b,c,d}
    assert(got(10L) === ((4L, 6L))) // +doc 9 → {a,b,c,d,e,f}
  }

  test("kwic: contexts truncate at document boundaries, every occurrence emits") {
    val df = Seq((1L, "spark a b c spark"), (2L, "x spark y")).toDF("doc_id", "text")
    val got = TextAnalysis.kwic(df, "doc_id", "text", term = "spark", window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3)))).toMap
    assert(got((1L, 1L)) === (("", "a b")))      // doc start: empty left
    assert(got((1L, 5L)) === (("b c", "")))      // doc end: empty right
    assert(got((2L, 2L)) === (("x", "y")))
    assert(got.size === 3)
  }

  test("featureHash: colliding tokens cancel or add by the sign hash (sum invariant)") {
    // Σ weight over all buckets of a doc = (#positive-sign tokens −
    // #negative-sign tokens) — recompute from md5 directly
    val toks = Seq("x", "y", "z", "w", "v")
    val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val exp = toks.map { t =>
      val h = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      1L - 2L * (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2)
    }.sum
    val got = TextAnalysis.featureHash(df, "doc_id", "text", dim = 8).collect()
      .map(_.getLong(2)).sum
    assert(got === exp)
  }

  test("chunkByTokens: a NULL text yields zero chunks, not a phantom full-budget one (review r15)") {
    import spark.implicits._
    val df = Seq((1L, Some("a b c")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.chunkByTokens(df, "doc_id", "text", maxTokens = 2)
      .collect()
    assert(rows.forall(_.getLong(0) == 1L),
      "the NULL-text doc must emit no chunk rows")
    assert(rows.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet ==
      Set((0L, "a b", 2L), (1L, "c", 1L)))
  }

  test("oovRate keeps token-less docs with NULL stats (review r15)") {
    import spark.implicits._
    val docs = Seq((1L, Some("x y")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val vocab = Seq(Tuple1("x")).toDF("term")
    val got = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(got.keySet == Set(1L, 2L),
      "the NULL-text doc must stay in the output instead of vanishing")
    assert(got(1L).contains((2L, 1L)) && got(2L).isEmpty)
  }
}
