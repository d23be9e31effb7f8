package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, document
  * statistics / quality scoring, term frequencies, TF-IDF, a
  * stopword-profile language-ID heuristic, and a rolling-hash document
  * fingerprint.
  *
  * Everything is per-row Catalyst HOF math or a single hash-aggregate
  * — no UDFs, no driver-side loops. Ratios are divisions of exact
  * integer counts and the rolling hash is 31-bit modular arithmetic
  * (every intermediate < 2^36, exact in long), so all outputs are
  * bit-exact cross-engine.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space split, like Dedup.tokens). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword token-count estimate: words + digit runs +
    * punctuation glyphs each count once — the usual ~chars/4 LLM
    * budget heuristic, computed exactly as a regexp count. */
  def subwordCountEstimate(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Per-document statistics: token/char/distinct counts, mean token
    * length, type-token ratio. */
  def docStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_types"),
      subwordCountEstimate(col(textCol)).cast("long").as("n_subwords"),
      // mean token length: sequential fold, exact ints, one division
      (aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double")
        / size(toks).cast("double")).as("avg_token_len"),
      (size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .as("type_token_ratio"))
  }

  /** Quality heuristics à la C4/Gopher filtering: flag docs that are
    * too short/long, too repetitive, or stopword-free. The score is a
    * weighted sum of exact ratios (deterministic). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val stopRatio = (size(array_intersect(toks, typedlit(stopwords))).cast("double")
      / size(array_distinct(toks)).cast("double"))
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopCnt = size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val stopTokRatio = stopCnt.cast("double") / nTok
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      stopRatio.as("stop_coverage"),
      stopTokRatio.as("stop_token_ratio"),
      ttr.as("type_token_ratio"),
      qualityFromRatios(toks, stopTokRatio, ttr).as("quality"))
  }

  /** The quality formula over already-built ratio columns — each
    * ratio tree is expressed ONCE per caller (qualityScore reuses its
    * exported columns; qualityCol builds them for curationScores). */
  private def qualityFromRatios(toks: Column, stopTokRatio: Column, ttr: Column): Column = {
    val lenOk = when(size(toks).between(5, 1000), 1.0).otherwise(0.0)
    lenOk * 0.25 +
      when(stopTokRatio > 0.05, 0.25).otherwise(0.0) +
      when(ttr > 0.2, 0.25).otherwise(0.0) +
      when(ttr < 0.95, 0.25).otherwise(0.0)
  }

  /** The quality score as a composable Column over a token array —
    * used by the fused curationScores (identical arithmetic to
    * qualityScore, so both produce bit-equal scores). */
  private def qualityCol(toks: Column, stopwords: Seq[String]): Column = {
    val nTok = size(toks).cast("double")
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val stopCnt = size(filter(toks, t => t.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val stopTokRatio = stopCnt.cast("double") / nTok
    qualityFromRatios(toks, stopTokRatio, ttr)
  }

  /** Words treated as stopwords by the quality/language heuristics —
    * function words of the synthetic corpus's shared vocabulary. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Corpus-level term frequencies with rank, top-n by (count desc,
    * term asc). One explode + one hash-aggregate + a parallel top-n:
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject — each
    * partition ships only its local top-n, never the full vocabulary
    * (an unpartitioned ranking Window would sort hundreds of millions
    * of distinct terms on ONE partition at web-corpus scale). Rank is
    * then just the row index of the sorted output:
    * TakeOrderedAndProject emits ONE partition in sort order, so
    * monotonically_increasing_id() counts 0..n-1 down it — no
    * post-limit Window (whose "No Partition Defined" warning, though
    * benign on n rows, reads like a scale bug), and the operator
    * stays LAZY (composing the plan triggers no job). The local
    * re-sort after the limit (sortWithinPartitions — no exchange, n
    * rows) pins the ORDER the id counts down against block-fetch
    * nondeterminism in the single-partition output; it cannot repair
    * a planner fallback to LocalLimit+GlobalLimit (e.g. a low
    * spark.sql.execution.topKSortFallbackThreshold), which could pick
    * the wrong SET of n rows before any re-sort runs — the
    * TakeOrderedAndProject plan-shape assertion in PlanShapeSpec is
    * the guard for that. The id==rank contract is pinned against a
    * Window twin in TextAnalysisSpec. */
  def topTerms(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val counts = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("term")).limit(n)
      .sortWithinPartitions(col("cnt").desc, col("term"))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
  }

  /** Deterministic vocabulary build: every distinct term with its
    * corpus count and a contiguous 1-based vocab_id assigned by
    * (count desc, term asc) — the token→id table a tokenizer or
    * embedding layer trains against. Unlike topTerms (top-n only,
    * single output partition), this ranks the ENTIRE vocabulary —
    * hundreds of millions of terms at web scale — so the ranking runs
    * through Curation.globalRank's range-partition + offset form: one
    * explode, one hash-aggregate, one range exchange; no global
    * single-partition sort anywhere. */
  def buildVocab(df: DataFrame, textCol: String, numPartitions: Int = 0): DataFrame = {
    val counts = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    Curation.globalRank(counts, "vocab_id", numPartitions,
      col("cnt").desc, col("term").asc)
  }

  /** Sliding-window document chunking by token budget: split each
    * document into chunks of maxTokens tokens whose starts are
    * `stride = maxTokens - overlap` apart (consecutive chunks share
    * `overlap` tokens — the standard long-document treatment before
    * packing into training sequences). Documents are never dropped: a
    * doc with ≤ maxTokens tokens is one chunk of itself. The chunk
    * count is exactly ceil((n - overlap) / stride) (min 1), expressed
    * as a stepped `sequence` of start positions so the arithmetic
    * stays in exact integers. Rowwise transform + one generator
    * (posexplode) — no shuffle; output grows the corpus by at most
    * ~1/(1 - overlap/maxTokens)×.
    * Output: (idCol, chunk_id 0-based, chunk_text, n_tokens). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val stride = (maxTokens - overlap).toLong
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    // NULL text ⇒ NO chunks (review r15): without the gate,
    // greatest/least skip the NULL operand and posexplode emitted one
    // garbage chunk per NULL-text doc — chunk_text NULL with
    // n_tokens = maxTokens, a full phantom budget in any downstream
    // token-sum packer
    val starts = when(toks.isNotNull,
      sequence(lit(1L), greatest(lit(1L), n - overlap.toLong), lit(stride)))
    df.select(col(idCol), n.as("__n"),
        posexplode(transform(starts,
          s => array_join(slice(toks, s, lit(maxTokens)), " "))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"),
        least(lit(maxTokens.toLong), col("__n") - lit(stride) * col("pos"))
          .as("n_tokens"))
  }

  /** Text normalization for curation: control characters (ASCII
    * C0 + DEL) become spaces, space runs collapse to one, the result
    * is trimmed and (optionally) lowercased. Patterns use hex escapes
    * and literal classes only — the same strings run identically on
    * Java regex and RE2-family engines (same portability contract as
    * scrubPii). One map-only codegen pass, no shuffle; the audit
    * column n_chars_removed = length delta lets a pipeline monitor
    * how much it is rewriting. Output: (idCol, norm_text,
    * n_chars_removed). */
  /** Markup stripping (the C4-style "extracted text only" pass): drop
    * HTML/XML tags, decode the five XML entities, collapse the spaces
    * the removals leave behind. Deliberately a THREE-regexp cascade,
    * not a parser — the standard web-corpus treatment where malformed
    * tag soup must degrade to text, never to an error. RE2-portable
    * patterns (the oracle replays them verbatim); map-only codegen
    * pass, no shuffle. Output: (idCol, clean_text, n_tags_removed). */
  def stripMarkup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTags = regexp_count(t, lit("<[^<>]*>")).cast("long")
    val noTags = regexp_replace(t, "<[^<>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&apos;", "'"), "&amp;", "&")
    val collapsed = trim(regexp_replace(decoded, "  +", " "))
    df.select(col(idCol), collapsed.as("clean_text"), nTags.as("n_tags_removed"))
  }

  /** Token-budget truncation (the max-document-length guard run
    * before chunking/packing): keep the first maxTokens whitespace
    * tokens, drop the rest, report what was cut. Rowwise slice +
    * rejoin — exact integers, no shuffle. Output: (idCol, text
    * truncated, n_tokens_kept, n_tokens_dropped). */
  def truncateTokens(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val toks = tokens(col(textCol))
    val kept = least(size(toks), lit(maxTokens))
    df.select(col(idCol),
      array_join(slice(toks, 1, maxTokens), " ").as("text"),
      kept.cast("long").as("n_tokens_kept"),
      (size(toks) - kept).cast("long").as("n_tokens_dropped"))
  }

  /** Sentence segmentation (the paragraph/sentence-level row
    * explosion C4-style span filters run on): a sentence boundary is
    * a [.!?] run followed by whitespace. RE2-portable construction —
    * no lookbehind (RE2, hence the DuckDB oracle, has none): the
    * boundary regex rewrites "<punct><space>" to "<punct>" with
    * a capture backreference, then splits on the sentinel, so
    * terminal punctuation STAYS with its sentence. Control chars
    * (x00-x1F, x7F) are stripped to spaces BEFORE the rewrite — a
    * stray \u0001 in scraped text would otherwise collide with the
    * sentinel and fabricate a boundary. Empty/blank fragments are
    * dropped; sent_id is the 1-based in-document position. A document
    * whose text is empty or whitespace-only emits NO rows (there is
    * no sentence to emit — unlike chunkByTokens' never-drop contract,
    * a stated drop: left-join sentences back to documents if every id
    * must survive). Rowwise generator — one scan, no shuffle. Output:
    * (idCol, sent_id, sentence, n_sents). */
  def splitSentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val clean = regexp_replace(col(textCol), "[\\x00-\\x1F\\x7F]", " ")
    val marked = regexp_replace(clean, "([.!?]+)\\s+", "$1\u0001")
    val sents = filter(transform(split(marked, "\u0001"), s => trim(s)),
      s => length(s) > 0)
    df.select(col(idCol), sents.as("__s"))
      .select(col(idCol), size(col("__s")).cast("long").as("n_sents"),
        posexplode(col("__s")).as(Seq("__p", "sentence")))
      .select(col(idCol), (col("__p") + 1).cast("int").as("sent_id"),
        col("sentence"), col("n_sents"))
  }

  def normalizeText(df: DataFrame, idCol: String, textCol: String,
                    lowercase: Boolean = true): DataFrame = {
    val t = col(textCol)
    val noCtrl = regexp_replace(t, "[\\x00-\\x1F\\x7F]", " ")
    val collapsed = trim(regexp_replace(noCtrl, "  +", " "))
    val norm = if (lowercase) lower(collapsed) else collapsed
    df.select(col(idCol), norm.as("norm_text"),
      (length(t) - length(norm)).cast("long").as("n_chars_removed"))
  }

  /** Per-document out-of-vocabulary rate against a reference
    * vocabulary (typically the top-k rows of buildVocab, or a
    * tokenizer's term table): n_oov / n_tokens — the coverage signal
    * used both for quality filtering (high OOV ⇒ noise/wrong
    * language) and for sizing a tokenizer's vocab. The vocabulary is
    * BROADCAST (it is the small relation — even a 1M-term vocab is
    * MBs against a 100 TB corpus), so the corpus-side explode joins
    * map-side with no corpus shuffle; the per-doc counts then partial-
    * aggregate to one row per document. Counts are exact integers,
    * the rate one exact division — bit-exact cross-engine.
    * Output: (idCol, n_tokens, n_oov, oov_rate). */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame, termCol: String = "term"): DataFrame = {
    val v = broadcast(vocab.select(col(termCol).as("__term")).distinct()
      .withColumn("__in", lit(1)))
    val per = df.select(col(idCol), explode(tokens(col(textCol))).as("__term"))
      .join(v, Seq("__term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
    // join back to the full DISTINCT id set (the corpusNgramScore /
    // containmentScore convention — review r15): explode emits no
    // rows for a NULL/empty text, and without this the doc silently
    // vanished from the output instead of carrying NULL stats.
    // DISTINCT because the output grain is one row per distinct id
    // (what the plain groupBy always produced) — a bare anchor would
    // emit the merged id-level stats once PER INPUT ROW for
    // duplicate-id inputs (ADVICE r15)
    df.select(col(idCol)).distinct().join(per, Seq(idCol), "left")
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Approximate corpus vocabulary size via HyperLogLog++
    * (approx_count_distinct). At web scale an exact distinct over
    * hundreds of millions of terms shuffles the whole vocabulary; the
    * sketch ships a few KB per task and merges. rsd = target relative
    * standard deviation. Engine-only (sketch internals are not
    * oracle-expressible); accuracy pinned in TextAnalysisSpec. */
  def vocabSizeApprox(df: DataFrame, textCol: String, rsd: Double = 0.05): DataFrame =
    df.select(explode(tokens(col(textCol))).as("term"))
      .agg(approx_count_distinct(col("term"), rsd).as("vocab_approx"))

  /** Token n-grams as space-joined strings. Docs shorter than n
    * tokens yield an empty array — the explicit guard matters because
    * sequence(1, negative) would silently count DOWN. */
  def tokenNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(typedlit(Seq.empty[String]))

  /** Per-document n-gram repetition metrics à la the Gopher paper's
    * repetition filters (token-based rather than character-based —
    * the exact-integer form): top_ngram_frac = occurrences of the
    * single most frequent n-gram / total n-grams; dup_ngram_frac =
    * occurrences of all n-grams seen more than once / total n-grams.
    * Docs shorter than n tokens report 0 grams and 0.0 fractions.
    *
    * Shape for scale: the metrics are PER-DOCUMENT, and every gram's
    * group lives inside the row that owns it — so there is nothing
    * to shuffle. Sort the gram array once (equal grams become
    * adjacent) and one left fold counts run lengths: O(L log L) per
    * doc, zero exchanges, embarrassingly parallel. The tempting
    * explode → groupBy(doc, gram) → rollup → join-back alternative
    * computes the same numbers but shuffles every n-gram in the
    * corpus through two aggregates and a join — ~20% slower already
    * at sf0.1's small docs, and the gap is what grows with corpus
    * size: this form ships one row per document, that one ships one
    * row per n-gram. Ratios are divisions of exact integer counts:
    * bit-exact cross-engine. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame = {
    // fold state: (prev gram, current run, best run, Σ runs of len>1)
    val folded = aggregate(
      col("__grams"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("top"), lit(0L).as("dup")),
      (s, g) => {
        val same = g === s.getField("prev")
        val closedDup = when(!same && s.getField("run") > 1, s.getField("run"))
          .otherwise(lit(0L))
        val run = when(same, s.getField("run") + 1).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(s.getField("top"), run).as("top"),
          (s.getField("dup") + closedDup).as("dup"))
      },
      s => struct(
        s.getField("top").as("top"),
        (s.getField("dup") +
          when(s.getField("run") > 1, s.getField("run")).otherwise(lit(0L))).as("dup")))
    df.select(col(idCol), array_sort(tokenNgrams(tokens(col(textCol)), n)).as("__grams"))
      .select(col(idCol), size(col("__grams")).cast("long").as("n_grams"), folded.as("__f"))
      .select(col(idCol), col("n_grams"),
        when(col("n_grams") > 0,
          col("__f.top").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("top_ngram_frac"),
        when(col("n_grams") > 0,
          col("__f.dup").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("dup_ngram_frac"))
  }

  /** Longest run of identical consecutive tokens per document — the
    * degenerate-repetition detector ("a a a a ..." spam that n-gram
    * fractions under-report). One rowwise left fold carrying
    * (prev token, current run, best run) — no shuffle at all, and
    * the state is three scalars regardless of document length. */
  def maxTokenRun(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      aggregate(
        tokens(col(textCol)),
        // sentinel prev can safely collide with a real token: run
        // starts at 0, so match-vs-miss both yield run = 1 (same
        // convention as repetitionStats' fold)
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (s, t) => {
          val run = when(t === s.getField("prev"), s.getField("run") + 1).otherwise(lit(1L))
          struct(t.as("prev"), run.as("run"),
            greatest(s.getField("best"), run).as("best"))
        },
        s => s.getField("best")).as("max_run"))

  /** PII patterns for scrubbing. Deliberately RE2-compatible (no
    * backreferences or lookaround) so the same pattern string runs
    * identically on Java regex, RE2-based engines, and the DuckDB
    * oracle. Order matters: URLs are scrubbed BEFORE emails so a
    * credential-bearing URL (http://user@host) isn't half-eaten by
    * the email pass first. */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitPattern = "[0-9][0-9 ()+.-]{6,}[0-9]"

  /** PII redaction for training corpora: URLs, email addresses, and
    * phone-number-shaped digit runs are replaced by typed placeholder
    * tags, and per-document match counts are reported (the audit
    * column a curation pipeline filters/monitors on). Each count is
    * taken on the text AS THE PASS SEES IT (post earlier passes), so
    * counts equal placeholders inserted — an email inside an already-
    * scrubbed URL is one <URL>, not also an email. Pure rowwise
    * regexp_replace/regexp_count — codegen'd, no shuffle, no UDF;
    * scrubbing 100 TB is exactly one map-only pass.
    * Output: (idCol, clean text, n_urls, n_emails, n_phones). */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val noUrl = regexp_replace(t, UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    df.select(
      col(idCol),
      regexp_replace(noEmail, LongDigitPattern, "<NUM>").as("clean_text"),
      regexp_count(t, lit(UrlPattern)).cast("long").as("n_urls"),
      regexp_count(noUrl, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(noEmail, lit(LongDigitPattern)).cast("long").as("n_phones"))
  }

  /** (doc, term) TF + corpus DF counts — the exact-integer core of
    * TF-IDF; idf = ln(N/df) is applied by tfIdf (not oracle-hashed:
    * libm ln may differ in the last ulp across engines). */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term").select(col(idCol), col("term"), col("tf"), col("df"))
  }

  /** TF-IDF: tf · ln(N / df). */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count().toDouble
    termFrequencies(df, idCol, textCol)
      .withColumn("tfidf", col("tf") * log(lit(n) / col("df")))
  }

  /** BM25 relevance of every document against a FIXED term list (the
    * retrieval scorer run corpus-wide — "rank all documents for this
    * probe query", the data-selection form of BM25, e.g. importance
    * ranking against a target-domain query). Okapi formula with the
    * idf in RATIONAL form, idf = (N - df + ½)/(df + ½) — the log-free
    * variant — because ln is the one libm call whose last ulp differs
    * across engines (see termFrequencies); rankings agree since ln is
    * monotone. logIdf=true applies the Lucene-style ln(1 + ·) on top
    * (the +1 keeps idf positive where raw Robertson idf goes negative
    * for df > N/2) — same per-term ranking, not oracle-hashed.
    *
    * Scale shape: the term list is a PLAN LITERAL, so tf per term is
    * a rowwise array scan (no explode, no join — the corpus is never
    * shuffled); df per term and avgdl are ONE k-term-bounded
    * aggregation crossJoined back as a broadcast single row. Total
    * cost: two corpus scans, zero shuffles of corpus rows. The
    * per-term fold runs in the given term order (pass a canonical
    * order; the oracle mirrors it term by term).
    * Output: (idCol, dl, bm25). */
  def bm25Score(df: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                logIdf: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "bm25Score needs at least one query term")
    require(terms.distinct.length == terms.length, "duplicate query terms")
    val (scored, termScore) = bm25Scored(df, idCol, textCol, terms, k1, b, logIdf)
    scored.select(col(idCol), col("dl"),
      terms.indices.map(termScore).reduceLeft(_ + _).as("bm25"))
  }

  /** Shared BM25 plumbing: the corpus with rowwise per-term tf
    * columns + the broadcast (N, avgdl, df_i) stats row, and the
    * per-term Okapi score builder. Two corpus scans, zero corpus
    * shuffles — see bm25Score's docstring. */
  private def bm25Scored(df: DataFrame, idCol: String, textCol: String,
                         terms: Seq[String], k1: Double, b: Double,
                         logIdf: Boolean): (DataFrame, Int => Column) = {
    val toks = tokens(col(textCol))
    def tfOf(t: String) = size(filter(toks, x => x === lit(t))).cast("long")
    val withTf = df.select(
      (col(idCol) +: size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tfOf(t).as(s"__tf$i") }): _*)
    val statAggs =
      sum(col("dl")).cast("double").as("__sumdl") +:
        count(lit(1)).cast("long").as("__n") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0L, 1L).otherwise(0L)).cast("long").as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
      .select((col("__n") +: (col("__sumdl") / col("__n")).as("__avgdl") +:
        terms.indices.map(i => col(s"__df$i"))): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val termScore = (i: Int) => {
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i")
      val idfRat = ((col("__n") - dfT).cast("double") + lit(0.5)) /
        (dfT.cast("double") + lit(0.5))
      val idf = if (logIdf) log(lit(1.0) + idfRat) else idfRat
      val tfn = (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("__avgdl"))))
      idf * tfn
    }
    (scored, termScore)
  }

  /** Multi-query BM25 retrieval: the top-k documents for EACH query
    * in a probe set — the "run the eval suite's queries against the
    * corpus" retrieval step, where bm25Score ranks the corpus for one
    * query. Queries ship as plan literals (an eval probe set is
    * k-bounded — the winnowContamination posture), each document's
    * per-query score is a rowwise left-to-right fold over that
    * query's terms (deterministic FP order, oracle-mirrorable), and
    * docs matching NO term (score 0 — every Okapi term contributes
    * nothing at tf=0) are dropped before ranking.
    *
    * Scale shape: everything rowwise until the FINAL per-query top-k,
    * which is the bounded TopKAgg partial agg — each map task ships
    * ≤ k (doc, score) pairs per query, so the only shuffle is
    * O(k · tasks · queries), independent of corpus size. No windows
    * over the corpus, no posting-list join (the fixed probe set makes
    * tf a rowwise scan — an inverted index only pays when queries
    * outnumber corpus scans).
    *
    * Ties break to the lowest doc id (TopKAgg's contract = the
    * oracle's ORDER BY score DESC, id). idCol must be integral (it
    * rides TopKAgg's long id slot — same contract as topKCosine).
    * Output: (query_id, rank 1..k, idCol, score). */
  def searchTopK(df: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(String, Seq[String])], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    graft.functions.TopKAgg.requireLongCastableId(df, idCol, "TextAnalysis.searchTopK")
    require(queries.nonEmpty, "searchTopK needs at least one query")
    require(k >= 1, s"k must be >= 1, got $k")
    queries.foreach { case (qid, ts) =>
      require(ts.nonEmpty, s"query '$qid' has no terms")
      require(ts.distinct.length == ts.length, s"query '$qid' has duplicate terms")
    }
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids")
    val allTerms = queries.flatMap(_._2).distinct
    val idx = allTerms.zipWithIndex.toMap
    val (scored, termScore) = bm25Scored(df, idCol, textCol, allTerms, k1, b,
      logIdf = false)
    val perQuery = queries.map { case (qid, ts) =>
      struct(lit(qid).as("query_id"),
        ts.map(t => termScore(idx(t))).reduceLeft(_ + _).as("score"))
    }
    scored.select(col(idCol), explode(array(perQuery: _*)).as("q"))
      .select(col(idCol), col("q.query_id").as("query_id"), col("q.score").as("score"))
      .filter(col("score") > 0.0)
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.topK(k, col(idCol).cast("long"),
        col("score")).as("__hits"))
      .select(col("query_id"), posexplode(col("__hits")).as(Seq("__pos", "__hit")))
      .select(col("query_id"), (col("__pos") + 1L).cast("long").as("rank"),
        col("__hit._1").as(idCol), col("__hit._2").as("score"))
  }

  /** Per-document mean corpus frequency of its n-grams — the count-
    * based language-model quality proxy (a doc whose n-grams are rare
    * corpus-wide is gibberish or off-distribution; the integer-exact
    * stand-in for a perplexity filter, which needs a trained LM).
    * repetitionStats measures WITHIN-doc repetition; this measures
    * corpus-typicality.
    *
    * Scale shape: explode → n-gram count table (partial-agg, vocab-
    * sized) → ONE hash join back on the n-gram string → per-doc
    * integer sums. The count table is aggregated BEFORE the join, so
    * the join's build side is vocabulary-sized, not corpus-sized.
    * All sums are exact BIGINT; the one double is sum/count.
    * Output: (idCol, n_grams, sum_freq, avg_freq — NULL for docs too
    * short for any n-gram). */
  def corpusNgramScore(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // pinned: the gram stream feeds BOTH the corpus count table and
    // the per-doc join probe — unpinned, the tokenize + n-gram
    // expansion (an interpreted HOF chain) runs twice over the corpus
    // (r18; the collocations `toks` pin, one level later)
    val grams = Dedup.pin(df.select(col(idCol),
      explode(tokenNgrams(tokens(col(textCol)), n)).as("gram")))
    val counts = grams.groupBy("gram").agg(count(lit(1)).cast("long").as("__cnt"))
    val perDoc = grams.join(counts, Seq("gram"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).cast("long").as("n_grams"),
        sum(col("__cnt")).cast("long").as("sum_freq"))
    // distinct anchor: one output row per distinct id even for
    // duplicate-id inputs (ADVICE r15 — see oovRate)
    df.select(col(idCol)).distinct().join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
        (col("sum_freq").cast("double") / col("n_grams")).as("avg_freq"))
  }

  /** Collocation extraction by pointwise-mutual-information LIFT:
    * lift(w1 w2) = c(w1 w2)·N / (c(w1)·c(w2)) with N the corpus
    * bigram total — textbook PMI is log2(lift), omitted for the same
    * libm reason as tfIdf (log is monotone; the RANKING is the
    * contract). High-lift pairs are multiword expressions ("new
    * york") — the phrase-mining pass that feeds tokenizer merge rules
    * and phrase-aware dedup. minCount guards the classic PMI
    * pathology (two hapaxes adjacent once score N/1).
    *
    * Scale shape: ONE tokenized projection is pinned and exploded
    * twice (unigrams, bigrams) — after that every relation is
    * vocabulary-sized, not corpus-sized: the count tables join each
    * other, and the final global top-K is a TakeOrdered over the
    * aggregated score table (bounded partials per partition, never a
    * full sort). The lift arithmetic is two exact-integer-valued
    * double products and one division — bit-stable cross-engine
    * (counts < 2^53).
    * Output: (w1, w2, c_ab, lift, rank 1..topK) by lift desc, ties
    * (w1, w2) asc. */
  def collocations(df: DataFrame, textCol: String, minCount: Int = 5,
                   topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = Dedup.pin(df.select(tokens(col(textCol)).as("__t")))
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("__c"))
    val bcAll = Dedup.pin(
      toks.select(explode(tokenNgrams(col("__t"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).cast("long").as("c_ab")))
    val nb = bcAll.agg(sum(col("c_ab")).cast("long").as("__n"))
    val bc = bcAll.filter(col("c_ab") >= minCount)
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"), col("c_ab"))
    val scored = bc
      .join(uni.select(col("w").as("w1"), col("__c").as("__c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("__c").as("__c2")), Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_ab"),
        ((col("c_ab").cast("double") * col("__n").cast("double"))
          / (col("__c1").cast("double") * col("__c2").cast("double"))).as("lift"))
    // TakeOrdered bounds the sort; the ≤ topK survivors then rank in
    // a single trivial partition
    scored.orderBy(col("lift").desc, col("w1"), col("w2")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lift").desc, col("w1"), col("w2"))).cast("long"))
  }

  /** Per-group distinctive terms — the "what characterizes this
    * source" report (c-TF-IDF in BERTopic's sense, kept in rational
    * lift form for cross-engine bit-stability):
    *   lift(w, g) = (tf_wg · (T − T_g)) / ((tf_w − tf_wg + 1) · T_g)
    * i.e. the term's in-group rate over its rest-of-corpus rate, +1
    * in the rest-count so terms exclusive to the group score finite
    * (Laplace smoothing). All four factors are exact integer counts;
    * the two products stay < 2^53 far past trillion-token corpora, so
    * the double division is correctly rounded on any engine.
    *
    * Scale shape: ONE corpus-sized shuffle builds the (group, term)
    * count table; everything after is vocabulary-sized — the term
    * totals join on term, the ~|groups| group totals broadcast, and
    * the per-group top-K is a window PARTITIONED by group (bounded
    * partitions; never a global single-partition sort).
    * Output: (groupCol, term, tf_g, lift, rank 1..topK) by lift desc,
    * term asc per group — the group column keeps its input name
    * (naming it "group" would hand a reserved keyword to downstream
    * SQL). */
  /** Inverted index head: for every term, its document frequency and
    * the first `maxPostings` posting doc_ids in ascending order — the
    * retrieval-index build step (BM25 here queries without a
    * materialized index; real serving wants the posting lists on
    * disk).
    *
    * Scale shape — the point of this operator: posting heads come
    * from the BOUNDED TopKAgg partial aggregate (score = −id, so
    * "top" = lowest ids), NEVER array_sort(collect_list(...)): a
    * stopword's full posting list is corpus-sized, and collect_list
    * would materialize it per hot term in one task. TopKAgg ships at
    * most maxPostings pairs per term per map task — the hot-term
    * shuffle is O(maxPostings · tasks), independent of df. df itself
    * is the exact full count, aggregated alongside.
    * Output: (term, df, postings array<long> ascending). */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 100): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be positive, got $maxPostings")
    graft.functions.TopKAgg.requireLongCastableId(df, idCol, "TextAnalysis.invertedIndex")
    val t = df.select(col(idCol).cast("long").as("__id"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    t.groupBy("term").agg(
        count(lit(1)).cast("long").as("df"),
        graft.functions.TopKAgg.topK(maxPostings, col("__id"),
          negate(col("__id").cast("double"))).as("__top"))
      .select(col("term"), col("df"),
        transform(col("__top"), p => p.getField("_1")).as("postings"))
  }

  /** Pairwise source similarity: cosine over each source's exact
    * term-frequency vector — the corpus-mixture diagnostic ("are my
    * two web crawls really different distributions, or the same feed
    * twice?") that corpusDrift answers for two SNAPSHOTS and this
    * answers for every source pair at once.
    *
    * Exactness: dot products and squared norms are sums of exact long
    * products (integer addition is order-free), so the only FP is
    * dot/(√n1·√n2) — two correctly-rounded sqrts and one division in
    * pinned order; every row hash-matches the SQL replay. Overflow
    * honest bound: Σ tf² per source < 2^63 holds past 10^9
    * occurrences of a single term per source.
    *
    * Scale shape: ONE corpus-sized shuffle builds the (source, term)
    * count table (pinned — it feeds three consumers); the self-join
    * on term costs Σ_term df(term)² ≤ vocab·|sources|² — vocab-sized,
    * NEVER corpus² (df per term is bounded by the source count, the
    * reason this join can't explode the way a doc-grain self-join
    * would). Norms are a |sources|-sized broadcast.
    * Output: (source1 < source2, dot, cosine). */
  def sourceSimilarity(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val tf = Dedup.pin(
      df.select(col(keyCol).as("k"), explode(tokens(col(textCol))).as("term"))
        .groupBy("k", "term").agg(count(lit(1)).cast("long").as("tf")))
    val norms = tf.groupBy("k").agg(sum(col("tf") * col("tf")).cast("long").as("n2"))
    val dots = tf.select(col("k").as("k1"), col("term"), col("tf").as("tf1"))
      .join(tf.select(col("k").as("k2"), col("term"), col("tf").as("tf2")), Seq("term"))
      .filter(col("k1") < col("k2"))
      .groupBy("k1", "k2").agg(sum(col("tf1") * col("tf2")).cast("long").as("dot"))
    dots
      .join(broadcast(norms.select(col("k").as("k1"), col("n2").as("__n1"))), Seq("k1"))
      .join(broadcast(norms.select(col("k").as("k2"), col("n2").as("__n2"))), Seq("k2"))
      .select(col("k1").as("source1"), col("k2").as("source2"), col("dot"),
        (col("dot").cast("double")
          / (sqrt(col("__n1").cast("double")) * sqrt(col("__n2").cast("double"))))
          .as("cosine"))
  }

  def distinctiveTerms(df: DataFrame, groupCol: String, textCol: String,
                       topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.select(col(groupCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tfg = Dedup.pin(toks.groupBy(groupCol, "term")
      .agg(count(lit(1)).cast("long").as("tf_g")))
    val tf = tfg.groupBy("term").agg(sum(col("tf_g")).cast("long").as("__tf"))
    val tg = tfg.groupBy(groupCol).agg(sum(col("tf_g")).cast("long").as("__tg"))
    val t = tg.agg(sum(col("__tg")).cast("long").as("__t"))
    val lift = (col("tf_g").cast("double") * (col("__t") - col("__tg")).cast("double")) /
      ((col("__tf") - col("tf_g") + 1).cast("double") * col("__tg").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("lift").desc, col("term"))
    tfg.join(tf, "term")
      .join(broadcast(tg), groupCol)
      .crossJoin(broadcast(t))
      .select(col(groupCol), col("term"), col("tf_g"), lift.as("lift"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Flesch reading-ease profile: exact word / sentence-mark /
    * syllable-proxy counts plus the classic 206.835 − 1.015·(W/S) −
    * 84.6·(Sy/W) score — the readability gate of web-corpus quality
    * filters. "Syllables" are vowel-group runs ([aeiouy]+, the
    * standard cheap proxy); sentence count is floored at 1 (a
    * fragment with no terminal punctuation is one utterance, and the
    * floor keeps the score total), with the RAW mark count emitted
    * beside it so the floor is auditable. The score is a fixed
    * left-to-right expression over exact integers — three FP ops in
    * deterministic order, bit-stable cross-engine; NULL for
    * zero-word docs.
    *
    * Scale shape: pure rowwise regexp counting in whole-stage
    * codegen — zero shuffles, zero joins.
    * Output: (idCol, n_words, n_sentence_marks, n_syllables,
    * n_sentences, flesch). */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = size(filter(tokens(col(textCol)), t => length(t) > 0)).cast("long")
    df.select(col(idCol),
        words.as("n_words"),
        regexp_count(col(textCol), lit("[.!?]+")).cast("long").as("n_sentence_marks"),
        regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long").as("n_syllables"))
      .withColumn("n_sentences", greatest(col("n_sentence_marks"), lit(1L)))
      .withColumn("flesch", when(col("n_words") > 0L,
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words").cast("double"))))
  }

  /** Per-document lexical CONCENTRATION — the Simpson-index family
    * that docStats' type-token ratio can't see: TTR treats "a doc
    * where one word is half the tokens" and "a doc with a flat
    * distribution" the same whenever type counts agree, while
    * Σ c_w² (the repeat-collision count) separates them. Reported as
    * exact integers plus two single-division rationals:
    *   simpson    = 1 − Σc²/n²   (probability two random tokens differ)
    *   eff_types  = n²/Σc²       (inverse Simpson — the "effective
    *                              vocabulary size" under repetition)
    * Both numerators/denominators are exact longs (n < 2^26 tokens
    * per doc keeps n² < 2^52), so each output is ONE correctly-
    * rounded IEEE division — bit-stable cross-engine.
    *
    * Scale shape: ZERO shuffle — the per-term counts come from a
    * rowwise sorted run-length fold (array_sort + aggregate HOF, the
    * repetitionStats posture), never an explode/groupBy; a 100 TB
    * corpus scans once with no exchange. Empty tokens (double
    * spaces) are excluded; a doc with no real tokens reports 0s and
    * NULL ratios.
    * Output: (idCol, n_tokens, n_types, sum_sq, simpson, eff_types). */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fold state over the SORTED token array: (prev token, current
    // run length, closed-run Σrun², closed-run type count)
    val folded = aggregate(
      col("__toks"),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("ssq"), lit(0L).as("types")),
      (s, t) => {
        val same = t === s.getField("prev")
        val closedSq = when(!same, s.getField("run") * s.getField("run"))
          .otherwise(lit(0L))
        val closedTy = when(!same && s.getField("run") > 0, lit(1L)).otherwise(lit(0L))
        struct(t.as("prev"),
          when(same, s.getField("run") + 1).otherwise(lit(1L)).as("run"),
          (s.getField("ssq") + closedSq).as("ssq"),
          (s.getField("types") + closedTy).as("types"))
      },
      s => struct(
        (s.getField("ssq") + s.getField("run") * s.getField("run")).as("ssq"),
        (s.getField("types") + when(s.getField("run") > 0, 1L).otherwise(0L))
          .as("types")))
    df.select(col(idCol),
        array_sort(filter(tokens(col(textCol)), t => length(t) > 0)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"), folded.as("__f"))
      .select(col(idCol), col("n_tokens"),
        col("__f.types").cast("long").as("n_types"),
        col("__f.ssq").cast("long").as("sum_sq"),
        when(col("n_tokens") > 0,
          (col("n_tokens") * col("n_tokens") - col("__f.ssq")).cast("double")
            / (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"),
        when(col("n_tokens") > 0,
          (col("n_tokens") * col("n_tokens")).cast("double")
            / col("__f.ssq").cast("double")).as("eff_types"))
  }

  /** Corpus stopword report — every term ranked by DOCUMENT
    * frequency (buildVocab ranks by occurrence count; df is the
    * signal stopword induction actually uses: "the" is in ~every
    * doc, a topical term is frequent in few). Emits the top-K with
    * both frequencies and the df fraction so a pipeline can cut at
    * "df_frac ≥ 0.4" instead of a hand list.
    *
    * Scale shape: ONE corpus scan, no document id needed — each row
    * explodes a concat of tagged structs: every token contributes
    * (term, c=1, d=0) and every per-doc DISTINCT term (rowwise
    * array_distinct, no shuffle) contributes (term, c=0, d=1); a
    * single vocab-sized partial agg sums both tags, so df and cnt
    * come out of one Exchange with no count_distinct double shuffle.
    * (A doc-id + explode in one select would be WRONG:
    * monotonically_increasing_id lands in the post-Generate Project
    * and numbers exploded rows, not documents.) The corpus-sized doc
    * total rides a 1-row broadcast crossJoin. The final ranking is
    * TakeOrdered(topK) (distributed O(n log k)); only the ≤ topK
    * survivors meet the trivial rank window.
    * Output: (term, df, cnt, df_frac, rank 1..topK) by df desc,
    * cnt desc, term asc. */
  def stopwordReport(df: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val tagged = concat(
      transform(toks, t => struct(t.as("term"), lit(1L).as("c"), lit(0L).as("d"))),
      transform(array_distinct(toks),
        t => struct(t.as("term"), lit(0L).as("c"), lit(1L).as("d"))))
    val byTerm = df.select(explode(tagged).as("e"))
      .groupBy(col("e.term").as("term")).agg(
        sum(col("e.d")).cast("long").as("df"),
        sum(col("e.c")).cast("long").as("cnt"))
    val nDocs = df.agg(count(lit(1)).cast("long").as("__n"))
    byTerm.crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"), col("cnt"),
        (col("df").cast("double") / col("__n").cast("double")).as("df_frac"))
      .orderBy(col("df").desc, col("cnt").desc, col("term")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("cnt").desc, col("term"))).cast("long"))
  }

  /** Zipf rank-frequency profile of the corpus head: the top-N terms
    * with their occurrence count, the count as a fraction of the #1
    * term (Zipf's law predicts ≈ 1/rank), and the cumulative share
    * of ALL corpus tokens — the "how much of the corpus is its top
    * 100 words" curve that drives vocabulary-size and stopword-cut
    * decisions. All ratios are single divisions of exact long counts
    * (the cumulative sum is integer before its one division).
    *
    * Scale shape: one explode → vocab-sized term count (partial
    * agg); the head is TakeOrdered(topN), so the rank / running-sum
    * windows see only ≤ topN rows (trivial single partition by
    * construction); the corpus token total rides a 1-row broadcast.
    * Output: (rank 1..topN, term, cnt, frac_top, cum_frac) by cnt
    * desc, term asc. */
  def zipfProfile(df: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = df.select(explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).cast("long").as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("__t"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    counts.orderBy(col("cnt").desc, col("term")).limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("__top", max(col("cnt")).over(ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("__cum", sum(col("cnt")).over(ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)).cast("long"))
      .select(col("rank"), col("term"), col("cnt"),
        (col("cnt").cast("double") / col("__top").cast("double")).as("frac_top"),
        (col("__cum").cast("double") / col("__t").cast("double")).as("cum_frac"))
  }

  /** Corpus-frequency line removal — the C4-style boilerplate pass
    * ("drop any line that occurs in ≥ N documents": nav menus, cookie
    * banners, footers survive template extraction verbatim, so their
    * line-level document frequency is huge while real prose lines are
    * near-unique). Drops every line whose distinct-document count
    * reaches minDocs and reassembles each document's surviving lines
    * in original order.
    *
    * Scale shape: line explode → distinct-doc count per line (partial
    * agg; the frequent-line table is tiny by construction — only
    * lines repeated across ≥ minDocs docs survive the HAVING) → one
    * anti-join — the corpus shuffles once on the line hash. The
    * reassembly groups each doc's OWN lines (bounded by doc size,
    * the chunkByTokens posture). A doc whose every line is
    * boilerplate comes back as ''.
    * Output: (idCol, clean_text, n_lines, n_dropped). */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                           minDocs: Int, sep: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (1 would drop every line), got $minDocs")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val boiler = lines.groupBy("__line")
      .agg(count_distinct(col(idCol)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs)
      .select(col("__line"))
    val rebuilt = lines.join(boiler, Seq("__line"), "left_anti")
      .groupBy(col(idCol)).agg(
        // codegen reassembly (r19): sort_array ≡ array_sort here
        // (non-null structs, unique __pos) and .getField is native —
        // see UnigramTokenizer.encode
        array_join(sort_array(collect_list(struct(col("__pos"), col("__line"))))
          .getField("__line"), sep).as("__clean"),
        count(lit(1)).cast("long").as("__kept"))
    df.select(col(idCol),
        size(split(col(textCol), java.util.regex.Pattern.quote(sep))).cast("long")
          .as("n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__kept"), lit(0L))).as("n_dropped"))
  }

  /** Stopword-profile language scores: per language, the fraction of
    * tokens found in its profile word set; prediction = argmax with
    * lexicographic tie-break (array_min over (-score, lang)). */
  def languageId(df: DataFrame, idCol: String, textCol: String,
                 profiles: Seq[(String, Seq[String])]): DataFrame = {
    val best = langBest(tokens(col(textCol)), profiles)
    df.select(col(idCol),
      best.getField("lang").as("lang_pred"),
      (-best.getField("neg")).as("lang_score"))
  }

  /** Language argmax as a composable Column over a token array:
    * struct(neg = -bestScore, lang) — flip score sign, array_min
    * picks (lowest -score, first lang), i.e. argmax with
    * lexicographic tie-break. Shared by languageId and the fused
    * curationScores. */
  private def langBest(toks: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = array(profiles.map { case (lang, words) =>
      struct(
        (size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*))).cast("double")
          / size(toks).cast("double")).as("score"),
        lit(lang).as("lang"))
    }: _*)
    array_min(transform(scores,
      s => struct((-s.getField("score")).as("neg"), s.getField("lang").as("lang"))))
  }

  /** Fused single-pass curation gate: quality score + language
    * prediction in ONE projection over the corpus. Produces every
    * input column plus (quality, lang_pred, lang_score), bit-equal to
    * qualityScore/languageId run separately (shared Column builders).
    *
    * Why it exists: a filter pipeline built by joining qualityScore
    * and languageId outputs back onto the corpus scans the input
    * three times and shuffles twice for the joins; at 100 TB the
    * repeated scan IS the dominant cost. This form is one scan, zero
    * joins — filter on both columns and project, e.g.
    * `.filter($"quality" >= 0.75 && $"lang_pred" === "en")`. */
  def curationScores(df: DataFrame, textCol: String,
                     profiles: Seq[(String, Seq[String])],
                     stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val best = langBest(toks, profiles)
    df.withColumn("quality", qualityCol(toks, stopwords))
      .withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", -best.getField("neg"))
  }

  /** Char-trigram language scores — the n-gram heuristic variant of
    * languageId for text without clean word boundaries: score = the
    * fraction of the doc's character trigrams found in the language's
    * profile set. Same argmax/tie contract as languageId; counts are
    * exact integers, the ratio one exact division. */
  def languageIdNgram(df: DataFrame, idCol: String, textCol: String,
                      profiles: Seq[(String, Seq[String])]): DataFrame = {
    val t = col(textCol)
    // one-pass trigram build: char-split ONCE (materialized so the 4
    // language scores share it), then 3 O(1) element_ats per gram —
    // the substr(text, i, 3) form re-scans the string per position
    // (O(n²) per doc PER LANGUAGE, ~20× slower end-to-end at sf0.1)
    val chars = df.select(col(idCol), split(t, "").as("__cs"), length(t).as("__n"))
    val grams = chars.select(col(idCol),
      when(col("__n") >= 3,
        transform(sequence(lit(1), col("__n") - 2), i =>
          concat(element_at(col("__cs"), i),
            element_at(col("__cs"), i + 1),
            element_at(col("__cs"), i + 2))))
        .otherwise(array().cast("array<string>")).as("__grams"))
    val g = col("__grams")
    val scores = array(profiles.map { case (lang, gs) =>
      struct(
        // short text (< 3 chars) has no grams: score 0.0, not 0/0
        when(size(g) > 0,
          size(filter(g, x => x.isin(gs.map(_.asInstanceOf[Any]): _*))).cast("double")
            / size(g).cast("double"))
          .otherwise(lit(0.0)).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_min(transform(scores,
      s => struct((-s.getField("score")).as("neg"), s.getField("lang").as("lang"))))
    grams.select(col(idCol),
      best.getField("lang").as("lang_pred"),
      (-best.getField("neg")).as("lang_score"))
  }

  /** Winnowing fingerprints (value-set form): k-gram rolling hashes →
    * per-window-of-w minima → sorted distinct selection. Guarantees of
    * the scheme: any shared substring of length ≥ w + k - 1 between
    * two documents contributes at least one COMMON fingerprint, so
    * local overlap is detectable without comparing full shingle sets.
    * (Classic winnowing keeps the rightmost minimum's POSITION per
    * window; this value-set simplification keeps the minima values —
    * same detection guarantee, position-free, and exactly mirrorable
    * in SQL.) All arithmetic is the 31-base mod 2^31-1 integer hash —
    * exact cross-engine. Output: (id, fps) with fps the sorted
    * distinct minima joined by ','. Rowwise, one pass, O(n·k). */
  def winnow(df: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame =
    winnowMins(df, idCol, textCol, k, w)
      .select(col(idCol),
        array_join(array_sort(array_distinct(col("__mins"))), ",").as("fps"))

  /** k-gram rolling hashes over a char array: element i = hash of the
    * k chars starting at i (1-based), for i in [1, m]. Shared kernel
    * of winnowMins and winnowFingerprints. */
  private def kgramHashes(cs: Column, m: Column, k: Int): Column = {
    val p = lit(2147483647L)
    when(m >= 1,
      transform(sequence(lit(1), m), i =>
        aggregate(slice(cs, i, lit(k)), lit(0L),
          (acc, c) => (acc * 31L + coalesce(ascii(c).cast("long"), lit(0L))) % p)))
      .otherwise(array().cast("array<long>"))
  }

  /** Per-window-of-w minima over a hash array of length m — the
    * winnow selection step. */
  private def windowMinima(hs: Column, m: Column, w: Int): Column =
    when(m < 1, array().cast("array<long>"))
      .when(m <= w, array(array_min(hs)))
      .otherwise(transform(sequence(lit(1), m - (w - 1)), j =>
        array_min(slice(hs, j, lit(w)))))

  /** The raw per-window minima behind winnow (un-deduplicated), as
    * (id, __mins array<long>) — the form winnowNearDup fans out.
    * Runs the native WinnowMins kernel (code points decoded once, all
    * arithmetic in primitive longs); winnowMinsHof below is its
    * bit-identical declarative twin. */
  def winnowMins(df: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    df.select(col(idCol),
      graft.functions.WinnowMins.winnowMins(col(textCol), k, w).as("__mins"))
  }

  /** The composed-HOF twin of the WinnowMins kernel — the form the
    * DuckDB oracle mirrors term by term, and the parity pin for the
    * kernel (PureKernelProps property test + TextAnalysisSpec). The
    * three-projection shape (chars, hashes, minima as separate
    * selects) forces the char split and the k-gram hash array to be
    * computed once each. */
  def winnowMinsHof(df: DataFrame, idCol: String, textCol: String, k: Int, w: Int): DataFrame = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    val chars = df.select(col(idCol), split(col(textCol), "").as("__cs"),
      (length(col(textCol)) - (k - 1)).as("__m"))
    val hashes = chars.select(col(idCol), col("__m"),
      kgramHashes(col("__cs"), col("__m"), k).as("__hs"))
    hashes.select(col(idCol),
      windowMinima(col("__hs"), col("__m"), w).as("__mins"))
  }

  /** Winnow fingerprint set as one composable Column: sorted distinct
    * per-window minima of the k-gram rolling hashes — the SQL-surface
    * form (registered as winnow_fingerprints by GraftExtensions),
    * backed by the native WinnowMins kernel. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
    array_sort(array_distinct(graft.functions.WinnowMins.winnowMins(text, k, w)))
  }

  /** 31-bit polynomial rolling hash of the raw text (base 31, modulus
    * 2^31-1): acc = (acc*31 + code(char)) mod p, folded left-to-right
    * over the characters. Every intermediate ≤ (2^31)·31 + 255 < 2^36
    * — exact in long on both engines. The classic content fingerprint
    * (and the building block of winnowing). */
  def fingerprint(text: Column): Column = {
    val p = lit(2147483647L)
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31L + coalesce(ascii(c).cast("long"), lit(0L))) % p)
  }

  /** Bigram language-model quality scoring — the CCNet-style
    * "perplexity filter" with a COUNT-based LM: train add-k-smoothed
    * bigram statistics on a reference corpus, score every candidate
    * document by how surprising its token sequence is under that
    * model. Low scores = in-distribution text; high scores =
    * gibberish / off-domain / shuffled boilerplate. corpusNgramScore
    * is the integer-only proxy; this is the actual conditional model
    * p(w₂|w₁) = (c(w₁w₂)+k) / (c(w₁·)+k·V).
    *
    * The hashed score is the MEAN INVERSE PROBABILITY Σ 1/p(wᵢ|wᵢ₋₁)
    * / n — the rational form of a perplexity proxy (each 1/p is one
    * IEEE division of integer-valued doubles, bit-identical on every
    * engine; ln's last ulp is NOT — the bm25Score precedent), folded
    * in ascending order on both sides. avg_logprob (the textbook
    * score, same ranking direction) is exposed for users but derived
    * from the same joins; specs cover it, the oracle hashes mean_inv.
    *
    * Scale shape: the trained model is two partial-agg count tables —
    * bigrams (bigram-vocab-sized) and contexts (vocab-sized) — plus
    * one scalar V. Scoring explodes candidate bigrams once, hash-joins
    * the two count tables (build sides are vocabulary-sized, NOT
    * corpus-sized — aggregated before the join), and per-doc
    * aggregates. Documents with <2 tokens score NULL (no bigrams),
    * kept so the gate sees them.
    * Output: (idCol, n_bigrams, mean_inv_p, avg_logprob). */
  def bigramLmScore(train: DataFrame, candidates: DataFrame,
                    idCol: String, textCol: String,
                    addK: Double = 1.0): DataFrame = {
    require(addK > 0.0, s"addK must be positive, got $addK")
    def bigrams(df: DataFrame, keep: Column*) = {
      val toks = tokens(col(textCol))
      df.select(keep :+ toks.as("__t"): _*)
        .select(keep ++ Seq(col("__t"), posexplode(slice(col("__t"), lit(1),
          greatest(size(col("__t")) - 1, lit(0)))).as(Seq("__i", "__w1"))): _*)
        .withColumn("__w2", element_at(col("__t"), col("__i") + 2))
        .drop("__t", "__i")
    }
    // model: bigram counts + context counts + vocab size, all from train
    val tb = bigrams(train)
    val bigramCounts = Dedup.pin(
      tb.groupBy("__w1", "__w2").agg(count(lit(1)).cast("long").as("__cb")))
    val contextCounts = bigramCounts.groupBy("__w1")
      .agg(sum("__cb").as("__cu"))
    val v = train.select(explode(tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w"))).head().getLong(0).toDouble
    val scoredBigrams = bigrams(candidates, col(idCol))
      .join(bigramCounts, Seq("__w1", "__w2"), "left")
      .join(contextCounts, Seq("__w1"), "left")
      .select(col(idCol),
        ((coalesce(col("__cu"), lit(0L)).cast("double") + lit(addK * v)) /
          (coalesce(col("__cb"), lit(0L)).cast("double") + lit(addK))).as("__inv"))
    // distinct anchor: one output row per distinct id even for
    // duplicate-id inputs (ADVICE r15 — see oovRate)
    candidates.select(col(idCol)).distinct().join(
      scoredBigrams.groupBy(col(idCol)).agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        graft.functions.VectorOps.foldSum(
          array_sort(collect_list(col("__inv")))).as("__s"),
        graft.functions.VectorOps.foldSum(
          array_sort(collect_list(-log(col("__inv"))))).as("__lp")),
      Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("__s") / col("n_bigrams")).as("mean_inv_p"),
        (col("__lp") / col("n_bigrams")).as("avg_logprob"))
  }

  /** Per-document keyword extraction: top-k terms by tf·idf with the
    * RATIONAL Robertson idf (N−df+½)/(df+½) — the log-free idf (see
    * bm25Score: ln's last ulp differs across engines; the rational
    * form is bit-exact and induces the same df-ordering). Ties break
    * (score desc, term asc) so the ranking is total and deterministic.
    *
    * Scale shape: termFrequencies is one (doc,term) partial agg + one
    * vocab-sized df agg joined back on term (build side vocab-sized);
    * the top-k window partitions BY DOCUMENT — partitions are bounded
    * by per-doc distinct-term count (≤ doc length), never corpus-
    * sized, so the sort inside each partition is trivially small.
    * N is one count scalar. Output: (idCol, rank, term, score). */
  def keywords(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = df.count().toDouble
    val scored = termFrequencies(df, idCol, textCol)
      .withColumn("score",
        col("tf").cast("double") *
          ((lit(n) - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** Chi-square bigram collocation mining — the SIGNIFICANCE twin of
    * the PMI-lift `collocations` above (lift ranks association
    * strength but has the hapax pathology; chi² weighs strength by
    * evidence mass, promoting frequent-and-associated pairs the way
    * tokenizer-vocab curation wants). Pearson's chi² on each
    * bigram's 2×2 contingency table, with the marginals taken over
    * the BIGRAM population (standard collocation form: n1p = grams
    * starting with w1, np1 = grams ending with w2).
    *
    * chi² is the log-free association statistic ON PURPOSE: PMI and
    * log-likelihood-ratio need ln (libm, last-ulp engine-dependent),
    * while chi² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) is integer
    * counts + a FIXED sequence of IEEE multiply/divide — bit-exact
    * cross-engine. ad−bc is computed in exact long arithmetic
    * (|ad| ≤ N², so the guard requires N < 3·10⁹ — beyond that,
    * shard the corpus or accept double diffs); the chi² value then
    * uses left-assoc double ops replayed identically by the oracle.
    * Degenerate marginals (a row/col covering the whole table) carry
    * no signal and would divide by zero — filtered.
    *
    * Scale shape: one corpus explode → one (w1,w2) hash agg; the two
    * marginal tables aggregate from the PAIR table (vocab-sized, no
    * second corpus pass); the N scalar is a 1-row collect. Ranking is
    * TakeOrdered top-k (chi² desc, w1, w2 — a total order), never a
    * global sort. Output: (w1, w2, n11, n1p, np1, chi2). */
  def chiSquareCollocations(df: DataFrame, textCol: String,
                            minCount: Long = 5L, topK: Int = 50): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // pairs built as structs directly (element_at over the token
    // array) — the join-into-a-gram-string-then-resplit form does the
    // string work twice per bigram for nothing
    val bi = df.select(tokens(col(textCol)).as("__t"))
      .select(explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1),
          i => struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("n11"))
    val nTot = bi.agg(coalesce(sum(col("n11")), lit(0L)).cast("long"))
      .collect()(0).getLong(0)
    require(nTot < 3000000000L,
      s"chi2 long arithmetic bounds the bigram population at 3e9, got $nTot")
    val left = bi.groupBy("w1").agg(sum(col("n11")).cast("long").as("n1p"))
    val right = bi.groupBy("w2").agg(sum(col("n11")).cast("long").as("np1"))
    val a = col("n11")
    val d = lit(nTot) - col("n1p") - col("np1") + col("n11")
    val b = col("n1p") - col("n11")
    val c = col("np1") - col("n11")
    val dif = (a * d - b * c).cast("double")
    val den = col("n1p").cast("double") *
      (lit(nTot) - col("n1p")).cast("double") *
      col("np1").cast("double") *
      (lit(nTot) - col("np1")).cast("double")
    bi.join(left, Seq("w1")).join(right, Seq("w2"))
      .filter(col("n11") >= minCount &&
        col("n1p") < nTot && col("np1") < nTot)
      .select(col("w1"), col("w2"), col("n11"), col("n1p"), col("np1"),
        (lit(nTot.toDouble) * dif * dif / den).as("chi2"))
      .orderBy(col("chi2").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** Vocabulary-budget coverage curve: the fraction of all corpus
    * token OCCURRENCES covered by the top-k most frequent terms, for
    * each k — the audit that sizes a tokenizer vocabulary (the Zipf
    * head covers most of the stream; the curve says where the
    * marginal term stops paying for its embedding row). Exact
    * integers end to end: ranking is (count desc, term asc) — a
    * total order — via the range-exchange globalRank (never a
    * single-partition Window over the vocabulary), and each
    * coverage is one conditional long sum with ONE division at
    * report time.
    *
    * Scale shape: one corpus explode → vocab-sized count agg;
    * globalRank materializes the vocab relation once (its documented
    * small-relation contract); then ONE aggregate computes every k's
    * coverage simultaneously (no per-k pass), unpivoted to a row per
    * k. Output: (k, covered_tokens, total_tokens, coverage). */
  def vocabCoverage(df: DataFrame, textCol: String,
                    ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be positive, got $ks")
    require(ks.distinct == ks, s"ks must be distinct, got $ks")
    val counts = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("__c"))
    val ranked = Curation.globalRank(counts, "__rank", 0,
      col("__c").desc, col("term").asc)
    val row = ranked.agg(
      sum(col("__c")).cast("long").as("__total"),
      ks.map(k => sum(when(col("__rank") <= k, col("__c")).otherwise(0L))
        .cast("long").as(s"__cov$k")): _*)
    val pairs = array(ks.map(k =>
      struct(lit(k.toLong).as("k"), col(s"__cov$k").as("cov"))): _*)
    row.select(explode(pairs).as("__p"), col("__total"))
      .select(col("__p.k").as("k"), col("__p.cov").as("covered_tokens"),
        col("__total").as("total_tokens"),
        (col("__p.cov").cast("double") / col("__total").cast("double"))
          .as("coverage"))
  }

  /** Heaps-law vocabulary growth curve: distinct-type count after the
    * first c documents (by id order) for each checkpoint c — the
    * empirical V(n) ≈ K·n^β curve that sizes a tokenizer vocabulary
    * and detects corpus staleness (a flattening curve means new docs
    * stop contributing types). Exact integers end to end: a term
    * enters the vocabulary at its MINIMUM doc id, so V(c) is one
    * conditional count over the vocab-sized first-seen table — no
    * per-checkpoint corpus pass.
    *
    * Scale shape: one explode → vocab-sized (term, min doc) agg, one
    * doc-count agg, then ONE aggregate computes every checkpoint
    * simultaneously, unpivoted (vocabCoverage's pattern). Output:
    * (checkpoint, n_docs, vocab). */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted &&
      checkpoints.distinct == checkpoints,
      s"checkpoints must be sorted and distinct, got $checkpoints")
    val firstSeen = df
      .select(col(idCol).cast("long").as("__id"),
        explode(array_distinct(tokens(col(textCol)))).as("__t"))
      .groupBy(col("__t")).agg(min(col("__id")).as("__first"))
    val vSums = checkpoints.map(c =>
      sum(when(col("__first") <= c, 1L).otherwise(0L)).cast("long").as(s"__v$c"))
    val row = firstSeen.agg(vSums.head, vSums.tail: _*)
    val dSums = checkpoints.map(c =>
      sum(when(col(idCol) <= c, 1L).otherwise(0L)).cast("long").as(s"__d$c"))
    val docs = df.agg(dSums.head, dSums.tail: _*)
    val pairs = array(checkpoints.map(c =>
      struct(lit(c).as("checkpoint"), col(s"__d$c").as("n_docs"),
        col(s"__v$c").as("vocab"))): _*)
    row.crossJoin(docs).select(explode(pairs).as("__p"))
      .select(col("__p.checkpoint").as("checkpoint"),
        col("__p.n_docs").as("n_docs"), col("__p.vocab").as("vocab"))
  }

  /** Hashing-trick vectorizer (Weinberger et al. 2009's feature
    * hashing): map each token to one of `dim` buckets by hash and
    * accumulate a SIGNED count — the fixed-width sparse features a
    * linear quality classifier trains on without ever materializing
    * a vocabulary (the property that matters at 100 TB: no vocab
    * build, no term→id join, no OOV path — new terms land in
    * existing buckets by construction).
    *
    * Bucket = first 8 md5 hex chars mod dim; sign = parity of the
    * 9th hex char (the unbiased ±1 second hash that makes bucket
    * collisions cancel in expectation — the paper's trick). Both are
    * exact integer arithmetic on the md5 the oracle shares, per the
    * Sampling.unitFromMd5 contract.
    *
    * Scale shape: rowwise explode → ONE hash aggregate on (doc,
    * bucket) — output ≤ min(tokens, dim) rows per doc, map-side
    * partials collapse repeats. Empty-token guard: split(" ") on ""
    * yields [""], a real token here like everywhere else in this
    * file (the md5 of "" is defined on both engines).
    * Output: (id, bucket, weight) — the sparse COO form. */
  /** Keyword-in-context concordance (the corpus-inspection KWIC
    * view): every occurrence of `term` with its `window` tokens of
    * left/right context — what a curation engineer actually reads
    * when deciding whether a filter rule or a near-dup cluster is
    * behaving ("show me how this token is used").
    *
    * Rowwise only: one posexplode over the token array (kept
    * alongside, so context slicing needs no self-join), a codegen
    * filter on the term, and two bounded `slice`s — no shuffle, no
    * window. Positions are 1-based (the oracle's list-comprehension
    * convention). Output: (id, pos, left_ctx, right_ctx). */
  def kwic(df: DataFrame, idCol: String, textCol: String,
           term: String, window: Int = 3): DataFrame = {
    require(window >= 1 && window <= 50, s"window must be in [1, 50], got $window")
    df.select(col(idCol), tokens(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"), posexplode(col("__ts")).as(Seq("__p0", "__t")))
      .filter(col("__t") === term)
      .withColumn("pos", (col("__p0") + 1).cast("long"))
      .select(col(idCol), col("pos"),
        concat_ws(" ", slice(col("__ts"),
          greatest(col("pos") - window, lit(1)),
          col("pos") - greatest(col("pos") - window, lit(1)))).as("left_ctx"),
        concat_ws(" ", slice(col("__ts"), col("pos") + 1, lit(window)))
          .as("right_ctx"))
  }

  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20), s"dim must be in [2, 2^20], got $dim")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .select(col(idCol), md5(col("__t")).as("__h"))
      .select(col(idCol),
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)).as("bucket"),
        (lit(1L) - lit(2L) * pmod(conv(substring(col("__h"), 9, 1), 16, 10)
          .cast("long"), lit(2L))).as("__sign"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sign")).cast("long").as("weight"))
  }
}
