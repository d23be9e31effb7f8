package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer, UnigramTokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Text analysis: stats, quality, language ID, TF-IDF/BM25, vocabulary laws, collocations, BPE, normalization and cleaning.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryText {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── LLM-pipeline: per-document text statistics ──────────────────
    "q_text_stats" -> ((s, dir) => {
      TextAnalysis.docStats(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── LLM-pipeline: quality scoring (C4/Gopher-style ratios) ──────
    "q_quality" -> ((s, dir) => {
      TextAnalysis.qualityScore(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── LLM-pipeline: Gopher-style n-gram repetition metrics ────────
    "q_rep_ngrams" -> ((s, dir) => {
      TextAnalysis.repetitionStats(Tables(s, dir, "documents"), "doc_id", "text", n = 2)
    }),


    // ── LLM-pipeline: longest identical-token run per doc ───────────
    "q_rep_runs" -> ((s, dir) => {
      TextAnalysis.maxTokenRun(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── LLM-pipeline: PII scrubbing (URLs, emails, phone runs) ──────
    // The synthetic corpus carries no PII, so the query plants one of
    // each per doc (derived from doc_id, identically in the oracle)
    // and checks both the redacted text and the audit counts.
    "q_scrub" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.com/d/"), col("doc_id"),
          lit(" tel 555-0100-"), col("doc_id")).as("text"))
      TextAnalysis.scrubPii(aug, "doc_id", "text")
    }),


    // ── LLM-pipeline: markup stripping (C4-style extract pass) ──────
    // The corpus is plain text, so the query wraps each doc in tags +
    // entities (identically in the oracle) and checks the extraction.
    "q_strip_markup" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("<html><body class=\"d\"><p>"), substring(col("text"), 1, 60),
          lit("</p><br/>&amp;co &lt;tag&gt; "),
          substring(col("text"), 61, 1000000), lit("</body></html>")).as("text"))
      TextAnalysis.stripMarkup(aug, "doc_id", "text")
    }),


    // ── LLM-pipeline: token-budget truncation ───────────────────────
    "q_truncate" -> ((s, dir) => {
      TextAnalysis.truncateTokens(Tables(s, dir, "documents"), "doc_id", "text",
        maxTokens = 30)
    }),


    // ── LLM-pipeline: sentence segmentation ─────────────────────────
    // The synthetic corpus carries no punctuation, so the query
    // plants two sentence boundaries per doc (identically in the
    // oracle) and checks ids, order, retained punctuation, counts.
    "q_sentences" -> ((s, dir) => {
      val aug = Tables(s, dir, "documents").select(col("doc_id"),
        concat(substring(col("text"), 1, 50), lit(". "),
          substring(col("text"), 51, 50), lit("! "),
          substring(col("text"), 101, 1000000)).as("text"))
      TextAnalysis.splitSentences(aug, "doc_id", "text")
    }),


    // ── LLM-pipeline: corpus top-20 terms by frequency ──────────────
    "q_top_terms" -> ((s, dir) => {
      TextAnalysis.topTerms(Tables(s, dir, "documents"), "text", 20)
    }),


    // ── LLM-pipeline: full-vocabulary build (term → contiguous id) ──
    // Ranks EVERY distinct term by (count desc, term asc) through the
    // range-partition + offset globalRank — no single-partition sort.
    "q_vocab" -> ((s, dir) => {
      TextAnalysis.buildVocab(Tables(s, dir, "documents"), "text")
    }),


    // ── LLM-pipeline: Count-Min sketch heavy-hitter estimates ───────
    // The bounded-memory frequency primitive beside the KMV distinct
    // sketch: a depth×width counter table (md5 buckets — public,
    // deterministic, engine-replayable) built in ONE partial-agg
    // pass, then point estimates for the exact top-20 terms. Emits
    // (term, exact_n, cms_n) so the gate checks BOTH the estimates'
    // exact values and (by construction, cms_n ≥ exact_n — the CMS
    // upper-bound guarantee) the sketch's contract against ground
    // truth. Table size is depth×width regardless of corpus size or
    // cardinality; merging shards is elementwise addition.
    "q_cms_topk" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      val cms = Curation.cmsTable(toks, "token", depth = 4, width = 512)
      val top = TextAnalysis.topTerms(docs, "text", 20)
        .select(col("term"), col("cnt").as("exact_n"))
      Curation.cmsEstimate(cms, top, "term", depth = 4, width = 512)
        .join(top, Seq("term"))
        .select(col("term"), col("exact_n"), col("cms_n"))
    }),


    // ── LLM-pipeline: sliding-window chunking by token budget ───────
    // 32-token chunks, 8-token overlap (stride 24); docs ≤ 32 tokens
    // stay one chunk. Rowwise generator, no shuffle.
    "q_chunks" -> ((s, dir) => {
      TextAnalysis.chunkByTokens(Tables(s, dir, "documents"), "doc_id", "text",
        maxTokens = 32, overlap = 8)
    }),


    // ── LLM-pipeline: text normalization (ctrl chars, space runs) ───
    // The synthetic corpus is already clean ASCII, so the query dirties
    // each doc first (derived from doc_id, identically in the oracle):
    // a tab, double spaces, stray case, padding — then normalizes.
    "q_normalize" -> ((s, dir) => {
      val dirty = Tables(s, dir, "documents").select(col("doc_id"),
        concat(lit("  Start\t"), col("text"),
          lit(" MID  dash "), col("doc_id"), lit("  ")).as("text"))
      TextAnalysis.normalizeText(dirty, "doc_id", "text")
    }),


    // ── LLM-pipeline: OOV rate vs the corpus top-10 vocabulary ──────
    // Vocabulary broadcast; corpus exploded and joined map-side, then
    // partial-aggregated back to one row per document.
    "q_oov" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val top10 = TextAnalysis.buildVocab(docs, "text").filter(col("vocab_id") <= 10)
      TextAnalysis.oovRate(docs, "doc_id", "text", top10)
    }),


    // ── LLM-pipeline: (doc, term) TF + corpus DF (TF-IDF core) ──────
    "q_term_freq" -> ((s, dir) => {
      TextAnalysis.termFrequencies(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── LLM-pipeline: stopword-profile language ID ──────────────────
    "q_lang_id" -> ((s, dir) => {
      TextAnalysis.languageId(Tables(s, dir, "documents"), "doc_id", "text", LangProfiles)
    }),


    // ── LLM-pipeline: char-trigram language ID (n-gram heuristic) ───
    "q_lang_ngram" -> ((s, dir) => {
      TextAnalysis.languageIdNgram(Tables(s, dir, "documents"), "doc_id", "text",
        NgramProfiles)
    }),


    // ── text: chi-square bigram collocations (MWE mining) ───────────
    // The significance twin of q_collocations' PMI lift: log-free
    // statistic — integer contingency + a fixed IEEE op sequence
    // (PMI-log/LLR's ln would break cross-engine parity).
    "q_chi2_collocations" -> ((s, dir) => {
      TextAnalysis.chiSquareCollocations(Tables(s, dir, "documents"), "text",
        minCount = 5L, topK = 50)
    }),


    // ── text: vocabulary-budget coverage curve (coverage@k) ─────────
    // Exact-integer Zipf-head audit: rank via the range-exchange
    // globalRank, one conditional agg for every k at once.
    "q_vocab_coverage" -> ((s, dir) => {
      TextAnalysis.vocabCoverage(Tables(s, dir, "documents"), "text",
        ks = Seq(100, 1000, 10000))
    }),


    // ── curation: snapshot token-distribution drift (exact TVD) ─────
    // v1 = doc_id%2==0 slice, v2 = the rest — the refresh-monitoring
    // number in exact integer arithmetic (one division at the end).
    "q_corpus_drift" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.corpusDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "text")
    }),


    // ── curation: the drift's top movers (exact integer ranking) ────
    "q_drift_terms" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Curation.corpusDriftTerms(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "text", k = 20)
    }),


    // ── retrieval: BM25 of every doc vs a fixed probe query ─────────
    // Rational idf (log-free) in the gate; see bm25Score's docstring.
    "q_bm25" -> ((s, dir) => {
      TextAnalysis.bm25Score(Tables(s, dir, "documents"), "doc_id", "text",
        terms = Seq("table", "spark", "value"))
    }),


    // ── retrieval: multi-query BM25 top-k search ────────────────────
    // Three probe queries ranked corpus-wide in one pass; per-query
    // top-10 via the bounded TopKAgg partial agg.
    "q_search_topk" -> ((s, dir) => {
      TextAnalysis.searchTopK(Tables(s, dir, "documents"), "doc_id", "text",
        queries = Seq(
          "q_joins" -> Seq("join", "hash", "merge"),
          "q_scans" -> Seq("scan", "filter"),
          "q_streams" -> Seq("stream", "window", "batch")),
        k = 10)
    }),


    // ── LLM-pipeline: corpus-typicality n-gram score ────────────────
    "q_ngram_quality" -> ((s, dir) => {
      TextAnalysis.corpusNgramScore(Tables(s, dir, "documents"), "doc_id", "text", n = 2)
    }),


    // ── LLM-pipeline: C4-style boilerplate line removal ─────────────
    // The corpus text is single-line, so the query PLANTS multi-line
    // structure (a universal footer + a 1-in-3 promo line), mirrored
    // in the oracle — deterministic positives, not a vacuous pass.
    "q_boilerplate" -> ((s, dir) => {
      val planted = Tables(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), lit("footer: terms apply"),
          when(col("doc_id") % 3 === 0, lit("promo: subscribe now"))).as("text"))
      TextAnalysis.dropBoilerplateLines(planted, "doc_id", "text", minDocs = 50)
    }),


    // ── text: inverted-index head (bounded posting lists) ───────────
    // TopKAgg (score = −id) ships ≤ maxPostings pairs per term per
    // task — hot stopword terms never materialize corpus-sized lists.
    // Postings render as a comma string (the q_pq_encode convention):
    // the driver's pandas comparator cannot hash array cells
    // (CORRECTNESS_r10 q_inverted err).
    "q_inverted" -> ((s, dir) => {
      TextAnalysis.invertedIndex(Tables(s, dir, "documents"), "doc_id", "text",
          maxPostings = 100)
        .select(col("term"), col("df"),
          array_join(transform(col("postings"), p => p.cast("string")), ",")
            .as("postings"))
    }),


    // ── text: pairwise source-similarity cosine (corpus mixture) ────
    // Exact long dot/norms over (source, term) counts; vocab-sized
    // self-join bounded by df(term) ≤ |sources|.
    "q_source_sim" -> ((s, dir) => {
      TextAnalysis.sourceSimilarity(Tables(s, dir, "documents"), "source", "text")
    }),


    // ── text: PMI-lift collocations (phrase mining) ─────────────────
    "q_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(Tables(s, dir, "documents"), "text",
        minCount = 5, topK = 100)
    }),


    // ── text: per-source distinctive terms (c-TF-IDF lift form) ─────
    "q_distinct_terms" -> ((s, dir) => {
      TextAnalysis.distinctiveTerms(Tables(s, dir, "documents"), "source", "text",
        topK = 10)
    }),


    // ── text: Flesch readability profile ────────────────────────────
    // Punctuation-free corpus → the sentence floor engages on every
    // row (audited via the raw mark count); words/syllables vary, so
    // the score is non-degenerate.
    "q_readability" -> ((s, dir) => {
      TextAnalysis.readability(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── text: per-doc lexical concentration (Simpson family) ────────
    "q_diversity" -> ((s, dir) => {
      TextAnalysis.lexicalDiversity(Tables(s, dir, "documents"), "doc_id", "text")
    }),


    // ── text: document-frequency stopword report ────────────────────
    "q_stopwords" -> ((s, dir) => {
      TextAnalysis.stopwordReport(Tables(s, dir, "documents"), "text", topK = 50)
    }),


    // ── text: Zipf rank-frequency head profile ──────────────────────
    "q_zipf" -> ((s, dir) => {
      TextAnalysis.zipfProfile(Tables(s, dir, "documents"), "text", topN = 100)
    }),


    // ── tokenizer: BPE pair statistics (round-1 merge candidates) ───
    "q_bpe_pairs" -> ((s, dir) => {
      Tokenizer.bpePairStats(Tables(s, dir, "documents"), "text", topK = 200)
    }),


    // ── tokenizer: BPE merge training, 6 rounds ─────────────────────
    // One corpus shuffle (word counts); each round is vocab-sized with
    // a single-row argmax collect — the driver loop the oracle replays
    // as an unrolled CTE chain (list_reduce = the same greedy fold).
    "q_bpe_merges" -> ((s, dir) => {
      Tokenizer.bpeTrain(Tables(s, dir, "documents"), "text", merges = 6)
    }),


    // ── tokenizer: BPE corpus segmentation with the trained rules ───
    // Encode only (rowwise folds, zero shuffles); the merge rules come
    // from the shared trained fixture (bpeMerges6 — warmed outside
    // Bench's timed region) and ride the plan as literals.
    "q_bpe_encode" -> ((s, dir) => {
      Tokenizer.applyBpe(Tables(s, dir, "documents"), "doc_id", "text",
        bpeMerges6(s, dir))
    }),


    // ── tokenizer: persisted-rules segmentation (freeze → load →
    // encode) ─────────────────────────────────────────────────────────
    // The tokenizer artifact — "train once, tokenize everywhere":
    // token counting, packing, and budget cuts all drift silently if
    // any consumer segments with different rules, so the merge list
    // is frozen as a versioned parquet artifact (ordered steps + a
    // meta commit row; loud refusals on version / count / step-order
    // drift) and the corpus is encoded THROUGH THE LOADED rules.
    // Oracle = q_bpe_encode's replay verbatim: a reordered, gappy, or
    // partially-written artifact segments differently and
    // hash-mismatches.
    "q_bpe_persist" -> ((s, dir) => {
      val path = sessionTmpDir(s, "bpe_rules", dir)
      Tokenizer.saveBpe(s, path, bpeMerges6(s, dir))
      Tokenizer.applyBpe(Tables(s, dir, "documents"), "doc_id", "text",
        Tokenizer.loadBpe(s, path))
    }),


    // ── tokenizer: per-source compression report of the trained BPE ─
    // THE tokenizer acceptance metric: chars-per-subword by source —
    // a tokenizer trained on one domain under-compresses the others.
    // One zero-shuffle rowwise encode + a key-cardinality agg over
    // the shared trained rules (bpeMerges6).
    "q_bpe_compression" -> ((s, dir) => {
      Tokenizer.bpeCompression(Tables(s, dir, "documents"), "text", "source",
        bpeMerges6(s, dir))
    }),


    // ── tokenizer: unigram-LM vocabulary training (Kudo ACL'18,
    // hard-EM variant — VERDICT r15 item 8). Seed = all frequent
    // substrings (top 4·V + characters); one EM round Viterbi-
    // segments every distinct word and recounts; pruning keeps the
    // top V + characters. Output = the trained vocabulary in
    // canonical (count desc, piece asc) order with rank. The oracle
    // replays the whole trainer — seed, the relational Viterbi DP
    // (chained CTEs, the sqlLrChainFor pattern), recount, prune.
    "q_unigram_train" -> ((s, dir) => {
      import s.implicits._
      val model = UnigramTokenizer.train(Tables(s, dir, "documents"), "text",
        vocabSize = 60, rounds = 1, maxPieceLen = 4, maxWordLen = 16)
      model.pieces.zipWithIndex
        .map { case ((p, c), i) => (p, c, (i + 1).toLong) }
        .toDF("piece", "c", "rank")
    }),


    // ── tokenizer: unigram-LM corpus segmentation ───────────────────
    // Encode with the trained vocabulary: the corpus's distinct words
    // Viterbi-segment once (word-dictionary DP), one hash join maps
    // occurrences to pieces, one grouped reassembly per doc. Piece
    // probabilities are the frozen model's c/T — so the oracle's DP
    // replay is bit-identical.
    "q_unigram_encode" -> ((s, dir) => {
      UnigramTokenizer.encode(Tables(s, dir, "documents"), "doc_id", "text",
        unigramModel60(s, dir), maxWordLen = 16)
    }),


    // ── tokenizer: persisted unigram vocabulary (freeze → load →
    // encode) — the saveBpe discipline for the second tokenizer
    // family: pieces + a meta commit row (version, count, total),
    // loud refusals on version / row-count / total / duplicate-piece
    // drift, and the corpus encoded THROUGH THE LOADED model. Oracle
    // = q_unigram_encode verbatim: any artifact fidelity loss
    // segments differently and hash-mismatches.
    "q_unigram_persist" -> ((s, dir) => {
      val path = sessionTmpDir(s, "unigram_vocab", dir)
      UnigramTokenizer.saveUnigram(s, path, unigramModel60(s, dir))
      UnigramTokenizer.encode(Tables(s, dir, "documents"), "doc_id", "text",
        UnigramTokenizer.loadUnigram(s, path), maxWordLen = 16)
    }),


    // ── tokenizer: per-source compression report of the trained
    // unigram vocabulary — the q_bpe_compression twin for the second
    // tokenizer family: chars-per-piece by source, THE acceptance
    // metric before an expensive training run. One dictionary
    // segmentation + one key-cardinality aggregate over the shared
    // trained fixture.
    "q_unigram_compression" -> ((s, dir) => {
      UnigramTokenizer.compression(Tables(s, dir, "documents"), "text",
        "source", unigramModel60(s, dir), maxWordLen = 16)
    }),


    // ── tokenizer: unigram byte-fallback encode (VERDICT r16 item 3
    // — SentencePiece --byte_fallback). The vocabulary trains on the
    // ascii corpus; the ENCODED corpus injects 'é' after every 'q'
    // (replace(text, 'q', 'qé')) — a character training never saw.
    // Without fallback those words would collapse to '<unk>'; with it
    // they segment through characters, the unseen 'é' through its
    // UTF-8 bytes <0xC3> <0xA9>, and every fully-covered word encodes
    // EXACTLY as q_unigram_encode does. The oracle replays training,
    // the mixed-corpus Viterbi DP, and the byte expansion end to end.
    // Model = the shared trained fixture flagged byteFallback (the
    // flag changes no training arithmetic at maxPieceLen=4 — the
    // byte-piece shape needs 6 chars — so the train replay is
    // q_unigram_train's verbatim).
    "q_unigram_fallback" -> ((s, dir) => {
      val model = unigramModel60(s, dir).copy(byteFallback = true)
      val mixed = Tables(s, dir, "documents")
        .select(col("doc_id"), regexp_replace(col("text"), "q", "qé").as("text"))
      UnigramTokenizer.encode(mixed, "doc_id", "text", model, maxWordLen = 16)
    }),


    // ── LLM-pipeline: bigram-LM quality scoring (perplexity filter) ─
    // CCNet-style: train add-1 bigram statistics on the 3/4 reference
    // slice, score the held-out quarter by mean inverse conditional
    // probability (the rational perplexity proxy — ln's last ulp is
    // engine-dependent, IEEE division is not; see bigramLmScore).
    // Model = two vocab-sized count tables, never a corpus shuffle.
    "q_lm_score" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextAnalysis.bigramLmScore(docs.filter(col("doc_id") % 4 =!= 0),
        docs.filter(col("doc_id") % 4 === 0), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("mean_inv_p"))
    }),


    // ── LLM-pipeline: per-doc keyword extraction (rational-idf tfidf) ─
    "q_keywords" -> ((s, dir) => {
      TextAnalysis.keywords(Tables(s, dir, "documents"), "doc_id", "text", k = 5)
    }),


    // ── LLM-pipeline: keyword-in-context concordance ────────────────
    // Every "spark" occurrence with 3 tokens of context — the
    // corpus-inspection view behind filter-rule debugging. Rowwise
    // posexplode + bounded slices, no shuffle.
    "q_kwic" -> ((s, dir) => {
      TextAnalysis.kwic(Tables(s, dir, "documents"), "doc_id", "text",
        term = "spark", window = 3)
    }),


    // ── LLM-pipeline: Heaps-law vocabulary growth curve ─────────────
    // Distinct types after the first c docs per checkpoint — the
    // V(n) curve that sizes vocabularies; one vocab-sized first-seen
    // table, every checkpoint in ONE aggregate.
    "q_heaps" -> ((s, dir) => {
      TextAnalysis.vocabGrowth(Tables(s, dir, "documents"), "doc_id", "text",
        checkpoints = Seq(500L, 1000L, 2000L, 4000L))
    }),
  )

  // ── unigram-LM tokenizer replay (VERDICT r15 item 8) ─────────────
  // The whole hard-EM trainer in SQL: seed substring counts, prune,
  // the relational Viterbi DP as a chained-CTE lattice (the
  // sqlLrChainFor unroll pattern — one CTE per word-prefix length),
  // recount, prune, and a second DP for the final encode. Arithmetic
  // parity: probabilities are CAST(c AS DOUBLE)/CAST(t AS DOUBLE)
  // (the same IEEE division the engine's model computes driver-side)
  // and path scores are left-to-right prefix products, so both
  // engines produce bit-identical lattices; the (prob DESC, np,
  // pieces) tie-break is the engine's per-position greedy convention
  // replayed verbatim.

  private val UniMaxLen = 16 // = the gate rows' maxWordLen
  private val UniPieceLen = 4

  /** The Viterbi DP chain: `tag`0..`tag`N one CTE per prefix length,
    * each extending the last UniPieceLen frontiers by the connecting
    * substring joined against `probCte`(piece, p), keeping the best
    * row per word; `tag`seg collects each word's full-length row.
    * `wordCte` is the (w, ...) distinct-word relation the lattice
    * runs over — uwc (the training corpus) by default; the fallback
    * gate segments a DIFFERENT corpus's words under the trained
    * vocabulary. */
  private def sqlUnigramDp(tag: String, probCte: String,
                           wordCte: String = "uwc"): String = {
    val chain = (1 to UniMaxLen).map { j =>
      val cands = (math.max(0, j - UniPieceLen) until j).map { i =>
        s"""      SELECT d.w, d.prob * p.p AS prob, d.np + 1 AS np,
           |             CASE WHEN d.pieces = '' THEN p.piece ELSE d.pieces || ' ' || p.piece END AS pieces
           |      FROM $tag$i d JOIN $probCte p ON p.piece = substr(d.w, ${i + 1}, ${j - i})
           |      WHERE len(d.w) >= $j""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""$tag$j AS MATERIALIZED (
         |  SELECT w, prob, np, pieces FROM (
         |    SELECT w, prob, np, pieces,
         |           row_number() OVER (PARTITION BY w ORDER BY prob DESC, np, pieces) AS rn
         |    FROM (
         |$cands
         |    )
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val seg = (1 to UniMaxLen)
      .map(j => s"  SELECT w, pieces, np FROM $tag$j WHERE len(w) = $j")
      .mkString("\n  UNION ALL\n")
    s"""${tag}0 AS MATERIALIZED (SELECT w, CAST(1.0 AS DOUBLE) AS prob, CAST(0 AS BIGINT) AS np, '' AS pieces FROM $wordCte),
       |$chain,
       |${tag}seg AS MATERIALIZED (
       |$seg
       |)""".stripMargin
  }

  /** Shared train chain: word counts → chars → seed (top 4·60 +
    * chars) → DP pass A → recount → prune to 60 + chars = the final
    * vocabulary uv1 with its probabilities up1. */
  private val sqlUnigramTrainCtes: String =
    s"""uwc AS MATERIALIZED (
       |  SELECT t AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE len(t) > 0 GROUP BY 1
       |),
       |uch AS MATERIALIZED (SELECT DISTINCT unnest(string_split(w, '')) AS piece FROM uwc),
       |useed AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT uwc.cnt, substr(uwc.w, i.i, l.l) AS piece
       |    FROM uwc CROSS JOIN range(1, ${UniPieceLen + 1}) l(l)
       |             CROSS JOIN range(1, ${UniMaxLen + 1}) i(i)
       |    WHERE i.i + l.l - 1 <= len(uwc.w)
       |  ) GROUP BY 1
       |),
       |utop0 AS MATERIALIZED (SELECT piece, c FROM useed ORDER BY c DESC, piece LIMIT 240),
       |uv0 AS MATERIALIZED (
       |  SELECT piece, c FROM utop0
       |  UNION ALL
       |  SELECT ch.piece, CAST(coalesce(s.c, 1) AS BIGINT) AS c
       |  FROM uch ch ANTI JOIN utop0 USING (piece)
       |             LEFT JOIN useed s ON s.piece = ch.piece
       |),
       |ut0 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM uv0),
       |up0 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p FROM uv0, ut0),
       |${sqlUnigramDp("ua", "up0")},
       |urc AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT uwc.cnt, unnest(string_split(s.pieces, ' ')) AS piece
       |    FROM uaseg s JOIN uwc ON uwc.w = s.w WHERE s.pieces <> '<unk>'
       |  ) GROUP BY 1
       |),
       |utop1 AS MATERIALIZED (SELECT piece, c FROM urc ORDER BY c DESC, piece LIMIT 60),
       |uv1 AS MATERIALIZED (
       |  SELECT piece, c FROM utop1
       |  UNION ALL
       |  SELECT ch.piece, CAST(coalesce(r.c, 1) AS BIGINT) AS c
       |  FROM uch ch ANTI JOIN utop1 USING (piece)
       |             LEFT JOIN urc r ON r.piece = ch.piece
       |),
       |ut1 AS MATERIALIZED (SELECT CAST(sum(c) AS BIGINT) AS t FROM uv1),
       |up1 AS MATERIALIZED (SELECT piece, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p FROM uv1, ut1)""".stripMargin

  /** The final-vocabulary corpus encode, shared verbatim by
    * q_unigram_encode (trained model) and q_unigram_persist (model
    * through the save/load round trip — bit-identical by the
    * artifact contract). */
  private val sqlUnigramEncode: String =
    s"""WITH $sqlUnigramTrainCtes,
       |${sqlUnigramDp("ub", "up1")},
       |ufin AS MATERIALIZED (
       |  SELECT w, pieces, np FROM ubseg
       |  UNION ALL
       |  SELECT w, '<unk>' AS pieces, CAST(1 AS BIGINT) AS np
       |  FROM uwc ANTI JOIN ubseg USING (w)
       |),
       |utok AS (
       |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS w
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ts
       |        FROM documents)
       |),
       |uenc AS (
       |  SELECT utok.doc_id, string_agg(f.pieces, ' ' ORDER BY utok.pos) AS unigram,
       |         CAST(sum(f.np) AS BIGINT) AS n_pieces
       |  FROM utok JOIN ufin f ON f.w = utok.w GROUP BY 1
       |)
       |SELECT d.doc_id, coalesce(e.unigram, '') AS unigram,
       |       CAST(coalesce(e.n_pieces, 0) AS BIGINT) AS n_pieces
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN uenc e ON e.doc_id = d.doc_id""".stripMargin

  /** The byte-fallback encode replay (q_unigram_fallback): the shared
    * train chain builds uv1/up1 over the ASCII corpus; the MIXED
    * corpus ('é' injected after every 'q') tokenizes into its own
    * word table, Viterbi-segments under the trained vocabulary, and
    * the no-path words (every 'é'-carrier) expand per character —
    * covered chars as pieces, 'é' as its UTF-8 bytes via
    * hex(encode(ch)), the same uppercase-hex convention Spark's
    * hex() emits. */
  private val sqlUnigramFallback: String =
    s"""WITH $sqlUnigramTrainCtes,
       |mixd AS MATERIALIZED (
       |  SELECT doc_id, replace(text, 'q', 'qé') AS text FROM documents
       |),
       |ewc AS MATERIALIZED (
       |  SELECT t AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM mixd)
       |  WHERE len(t) > 0 GROUP BY 1
       |),
       |${sqlUnigramDp("uf", "up1", "ewc")},
       |uvch AS (SELECT piece FROM uv1 WHERE len(piece) = 1),
       |ufbc AS (
       |  SELECT nw.w, CAST(i.i AS INTEGER) AS pos,
       |         substr(nw.w, CAST(i.i AS INTEGER), 1) AS ch
       |  FROM (SELECT w FROM ewc ANTI JOIN ufseg USING (w)) nw
       |       CROSS JOIN range(1, ${UniMaxLen + 1}) i(i)
       |  WHERE i.i <= len(nw.w)
       |),
       |ufbp AS (
       |  SELECT c.w, c.pos,
       |         CASE WHEN v.piece IS NOT NULL THEN [c.ch]
       |              ELSE list_transform(range(1, len(hex(encode(c.ch)))//2 + 1),
       |                     b -> '<0x' || substr(hex(encode(c.ch)), CAST(b*2-1 AS INTEGER), 2) || '>')
       |         END AS pl
       |  FROM ufbc c LEFT JOIN uvch v ON v.piece = c.ch
       |),
       |ufb AS (
       |  SELECT w, flatten(list(pl ORDER BY pos)) AS pls FROM ufbp GROUP BY w
       |),
       |uffin AS MATERIALIZED (
       |  SELECT w, pieces, np FROM ufseg
       |  UNION ALL
       |  SELECT w, array_to_string(pls, ' ') AS pieces,
       |         CAST(len(pls) AS BIGINT) AS np
       |  FROM ufb
       |),
       |uftok AS (
       |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS w
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS ts
       |        FROM mixd)
       |),
       |ufenc AS (
       |  SELECT uftok.doc_id, string_agg(f.pieces, ' ' ORDER BY uftok.pos) AS unigram,
       |         CAST(sum(f.np) AS BIGINT) AS n_pieces
       |  FROM uftok JOIN uffin f ON f.w = uftok.w GROUP BY 1
       |)
       |SELECT d.doc_id, coalesce(e.unigram, '') AS unigram,
       |       CAST(coalesce(e.n_pieces, 0) AS BIGINT) AS n_pieces
       |FROM (SELECT DISTINCT doc_id FROM mixd) d
       |LEFT JOIN ufenc e ON e.doc_id = d.doc_id""".stripMargin

  /** The 6-round BPE train + corpus-encode replay, shared verbatim by
    * q_bpe_encode (trained rules) and q_bpe_persist (rules through
    * the save/load round trip — bit-identical by the artifact
    * contract). */
  private val sqlBpeEncode: String =
    s"""WITH ${sqlBpeChain(6)},
       |d0 AS (
       |  SELECT doc_id, list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
       |           w -> array_to_string([w[i] for i in range(1, len(w)+1)], ' ')) AS syms
       |  FROM documents
       |),
       |${(1 to 6).map(r =>
           s"""d$r AS (
              |  SELECT d.doc_id, list_transform(d.syms, s -> ${sqlBpeFold("string_split(s, ' ')")}) AS syms
              |  FROM d${r - 1} d CROSS JOIN m$r m
              |)""".stripMargin).mkString(",\n")}
       |SELECT doc_id, bpe,
       |       CASE WHEN bpe = '' THEN CAST(0 AS BIGINT)
       |            ELSE CAST(len(string_split(bpe, ' ')) AS BIGINT) END AS n_subwords
       |FROM (SELECT doc_id, array_to_string(syms, ' ') AS bpe FROM d6)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q_text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS avg_token_len,
        |       CAST(len(list_distinct(toks)) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)""".stripMargin,


    "q_quality" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         ['the', 'a', 'and', 'of', 'to', 'in'] AS sw
        |  FROM documents
        |),
        |r AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(len(list_distinct(list_filter(toks, t -> list_contains(sw, t)))) AS DOUBLE)
        |           / CAST(len(list_distinct(toks)) AS DOUBLE) AS stop_coverage,
        |         CAST(len(list_filter(toks, t -> list_contains(sw, t))) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS stop_token_ratio,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS type_token_ratio
        |  FROM d
        |)
        |SELECT doc_id, n_tokens, stop_coverage, stop_token_ratio, type_token_ratio,
        |       (CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN stop_token_ratio > 0.05 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN type_token_ratio > 0.2 THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN type_token_ratio < 0.95 THEN 0.25 ELSE 0.0 END) AS quality
        |FROM r""".stripMargin,


    "q_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id || '@example.com or https://ex.com/d/' || doc_id
        |              || ' tel 555-0100-' || doc_id AS t
        |  FROM documents
        |)
        |, p AS (
        |  SELECT doc_id, t,
        |         regexp_replace(t, 'https?://[^\s]+', '<URL>', 'g') AS no_url
        |  FROM aug
        |), p2 AS (
        |  SELECT doc_id, t, no_url,
        |         regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |                        '<EMAIL>', 'g') AS no_email
        |  FROM p
        |)
        |SELECT doc_id,
        |       regexp_replace(no_email, '[0-9][0-9 ()+.-]{6,}[0-9]', '<NUM>', 'g') AS clean_text,
        |       CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |       CAST(len(regexp_extract_all(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(no_email, '[0-9][0-9 ()+.-]{6,}[0-9]')) AS BIGINT) AS n_phones
        |FROM p2""".stripMargin,


    "q_rep_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS gram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |),
        |counts AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram
        |),
        |agg AS (
        |  SELECT doc_id, max(cnt) AS top_cnt,
        |         CAST(sum(cnt) AS BIGINT) AS n_grams,
        |         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams
        |  FROM counts GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(a.n_grams, 0) AS n_grams,
        |       COALESCE(CAST(a.top_cnt AS DOUBLE) / a.n_grams, 0.0) AS top_ngram_frac,
        |       COALESCE(CAST(a.dup_grams AS DOUBLE) / a.n_grams, 0.0) AS dup_ngram_frac
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,


    "q_rep_runs" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents
        |),
        |r AS (
        |  SELECT doc_id, tok, pos,
        |         pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp
        |  FROM t
        |),
        |runs AS (SELECT doc_id, count(*) AS run_len FROM r GROUP BY doc_id, tok, grp)
        |SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run
        |FROM runs GROUP BY doc_id""".stripMargin,


    "q_top_terms" ->
      """SELECT term, cnt, CAST(rn AS INTEGER) AS rank FROM (
        |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM (
        |    SELECT term, count(*) AS cnt FROM (
        |      SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |    GROUP BY 1))
        |WHERE rn <= 20""".stripMargin,


    // CMS replay: same md5 row-hash ("i:token" prefix mod width),
    // same depth×width counter table, min-of-rows estimate — all
    // exact integers end to end
    "q_cms_topk" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |cmst AS (
        |  SELECT t.i AS row,
        |         CAST(concat('0x', substr(md5(t.i || ':' || token), 1, 8))
        |           AS BIGINT) % 512 AS bucket,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM tok CROSS JOIN range(0, 4) t(i) GROUP BY 1, 2),
        |topt AS (SELECT term, cnt FROM (
        |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn FROM (
        |    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
        |      SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |    GROUP BY 1))
        |  WHERE rn <= 20),
        |est AS (
        |  SELECT topt.term, min(coalesce(cmst.n, 0)) AS cms_n
        |  FROM topt CROSS JOIN range(0, 4) t(i)
        |  LEFT JOIN cmst ON cmst.row = t.i
        |    AND cmst.bucket = CAST(concat('0x', substr(md5(t.i || ':' || topt.term), 1, 8))
        |                        AS BIGINT) % 512
        |  GROUP BY 1)
        |SELECT topt.term, topt.cnt AS exact_n, est.cms_n
        |FROM topt JOIN est USING (term)""".stripMargin,


    "q_term_freq" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2
        |),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT tf.doc_id, tf.term, tf.tf, dfreq.df FROM tf JOIN dfreq USING (term)""".stripMargin,


    "q_vocab" ->
      """WITH counts AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term)
        |SELECT term, cnt,
        |       CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS vocab_id
        |FROM counts""".stripMargin,


    "q_readability" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len([x for x in string_split(text, ' ') if len(x) > 0])
        |           AS BIGINT) AS n_words,
        |         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
        |           AS n_sentence_marks,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |           AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentence_marks, n_syllables,
        |       greatest(n_sentence_marks, 1) AS n_sentences,
        |       CASE WHEN n_words > 0 THEN
        |         206.835
        |           - 1.015 * (CAST(n_words AS DOUBLE) / greatest(n_sentence_marks, 1))
        |           - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) END AS flesch
        |FROM t""".stripMargin,


    "q_diversity" ->
      """WITH toks AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |c AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
        |      FROM toks GROUP BY doc_id, t),
        |a AS (SELECT doc_id,
        |             CAST(sum(c) AS BIGINT) AS n_tokens,
        |             CAST(count(*) AS BIGINT) AS n_types,
        |             CAST(sum(c * c) AS BIGINT) AS sum_sq
        |      FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |       COALESCE(a.n_tokens, 0) AS n_tokens,
        |       COALESCE(a.n_types, 0) AS n_types,
        |       COALESCE(a.sum_sq, 0) AS sum_sq,
        |       CASE WHEN a.n_tokens > 0
        |            THEN CAST(a.n_tokens * a.n_tokens - a.sum_sq AS DOUBLE)
        |                   / (a.n_tokens * a.n_tokens) END AS simpson,
        |       CASE WHEN a.n_tokens > 0
        |            THEN CAST(a.n_tokens * a.n_tokens AS DOUBLE) / a.sum_sq
        |            END AS eff_types
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,


    "q_stopwords" ->
      """WITH toks AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |bt AS (SELECT toks.t AS term,
        |              CAST(count(DISTINCT toks.doc_id) AS BIGINT) AS df,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks GROUP BY toks.t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT term, df, cnt,
        |       CAST(df AS DOUBLE) / n.n AS df_frac,
        |       CAST(row_number() OVER (ORDER BY df DESC, cnt DESC, term) AS BIGINT)
        |         AS rank
        |FROM bt CROSS JOIN n
        |ORDER BY df DESC, cnt DESC, term LIMIT 50""".stripMargin,


    "q_zipf" ->
      """WITH toks AS (
        |  SELECT t FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE len(t) > 0),
        |c AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY t),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM c),
        |h AS (SELECT term, cnt,
        |             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
        |             CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |             max(cnt) OVER () AS top
        |      FROM c)
        |SELECT rank, term, cnt,
        |       CAST(cnt AS DOUBLE) / top AS frac_top,
        |       CAST(cum AS DOUBLE) / tot.t AS cum_frac
        |FROM h CROSS JOIN tot WHERE rank <= 100""".stripMargin,


    "q_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks, n,
        |         unnest(range(1, greatest(1, n - 8) + 1, 24)) AS s
        |  FROM t)
        |SELECT doc_id,
        |       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
        |       array_to_string(list_slice(toks, s, s + 31), ' ') AS chunk_text,
        |       least(CAST(32 AS BIGINT), n - s + 1) AS n_tokens
        |FROM u""".stripMargin,


    "q_strip_markup" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         '<html><body class="d"><p>' || substr(text, 1, 60)
        |           || '</p><br/>&amp;co &lt;tag&gt; ' || substr(text, 61, 1000000)
        |           || '</body></html>' AS text
        |  FROM documents
        |),
        |st AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '<[^<>]*>')) AS BIGINT) AS n_tags_removed,
        |         regexp_replace(text, '<[^<>]*>', ' ', 'g') AS s1
        |  FROM aug
        |),
        |de AS (
        |  SELECT doc_id, n_tags_removed,
        |         replace(replace(replace(replace(replace(
        |           s1, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '&apos;', ''''), '&amp;', '&') AS s2
        |  FROM st
        |)
        |SELECT doc_id,
        |       trim(regexp_replace(s2, '  +', ' ', 'g')) AS clean_text,
        |       n_tags_removed
        |FROM de""".stripMargin,


    "q_truncate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |)
        |SELECT doc_id,
        |       array_to_string(toks[1:30], ' ') AS text,
        |       CAST(least(len(toks), 30) AS BIGINT) AS n_tokens_kept,
        |       CAST(len(toks) - least(len(toks), 30) AS BIGINT) AS n_tokens_dropped
        |FROM t""".stripMargin,


    "q_sentences" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         substr(text, 1, 50) || '. ' || substr(text, 51, 50) || '! '
        |           || substr(text, 101, 1000000) AS text
        |  FROM documents
        |),
        |s0 AS (
        |  SELECT doc_id,
        |         list_filter(
        |           list_transform(
        |             string_split(regexp_replace(regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
        |                                         '([.!?]+)\s+', '\1' || chr(1), 'g'),
        |                          chr(1)),
        |             y -> trim(y)),
        |           x -> len(x) > 0) AS ss
        |  FROM aug
        |)
        |SELECT doc_id, CAST(generate_subscripts(ss, 1) AS INTEGER) AS sent_id,
        |       unnest(ss) AS sentence, CAST(len(ss) AS BIGINT) AS n_sents
        |FROM s0""".stripMargin,


    "q_normalize" ->
      """WITH dirty AS (
        |  SELECT doc_id,
        |         '  Start' || chr(9) || text || ' MID  dash ' || doc_id || '  ' AS text
        |  FROM documents)
        |SELECT doc_id,
        |       lower(trim(regexp_replace(
        |         regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '  +', ' ', 'g')))
        |         AS norm_text,
        |       CAST(length(text) - length(lower(trim(regexp_replace(
        |         regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'), '  +', ' ', 'g'))))
        |         AS BIGINT) AS n_chars_removed
        |FROM dirty""".stripMargin,


    "q_oov" ->
      """WITH counts AS (
        |  SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term),
        |topv AS (SELECT list(term) AS lt FROM (
        |  SELECT term FROM counts ORDER BY cnt DESC, term LIMIT 10)),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_tokens,
        |       CAST(len(list_filter(toks, x -> NOT list_contains(topv.lt, x))) AS BIGINT) AS n_oov,
        |       CAST(len(list_filter(toks, x -> NOT list_contains(topv.lt, x))) AS DOUBLE)
        |         / CAST(len(toks) AS DOUBLE) AS oov_rate
        |FROM t, topv""".stripMargin,


    "q_lang_id" ->
      """WITH langs AS (
        |  SELECT * FROM (VALUES
        |    ('de', ['der', 'die', 'und', 'das']),
        |    ('en', ['the', 'a', 'and', 'of']),
        |    ('es', ['el', 'la', 'los', 'y']),
        |    ('fr', ['le', 'les', 'des', 'et']),
        |    ('zh', ['zhe', 'shi', 'bu', 'wo'])) l(lang, words)
        |),
        |scores AS (
        |  SELECT d.doc_id, l.lang,
        |         CAST(len(list_filter(d.toks, t -> list_contains(l.words, t))) AS DOUBLE)
        |           / CAST(len(d.toks) AS DOUBLE) AS score
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
        |  CROSS JOIN langs l
        |)
        |SELECT doc_id, lang AS lang_pred, score AS lang_score FROM (
        |  SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM scores)
        |WHERE rn = 1""".stripMargin,


    "q_lang_ngram" ->
      """WITH langs AS (
        |  SELECT * FROM (VALUES
        |    ('de', ['der', 'ein', 'sch']),
        |    ('en', [' th', 'ing', ' an']),
        |    ('es', [' de', 'los', ' la']),
        |    ('fr', [' le', 'ent', 'eau'])) l(lang, grams)
        |),
        |g AS (
        |  SELECT doc_id, [substr(text, i, 3) for i in range(1, length(text)-1)] AS grams
        |  FROM documents
        |),
        |scores AS (
        |  SELECT g.doc_id, l.lang,
        |         CASE WHEN len(g.grams) > 0 THEN
        |           CAST(len(list_filter(g.grams, x -> list_contains(l.grams, x))) AS DOUBLE)
        |             / CAST(len(g.grams) AS DOUBLE)
        |         ELSE 0.0 END AS score
        |  FROM g CROSS JOIN langs l
        |)
        |SELECT doc_id, lang AS lang_pred, score AS lang_score FROM (
        |  SELECT doc_id, lang, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        |  FROM scores)
        |WHERE rn = 1""".stripMargin,


    // chi2's op order replays the plan exactly: dif in BIGINT then
    // CAST; numerator ((N*dif)*dif); denominator left-assoc product
    "q_chi2_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |       FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n11 FROM bg GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(n11) AS BIGINT) AS nt FROM bi),
        |l AS (SELECT w1, CAST(sum(n11) AS BIGINT) AS n1p FROM bi GROUP BY 1),
        |r AS (SELECT w2, CAST(sum(n11) AS BIGINT) AS np1 FROM bi GROUP BY 1),
        |j AS (SELECT bi.w1, bi.w2, bi.n11, l.n1p, r.np1, n.nt,
        |             CAST(bi.n11 * (n.nt - l.n1p - r.np1 + bi.n11)
        |                  - (l.n1p - bi.n11) * (r.np1 - bi.n11) AS DOUBLE) AS dif
        |      FROM bi JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |      WHERE bi.n11 >= 5 AND l.n1p < n.nt AND r.np1 < n.nt)
        |SELECT w1, w2, n11, n1p, np1,
        |       CAST(nt AS DOUBLE) * dif * dif /
        |       (CAST(n1p AS DOUBLE) * CAST(nt - n1p AS DOUBLE)
        |        * CAST(np1 AS DOUBLE) * CAST(nt - np1 AS DOUBLE)) AS chi2
        |FROM j ORDER BY chi2 DESC, w1, w2 LIMIT 50""".stripMargin,


    "q_vocab_coverage" ->
      """WITH c AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
        |        SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |      GROUP BY 1),
        |r AS (SELECT c.*, row_number() OVER (ORDER BY c DESC, term) AS rank FROM c),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM r)
        |SELECT CAST(k.k AS BIGINT) AS k,
        |       CAST(sum(CASE WHEN r.rank <= k.k THEN r.c ELSE 0 END) AS BIGINT)
        |         AS covered_tokens,
        |       t.total AS total_tokens,
        |       CAST(sum(CASE WHEN r.rank <= k.k THEN r.c ELSE 0 END) AS DOUBLE)
        |         / CAST(t.total AS DOUBLE) AS coverage
        |FROM r CROSS JOIN (VALUES (100), (1000), (10000)) k(k) CROSS JOIN t
        |GROUP BY k.k, t.total""".stripMargin,


    "q_corpus_drift" ->
      """WITH c1 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 = 0),
        |g1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM c1 GROUP BY 1),
        |c2 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 <> 0),
        |g2 AS (SELECT term, CAST(count(*) AS BIGINT) AS c2 FROM c2 GROUP BY 1),
        |j AS (SELECT coalesce(g1.c1, 0) AS c1, coalesce(g2.c2, 0) AS c2
        |      FROM g1 FULL OUTER JOIN g2 USING (term)),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM j)
        |SELECT n.n1 AS n_tokens_v1, n.n2 AS n_tokens_v2,
        |       CAST(sum(CASE WHEN j.c1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_v1,
        |       CAST(sum(CASE WHEN j.c2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_v2,
        |       CAST(sum(CASE WHEN j.c1 > 0 AND j.c2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS shared_vocab,
        |       CAST(sum(abs(j.c1 * n.n2 - j.c2 * n.n1)) AS DOUBLE)
        |         / (2.0 * CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE)) AS tvd
        |FROM j CROSS JOIN n GROUP BY n.n1, n.n2""".stripMargin,


    "q_drift_terms" ->
      """WITH c1 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 = 0),
        |g1 AS (SELECT term, CAST(count(*) AS BIGINT) AS c1 FROM c1 GROUP BY 1),
        |c2 AS (SELECT unnest(string_split(text, ' ')) AS term
        |            FROM documents WHERE doc_id % 2 <> 0),
        |g2 AS (SELECT term, CAST(count(*) AS BIGINT) AS c2 FROM c2 GROUP BY 1),
        |j AS (SELECT term, coalesce(g1.c1, 0) AS c1, coalesce(g2.c2, 0) AS c2
        |      FROM g1 FULL OUTER JOIN g2 USING (term)),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |             CAST(sum(c2) AS BIGINT) AS n2 FROM j)
        |SELECT j.term, j.c1, j.c2,
        |       abs(j.c1 * n.n2 - j.c2 * n.n1) AS deviation
        |FROM j CROSS JOIN n
        |ORDER BY deviation DESC, term LIMIT 20""".stripMargin,


    "q_kwic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (SELECT doc_id, l,
        |             unnest([{'p': i, 't': l[i]} for i in range(1, len(l) + 1)]) AS x
        |      FROM t)
        |SELECT doc_id, CAST(x.p AS BIGINT) AS pos,
        |       coalesce(array_to_string(l[greatest(x.p - 3, 1):x.p - 1], ' '), '')
        |         AS left_ctx,
        |       coalesce(array_to_string(l[x.p + 1:least(x.p + 3, len(l))], ' '), '')
        |         AS right_ctx
        |FROM p WHERE x.t = 'spark'""".stripMargin,


    // op order mirrors bm25Score exactly: rational idf, k1=1.2,
    // b=0.75 (1-b = 0.25 and 0.75 are dyadic — exact doubles)
    "q_search_topk" -> {
      // mirrors searchTopK: allTerms order = first appearance across
      // the three probe queries; per-query score = left-assoc sum
      val terms = Seq("join", "hash", "merge", "scan", "filter",
        "stream", "window", "batch")
      def ts(i: Int): String =
        s"""(CAST(n - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)
           |      * ((CAST(tf$i AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
           |         / (CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE)
           |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
           |               * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
      }.mkString(",\n       ")
      val dfCols = terms.indices.map(i =>
        s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
        .mkString(",\n       ")
      def qs(is: Int*): String = is.map(ts).mkString("\n  + ")
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         |      $tfCols FROM base),
         |st AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |       CAST(count(*) AS BIGINT) AS n,
         |       $dfCols FROM t),
         |sc AS (
         |  SELECT doc_id, 'q_joins' AS query_id, ${qs(0, 1, 2)} AS score
         |  FROM t CROSS JOIN st
         |  UNION ALL
         |  SELECT doc_id, 'q_scans', ${qs(3, 4)} FROM t CROSS JOIN st
         |  UNION ALL
         |  SELECT doc_id, 'q_streams', ${qs(5, 6, 7)} FROM t CROSS JOIN st),
         |r AS (SELECT query_id, doc_id, score,
         |             CAST(row_number() OVER (PARTITION BY query_id
         |               ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |      FROM sc WHERE score > 0)
         |SELECT query_id, rank, doc_id, score FROM r WHERE rank <= 10""".stripMargin
    },


    "q_bm25" ->
      s"""WITH $sqlBm25Ctes
         |SELECT doc_id, dl,
         |    $sqlBm25Expr AS bm25
         |FROM t CROSS JOIN st""".stripMargin,


    "q_ngram_quality" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS gram
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
        |),
        |cnt AS (SELECT gram, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY gram),
        |per AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |         CAST(sum(c.c) AS BIGINT) AS sum_freq
        |  FROM grams g JOIN cnt c USING (gram) GROUP BY g.doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(p.n_grams, 0) AS n_grams,
        |       COALESCE(p.sum_freq, 0) AS sum_freq,
        |       CAST(p.sum_freq AS DOUBLE) / p.n_grams AS avg_freq
        |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,


    "q_boilerplate" ->
      """WITH docs2 AS (
        |  SELECT doc_id,
        |         concat_ws(chr(10), text, 'footer: terms apply',
        |           CASE WHEN doc_id % 3 = 0 THEN 'promo: subscribe now' END) AS text
        |  FROM documents
        |),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2),
        |lines AS (
        |  SELECT doc_id, i AS pos, l[i] AS line
        |  FROM ls, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i)
        |),
        |boiler AS (SELECT line FROM lines GROUP BY line
        |           HAVING count(DISTINCT doc_id) >= 50),
        |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM boiler)),
        |reb AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
        |         CAST(count(*) AS BIGINT) AS kept_n
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       COALESCE(r.clean, '') AS clean_text,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
        |       CAST(len(string_split(d.text, chr(10))) AS BIGINT)
        |         - COALESCE(r.kept_n, 0) AS n_dropped
        |FROM docs2 d LEFT JOIN reb r USING (doc_id)""".stripMargin,


    "q_inverted" ->
      """WITH t AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |       array_to_string(list_transform((list_sort(list(doc_id)))[1:100],
        |                                      v -> CAST(v AS VARCHAR)), ',') AS postings
        |FROM t GROUP BY term""".stripMargin,


    "q_source_sim" ->
      """WITH tf AS (
        |  SELECT source AS k, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT k, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1),
        |d AS (SELECT a.k AS source1, b.k AS source2,
        |             CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |      FROM tf a JOIN tf b ON a.term = b.term AND a.k < b.k
        |      GROUP BY 1, 2)
        |SELECT d.source1, d.source2, d.dot,
        |       CAST(d.dot AS DOUBLE)
        |         / (sqrt(CAST(n1.n2 AS DOUBLE)) * sqrt(CAST(n2.n2 AS DOUBLE))) AS cosine
        |FROM d JOIN n n1 ON n1.k = d.source1
        |       JOIN n n2 ON n2.k = d.source2""".stripMargin,


    "q_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |big AS (SELECT t[i] AS w1, t[i + 1] AS w2
        |        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
        |bcall AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
        |          FROM big GROUP BY w1, w2),
        |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM bcall),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c_ab,
        |         (CAST(b.c_ab AS DOUBLE) * CAST(nb.n AS DOUBLE))
        |           / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |  FROM bcall b JOIN uc u1 ON u1.w = b.w1 JOIN uc u2 ON u2.w = b.w2
        |  CROSS JOIN nb WHERE b.c_ab >= 5
        |)
        |SELECT w1, w2, c_ab, lift, rank FROM (
        |  SELECT w1, w2, c_ab, lift,
        |         CAST(row_number() OVER (ORDER BY lift DESC, w1, w2) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 100""".stripMargin,


    "q_distinct_terms" ->
      """WITH toks AS (
        |  SELECT source, w AS term
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0
        |),
        |tfg AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf_g
        |        FROM toks GROUP BY 1, 2),
        |tf AS (SELECT term, CAST(sum(tf_g) AS BIGINT) AS tf FROM tfg GROUP BY term),
        |tg AS (SELECT source, CAST(sum(tf_g) AS BIGINT) AS tg FROM tfg GROUP BY 1),
        |t AS (SELECT CAST(sum(tg) AS BIGINT) AS t FROM tg),
        |scored AS (
        |  SELECT g.source, g.term, g.tf_g,
        |         (CAST(g.tf_g AS DOUBLE) * CAST(t.t - tg.tg AS DOUBLE))
        |           / (CAST(tf.tf - g.tf_g + 1 AS DOUBLE) * CAST(tg.tg AS DOUBLE)) AS lift
        |  FROM tfg g
        |  JOIN tf ON tf.term = g.term
        |  JOIN tg ON tg.source = g.source
        |  CROSS JOIN t
        |)
        |SELECT source, term, tf_g, lift, rank FROM (
        |  SELECT source, term, tf_g, lift,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY lift DESC, term) AS BIGINT) AS rank
        |  FROM scored) WHERE rank <= 10""".stripMargin,


    "q_bpe_pairs" ->
      s"""WITH ${sqlBpeChain(0)},
         |p1 AS (
         |  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([ss[i] || ' ' || ss[i+1] for i in range(1, len(ss))]) AS pr
         |        FROM (SELECT string_split(sym, ' ') AS ss, cnt FROM w0))
         |  GROUP BY pr
         |)
         |SELECT pair, pair_count, rank FROM (
         |  SELECT pair, c AS pair_count,
         |         CAST(row_number() OVER (ORDER BY c DESC, pair) AS BIGINT) AS rank
         |  FROM p1) WHERE rank <= 200""".stripMargin,


    "q_bpe_merges" ->
      s"""WITH ${sqlBpeChain(6)}
         |${(1 to 6).map(r =>
             s"SELECT CAST($r AS BIGINT) AS step, pair, c AS pair_count FROM m$r")
             .mkString("", "\nUNION ALL\n", "")}""".stripMargin,


    "q_bpe_encode" -> sqlBpeEncode,


    // encoding through the persisted rules must reproduce the
    // trained-rules encode exactly — the oracle is that replay
    // verbatim
    "q_bpe_persist" -> sqlBpeEncode,


    // unigram-LM trainer replay (VERDICT r15 item 8): the final
    // pruned vocabulary in canonical (count desc, piece asc) order
    "q_unigram_train" ->
      s"""WITH $sqlUnigramTrainCtes
         |SELECT piece, c,
         |       CAST(row_number() OVER (ORDER BY c DESC, piece) AS BIGINT) AS rank
         |FROM uv1""".stripMargin,


    "q_unigram_encode" -> sqlUnigramEncode,
    "q_unigram_fallback" -> sqlUnigramFallback,


    // encoding through the persisted vocabulary must reproduce the
    // trained-model encode exactly — the oracle is that replay
    // verbatim
    "q_unigram_persist" -> sqlUnigramEncode,


    // per-source compression of the trained unigram vocabulary — the
    // encode chain's piece counts rolled up by source
    "q_unigram_compression" ->
      s"""WITH $sqlUnigramTrainCtes,
         |${sqlUnigramDp("ub", "up1")},
         |ufin AS MATERIALIZED (
         |  SELECT w, pieces, np FROM ubseg
         |  UNION ALL
         |  SELECT w, '<unk>' AS pieces, CAST(1 AS BIGINT) AS np
         |  FROM uwc ANTI JOIN ubseg USING (w)
         |),
         |wtok AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS w
         |  FROM documents
         |),
         |psum AS (
         |  SELECT source, CAST(sum(f.np) AS BIGINT) AS n_pieces
         |  FROM wtok JOIN ufin f USING (w) GROUP BY 1
         |),
         |ubase AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(text)) AS BIGINT) AS n_chars
         |  FROM documents GROUP BY 1
         |)
         |SELECT b.source, b.n_docs,
         |       CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces, b.n_chars,
         |       CAST(b.n_chars AS DOUBLE)
         |         / CAST(coalesce(p.n_pieces, 0) AS DOUBLE) AS chars_per_piece
         |FROM ubase b LEFT JOIN psum p USING (source)""".stripMargin,


    "q_bpe_compression" ->
      s"""WITH ${sqlBpeChain(6)},
         |d0 AS (
         |  SELECT doc_id, list_transform(list_filter(string_split(text, ' '), w -> len(w) > 0),
         |           w -> array_to_string([w[i] for i in range(1, len(w)+1)], ' ')) AS syms
         |  FROM documents
         |),
         |${(1 to 6).map(r =>
             s"""d$r AS (
                |  SELECT d.doc_id, list_transform(d.syms, s -> ${sqlBpeFold("string_split(s, ' ')")}) AS syms
                |  FROM d${r - 1} d CROSS JOIN m$r m
                |)""".stripMargin).mkString(",\n")},
         |enc AS (
         |  SELECT doc_id,
         |         CASE WHEN bpe = '' THEN CAST(0 AS BIGINT)
         |              ELSE CAST(len(string_split(bpe, ' ')) AS BIGINT) END AS n_subwords
         |  FROM (SELECT doc_id, array_to_string(syms, ' ') AS bpe FROM d6)
         |)
         |SELECT doc.source, count(*) AS n_docs,
         |       CAST(sum(enc.n_subwords) AS BIGINT) AS n_subwords,
         |       CAST(sum(len(doc.text)) AS BIGINT) AS n_chars,
         |       CAST(CAST(sum(len(doc.text)) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(sum(enc.n_subwords) AS BIGINT) AS DOUBLE) AS chars_per_subword
         |FROM documents doc JOIN enc USING (doc_id)
         |GROUP BY doc.source""".stripMargin,


    "q_lm_score" ->
      """WITH tr AS (SELECT text FROM documents WHERE doc_id % 4 <> 0),
        |cand AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
        |trt AS (SELECT string_split(text, ' ') AS t FROM tr),
        |trb AS (SELECT unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
        |        FROM trt),
        |cb AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c FROM trb GROUP BY 1, 2),
        |cu AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cu FROM cb GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v
        |       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM tr)),
        |ct AS (SELECT doc_id, string_split(text, ' ') AS t FROM cand),
        |cbi AS (SELECT doc_id,
        |               unnest([{'w1': t[i], 'w2': t[i+1]} for i in range(1, len(t))]) AS b
        |        FROM ct),
        |sc AS (SELECT x.doc_id,
        |              (CAST(coalesce(cu.cu, 0) AS DOUBLE) + vv.v) /
        |              (CAST(coalesce(cb.c, 0) AS DOUBLE) + 1.0) AS inv
        |       FROM (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM cbi) x
        |       LEFT JOIN cb USING (w1, w2) LEFT JOIN cu USING (w1) CROSS JOIN vv),
        |per AS (SELECT doc_id, count(*) AS n_bigrams,
        |               list_reduce(list_sort(list(inv)), (a, b) -> a + b) AS s
        |        FROM sc GROUP BY 1)
        |SELECT c.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
        |       per.s / per.n_bigrams AS mean_inv_p
        |FROM cand c LEFT JOIN per USING (doc_id)""".stripMargin,


    "q_keywords" ->
      """WITH tf AS (SELECT doc_id, tok AS term, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |                  FROM documents) GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |sc AS (SELECT doc_id, term,
        |              CAST(tf AS DOUBLE) *
        |                ((nn.n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) AS score
        |       FROM tf JOIN dft USING (term) CROSS JOIN nn)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, score FROM (
        |  SELECT doc_id, term, score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM sc)
        |WHERE rn <= 5""".stripMargin,


    "q_heaps" ->
      """WITH fs AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS first FROM
        |            (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
        |             FROM documents) GROUP BY 1),
        |v AS (SELECT CAST(sum(CASE WHEN first <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS v500,
        |             CAST(sum(CASE WHEN first <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS v1000,
        |             CAST(sum(CASE WHEN first <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS v2000,
        |             CAST(sum(CASE WHEN first <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS v4000
        |      FROM fs),
        |d AS (SELECT CAST(sum(CASE WHEN doc_id <= 500 THEN 1 ELSE 0 END) AS BIGINT) AS d500,
        |             CAST(sum(CASE WHEN doc_id <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS d1000,
        |             CAST(sum(CASE WHEN doc_id <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS d2000,
        |             CAST(sum(CASE WHEN doc_id <= 4000 THEN 1 ELSE 0 END) AS BIGINT) AS d4000
        |      FROM documents)
        |SELECT CAST(500 AS BIGINT) AS checkpoint, d500 AS n_docs, v500 AS vocab FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 1000, d1000, v1000 FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 2000, d2000, v2000 FROM v CROSS JOIN d
        |UNION ALL
        |SELECT 4000, d4000, v4000 FROM v CROSS JOIN d""".stripMargin,
  )
}
