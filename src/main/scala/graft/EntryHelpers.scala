package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}

/** Shared fixtures and DuckDB CTE builders used across the Entry*
  * domain slices (split from SparkEntry — VERDICT r10 item 7).
  * Everything here was previously a private member of SparkEntry;
  * bodies are unchanged. */
private[graft] object EntryHelpers {

  import KMeans.FirstK

  /** Per-(live session, key) fixture memo. Keys the outer map by the
    * SESSION OBJECT inside a `java.util.WeakHashMap` (identity
    * semantics — SparkSession does not override equals), not by
    * `System.identityHashCode` (ADVICE r12): an identity hash is not
    * unique, so after an old session was GC'd a NEW session could
    * collide with the dead session's string key and be served a
    * cached DataFrame bound to the stopped session. Object-keyed
    * entries cannot be resurrected by construction.
    *
    * Eviction (VERDICT r13 item 4): a DataFrame VALUE strongly
    * references its session, and WeakHashMap treats value→key
    * references as pinning, so GC alone never collects
    * DataFrame-valued entries. The memo therefore SWEEPS stopped
    * sessions itself — on every access and via `evictStopped()` —
    * dropping their entries (and unpersisting any DataFrame values,
    * best-effort) so a dead session's plans and cached-block
    * registrations stop living to JVM exit. `isDead` is injectable
    * for tests only: a real context stop is JVM-global under sbt's
    * shared test session, so the spec drives the sweep through the
    * predicate seam instead of stopping the suite's context. */
  final class SessionMemo[T](
      isDead: SparkSession => Boolean = s => s.sparkContext.isStopped) {
    private val m =
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, T]]()
    def getOrElseUpdate(s: SparkSession, key: String)(build: => T): T =
      synchronized {
        sweepLocked()
        // refuse the INCOMING session too (review r14): memoizing a
        // value built against a stopped session would re-insert the
        // very pin the sweep just removed, and it would live until
        // some later access happens to sweep again
        require(!isDead(s),
          "SessionMemo access with a stopped SparkSession — the caller is " +
            "computing against a dead session")
        var per = m.get(s)
        if (per == null) {
          per = scala.collection.mutable.Map.empty[String, T]
          m.put(s, per)
        }
        per.getOrElseUpdate(key, build)
      }
    /** Drop every stopped session's entries now (also runs on each
      * access — this is for callers that stop a session and want the
      * memory back before the next memo touch). */
    def evictStopped(): Unit = synchronized { sweepLocked() }
    private[graft] def holds(s: SparkSession): Boolean =
      synchronized { m.containsKey(s) }
    private def sweepLocked(): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k != null && isDead(k)) {
          // best-effort unpersist: with the context genuinely stopped
          // the blocks died with the executors and the call may throw;
          // removing the entry is what releases the references either way.
          // Values may be tuples/case classes CONTAINING persisted
          // Datasets (lrModelMemo's (DataFrame, Standardizer, model),
          // the NB models' weight tables — ADVICE r14), so recurse
          // through Product structure, not just direct Dataset values.
          e.getValue.values.foreach(unpersistValue)
          it.remove()
        }
      }
    }
    private def unpersistValue(v: Any): Unit = v match {
      case ds: org.apache.spark.sql.Dataset[_] =>
        try { ds.unpersist(); () } catch { case _: Exception => () }
      case p: Product => p.productIterator.foreach(unpersistValue)
      case _ => ()
    }
  }

  /** One random UUID-derived tag per live session (ADVICE r13): the
    * session-unique temp paths used to suffix on
    * `identityHashCode(session)`, which is NOT unique — two concurrent
    * gate layouts could collide on one directory with ~2⁻³² probability
    * per pair. A UUID cannot. String-valued, so the memo entry is
    * collectable with its session. */
  private val sessionTagMemo = new SessionMemo[String]
  def sessionTag(s: SparkSession): String =
    sessionTagMemo.getOrElseUpdate(s, "tag") {
      java.util.UUID.randomUUID().toString.replace("-", "")
    }

  /** Session- and sfDir-unique temp directory for the persistence /
    * file-round-trip queries, registered for recursive deletion at JVM
    * exit (ADVICE r13: the old dirs were never cleaned up and
    * accumulated across sessions — and since the suffix is a fresh
    * UUID per session, no other process can be reading them).
    *
    * Stopped-session sweep (VERDICT r14 item 5): JVM-exit-only
    * cleanup lets a long-lived service JVM running many sessions
    * accumulate per-session index/artifact dirs indefinitely, so each
    * dir also records its owning session (weakly — the registry must
    * not keep a dead session reachable) and
    * `sweepStoppedSessionTmpDirs()` deletes every dir whose owner is
    * stopped or already GC'd. It runs on every sessionTmpDir call —
    * the same access-time discipline as SessionMemo's sweep — and is
    * callable directly for explicit eviction.
    *
    * Ownership contract (review r15): a dir's lifetime is its owning
    * session's REACHABILITY, so do not smuggle a sessionTmpDir path
    * to other sessions and then drop the owner — once the owner is
    * GC'd the next sweep deletes the dir even if another session
    * still reads it by raw path. That is the designed trade: with
    * local-mode sessions sharing one SparkContext, `isStopped` is
    * JVM-global, so the GC'd-owner branch is the ONLY per-session
    * cleanup trigger a long-lived service JVM has; dropping it would
    * re-open the unbounded-accumulation hole this sweep closed
    * (VERDICT r14 item 5). Artifacts that must outlive their session
    * belong in caller-owned paths (saveLR/savePQ/writeMinhashIndex
    * etc. take explicit destinations), not in session temp dirs. */
  private val tmpDirRegistry = scala.collection.mutable.Map
    .empty[String, java.lang.ref.WeakReference[SparkSession]]
  private var cleanupHookInstalled = false
  def sessionTmpDir(s: SparkSession, family: String, dir: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_${family}_" +
      Integer.toHexString(dir.hashCode) + "_" + sessionTag(s)
    tmpDirRegistry.synchronized {
      sweepLockedTmpDirs(sess => sess.sparkContext.isStopped)
      tmpDirRegistry(p) = new java.lang.ref.WeakReference(s)
      if (!cleanupHookInstalled) {
        cleanupHookInstalled = true
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          tmpDirRegistry.synchronized(tmpDirRegistry.keys.toSeq)
            .foreach(deleteTmpDir)))
      }
    }
    p
  }
  /** Delete every registered temp dir whose owning session satisfies
    * `isDead` (or was GC'd). The predicate is a seam for tests only —
    * a real context stop is JVM-global under sbt's shared session. */
  def sweepStoppedSessionTmpDirs(
      isDead: SparkSession => Boolean = s => s.sparkContext.isStopped): Unit =
    tmpDirRegistry.synchronized { sweepLockedTmpDirs(isDead) }
  private def sweepLockedTmpDirs(isDead: SparkSession => Boolean): Unit =
    tmpDirRegistry.filterInPlace { (d, ref) =>
      val owner = ref.get()
      val dead = owner == null || isDead(owner)
      if (dead) deleteTmpDir(d)
      !dead
    }
  private def deleteTmpDir(d: String): Unit = {
    // best-effort PER DIR (review r14): any exception —
    // IllegalArgumentException for a path that is a plain file, not
    // just IOException — must not abort deletion of the remaining
    // registered dirs
    try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    catch { case _: Exception => () }
  }

  /** Shared fixed-centroid set for the oracle-checked K-Means queries:
    * the 8 lowest-vec_id embedding rows, renumbered 1..8 (FirstK). */
  def cents8(s: SparkSession, dir: String): KMeans.Centroids =
    KMeans.initCentroids(Tables(s, dir, "embeddings"), "vec_id", "embedding", FirstK(8))

  /** Shared md5-parity near-dup pair chain (n=3, h=16, b=8,
    * minSim=0.5) — the edge source the graph family and the
    * split-leakage queries all open with. Memoized per (session,
    * sfDir) and eagerly persisted OUTSIDE Dedup's releaseCaches
    * lifecycle: Bench warms it once outside the timed region
    * (VERDICT r8 item 3) so per-query seconds report the graph
    * operator under test, not a repeated identical ~2-3 s MinHash
    * rebuild of the same relation. Verify shares the memo — same
    * relation, computed once. Correctness is untouched: this IS the
    * chain each query previously inlined, evaluated once. If blocks
    * were ever evicted (not at these sizes — the pair table is tiny)
    * the lineage recomputes the chain from parquet, still correct. */
  val sharedPairsMemo = new SessionMemo[DataFrame]
  def nearDupPairs05(s: SparkSession, dir: String): DataFrame =
    sharedPairsMemo.getOrElseUpdate(s, dir) {
      val p = Dedup.nearDuplicates(Tables(s, dir, "documents"), "doc_id", "text",
        n = 3, h = 16, b = 8, minSim = 0.5, parity = true).persist()
      p.count() // materialize eagerly so no query absorbs the build
      Dedup.releaseCaches() // the chain's internals; the fixture stays
      p
    }

  /** Trained BPE merge rules (6 rounds over documents.text) — shared
    * by q_bpe_encode / q_bpe_compression. Training is a vocab-sized
    * driver loop both queries used to replay INSIDE the timed region
    * (VERDICT r9 item 4 — the same conflation the graph family fixed
    * with the pair fixture), so the encode benchmarks measured mostly
    * training. The memo holds the 6 collected merge pairs — driver-
    * side metadata, not a plan — so warming costs one training run. */
  val bpeMergesMemo = new SessionMemo[Seq[(String, String)]]
  def bpeMerges6(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeMergesMemo.getOrElseUpdate(s, dir) {
      Tokenizer.bpeTrain(Tables(s, dir, "documents"), "text", merges = 6).collect()
        .sortBy(_.getLong(0))
        .map(r => { val Array(l, rr) = r.getString(1).split(" ", 2); (l, rr) })
        .toSeq
    }

  /** The gate unigram-LM vocabulary (vocabSize=60, rounds=1, L=4,
    * maxWordLen=16) — the bpeMerges6 convention: encode rows time
    * ENCODING, not training; q_unigram_train is the row that times
    * training. The memo holds the collected model — driver-side
    * metadata (vocabSize-bounded), not a plan. */
  val unigramModelMemo =
    new SessionMemo[graft.operators.UnigramTokenizer.UnigramModel]
  def unigramModel60(s: SparkSession, dir: String)
      : graft.operators.UnigramTokenizer.UnigramModel =
    unigramModelMemo.getOrElseUpdate(s, dir) {
      graft.operators.UnigramTokenizer.train(Tables(s, dir, "documents"),
        "text", vocabSize = 60, rounds = 1, maxPieceLen = 4, maxWordLen = 16)
    }

  /** Queries that open with a shared warmable fixture — Bench warms
    * the relevant ones outside the timed region iff selected. */
  val pairFixtureQueries: Set[String] = Set(
    "q_components", "q_components_star", "q_pagerank", "q_degree_hist",
    "q_triangles", "q_kcore", "q_assortativity", "q_label_prop",
    "q_leakage", "q_split_clean", "q_bfs_dist", "q_sssp",
    "q_ppr", "q_comp_sizes", "q_closeness")
  val bpeFixtureQueries: Set[String] = Set(
    "q_bpe_encode", "q_bpe_compression", "q_bpe_persist")
  // q_unigram_train is deliberately NOT listed — it times training
  val unigramFixtureQueries: Set[String] =
    Set("q_unigram_encode", "q_unigram_persist", "q_unigram_compression")
  // Trained-model fixtures: q_lr_train / q_nb_train / q_lr_holdout
  // are deliberately NOT listed — they are the rows that time
  // training. The name sets live HERE (not in EntryVector) because
  // this val participates in object initialization: a val initializer
  // reaching into EntryVector would force EntryVector's init while
  // THIS object is mid-init, and EntryVector's oracle-SQL vals would
  // capture this object's still-null sqlCents8/sqlProbes fragments
  // (the EntryVector defs called in warmSharedFixtures below are
  // runtime calls — safe).
  val lrFixtureQueries: Set[String] =
    Set("q_lr_score", "q_lr_eval", "q_lr_calibration", "q_lr_persist",
      "q_stream_score")
  // q_nb_holdout is deliberately NOT listed — like q_lr_holdout it
  // times its own training run (split-scoped, not the shared model)
  val nbFixtureQueries: Set[String] =
    Set("q_nb_score", "q_nb_eval", "q_nb_persist", "q_stream_nb")
  val nbMcFixtureQueries: Set[String] =
    Set("q_nb_classes", "q_nb_predict", "q_nbmc_persist")
  val sharedFixtureQueries: Set[String] =
    pairFixtureQueries ++ bpeFixtureQueries ++ unigramFixtureQueries ++
      lrFixtureQueries ++ nbFixtureQueries ++ nbMcFixtureQueries

  def warmSharedFixtures(s: SparkSession, dir: String,
                         selected: Set[String] = sharedFixtureQueries): Unit = {
    if (selected.exists(pairFixtureQueries)) { nearDupPairs05(s, dir); () }
    if (selected.exists(bpeFixtureQueries)) { bpeMerges6(s, dir); () }
    if (selected.exists(unigramFixtureQueries)) { unigramModel60(s, dir); () }
    if (selected.exists(lrFixtureQueries)) {
      EntryVector.lrModelShared(s, dir); ()
    }
    if (selected.exists(nbFixtureQueries)) {
      EntryVector.nbModelShared(s, dir); ()
    }
    if (selected.exists(nbMcFixtureQueries)) {
      EntryVector.nbMcModelShared(s, dir); ()
    }
  }

  /** Unique memory-sink names for the streaming queries (a query
    * function may run more than once per session — Bench reps). */
  val streamSinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Pins spark.sql.shuffle.partitions for the duration of a
    * MemoryStream rig (VERDICT r11 item 2): a stateful micro-batch
    * pays one state-store commit PER shuffle partition PER operator
    * PER batch, so 32 partitions over a <=100k-row fixture is pure
    * rig overhead (~32x more store commits than data warrants). The
    * stream's state partition count is fixed at query START, so the
    * pin must wrap .start(); the previous value is restored after.
    * Correctness-neutral by construction: the dual-layout driver gate
    * (4 vs 32 cores = 4 vs 32 shuffle partitions) already requires
    * every streaming row's output to be partition-count-independent.
    * Production jobs size this knob to their data; the rig sizes it
    * to the fixture. */
  def withStreamRigConf[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "4")
    try body finally s.conf.set(key, prev)
  }

  /** Canonical collected micro-batch feeds, shared by every streaming
    * fixture (VERDICT r11 item 2): each of the 15 MemoryStream rigs
    * used to re-collect its own projection of the same documents /
    * events table — identical rows, ~30 driver collects per bench
    * run for zero added coverage. MemoryStream is fed from the
    * driver BY DEFINITION (production sources are files/Kafka), so
    * the feed is fixture machinery, not operator surface; collecting
    * once per (session, sfDir) and deriving each rig's projection +
    * sort driver-side (in-memory over ≤100k rows) changes nothing a
    * gate can see. Casts mirror the per-fixture selects they replace
    * (ids/ts → long). Sorted by id at collect so every derived sort
    * is deterministic (stable sort over a deterministic base).
    * Keyed by sfDir ALONE (review r12): the rows depend only on the
    * data directory, so a second session (the dual-layout gate) must
    * reuse the collect, not duplicate the arrays per session. */
  val docFeedMemo =
    scala.collection.mutable.Map.empty[String, Array[(Long, String, String, Long)]]
  /** documents → (doc_id, text, source, n_chars), doc_id-sorted. */
  def docFeed(s: SparkSession, dir: String): Array[(Long, String, String, Long)] =
    synchronized {
      docFeedMemo.getOrElseUpdate(dir, {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id").cast("long"), col("text"), col("source"),
            col("n_chars").cast("long"))
          .as[(Long, String, String, Long)].collect().sortBy(_._1)
      })
    }

  val eventFeedMemo =
    scala.collection.mutable.Map.empty[String, Array[(Long, Long, Long, String, Double)]]
  /** events → (event_id, ts, user_id, event_type, value), id-sorted. */
  def eventFeed(s: SparkSession, dir: String): Array[(Long, Long, Long, String, Double)] =
    synchronized {
      eventFeedMemo.getOrElseUpdate(dir, {
        import s.implicits._
        Tables(s, dir, "events")
          .select(col("event_id").cast("long"), col("ts").cast("long"),
            col("user_id").cast("long"), col("event_type"), col("value"))
          .as[(Long, Long, Long, String, Double)].collect().sortBy(_._1)
      })
    }

  /** DuckDB CTEs mirroring cents8 + one assignment pass. */
  val sqlCents8 =
    """c AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
      |         embedding::DOUBLE[] AS cvec
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)
      |),
      |d AS (
      |  SELECT e.vec_id, c.cid,
      |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c.cvec),
      |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
      |  FROM embeddings e CROSS JOIN c
      |),
      |a AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT vec_id, cid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |    FROM d) WHERE rn = 1
      |)""".stripMargin


  /** DuckDB CTEs for the 2-step Lloyd parity loop (q_kmeans_fit2 /
    * q_kmeans_fit_meta): extends sqlCents8's (c, d, a) with the
    * posexplode'd values (x), step-1 sorted-fold centroids (c1), their
    * vector form (c1v), step-2 assignment (d2, a2), and step-2
    * centroids (c2). Means use list_reduce(list_sort(...)) — the same
    * sorted-fold contract as q_centroid_update, bit-exact vs Spark. */
  val sqlFit2 =
    s"""$sqlCents8,
       |x AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
       |         CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings
       |),
       |c1 AS (
       |  SELECT a.cluster, x.pos,
       |         list_reduce(list_sort(list(x.v)), (acc, e) -> acc + e) / count(*) AS val
       |  FROM a JOIN x USING (vec_id) GROUP BY 1, 2
       |),
       |c1v AS (SELECT cluster AS cid, list(val ORDER BY pos) AS cvec FROM c1 GROUP BY 1),
       |d2 AS (
       |  SELECT e.vec_id, c1v.cid,
       |         list_sum(list_transform(list_zip(e.embedding::DOUBLE[], c1v.cvec),
       |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
       |  FROM embeddings e CROSS JOIN c1v
       |),
       |a2 AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1
       |),
       |c2 AS (
       |  SELECT a2.cluster, x.pos,
       |         list_reduce(list_sort(list(x.v)), (acc, e) -> acc + e) / count(*) AS val
       |  FROM a2 JOIN x USING (vec_id) GROUP BY 1, 2
       |)""".stripMargin

  /** DuckDB CTEs mirroring Dedup.shingles/shingleHashes(parity)/
    * minhashSignature/bandBuckets (trigram shingles, one md5-derived
    * 32-bit base hash per shingle, H=16 integer universal-hash minima
    * (a_i·x + b_i) mod 2^31-1, 8 bands × 2 rows). DuckDB list slicing
    * is end-inclusive, hence the [lo : bi*2] bounds. */
  /** Same CTE chain over an arbitrary source relation (the pipeline
    * query runs it over the already-filtered document set), with an
    * optional CTE-name prefix so two chains (e.g. corpus + batch in
    * q_incremental) can coexist in one WITH. */
  def sqlSigChainOn(src: String, p: String): String =
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
      |${p}sh AS (
      |  SELECT doc_id,
      |         list_distinct([array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS sh
      |  FROM ${p}toks WHERE len(toks) >= 3
      |),
      |${p}hs AS (
      |  SELECT doc_id, sh,
      |         list_transform(sh, s -> CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT)) AS hs
      |  FROM ${p}sh WHERE len(sh) > 0
      |),
      |${p}sig AS (
      |  SELECT doc_id, sh,
      |         [list_min([((1299721*i+7)*x + 104729*i) % 2147483647 for x in hs]) for i in range(1, 17)] AS sig
      |  FROM ${p}hs
      |),
      |${p}bb AS (
      |  SELECT doc_id, CAST(bi AS INTEGER) AS band,
      |         array_to_string(sig[(bi-1)*2+1 : bi*2], ',') AS bucket
      |  FROM ${p}sig CROSS JOIN generate_series(1, 8) t(bi)
      |)""".stripMargin

  /** The BPE greedy left-to-right merge fold as a DuckDB list_reduce —
    * requires an in-scope relation alias `m` with columns l, r (the
    * round's merge pair). Identical semantics to Tokenizer.mergeFold:
    * append each symbol unless the accumulator's last symbol is l and
    * the incoming one is r, in which case the tail rewrites to the
    * merged symbol (so a just-merged symbol never re-merges within the
    * round). */
  def sqlBpeFold(listExpr: String): String =
    s"""list_reduce($listExpr, (acc, x) -> CASE
       |      WHEN (acc = m.l OR right(acc, len(m.l)+1) = ' ' || m.l) AND x = m.r
       |      THEN CASE WHEN acc = m.l THEN m.l || x
       |                ELSE left(acc, len(acc)-len(m.l)-1) || ' ' || m.l || x END
       |      ELSE acc || ' ' || x END)""".stripMargin

  /** Unrolled BPE training chain over `documents` — the oracle twin of
    * Tokenizer.bpeTrain: w0 = char-split word vocabulary; then per
    * round r: p{r} weighted pair counts, m{r} the argmax merge (count
    * desc, pair asc — the same pair-STRING tie-break as the engine),
    * w{r} the fold-rewritten vocabulary. */
  def sqlBpeChain(rounds: Int): String = {
    val w0 =
      """w0 AS (
        |  SELECT array_to_string([w[i] for i in range(1, len(w)+1)], ' ') AS sym,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1
        |)""".stripMargin
    val per = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([ss[i] || ' ' || ss[i+1] for i in range(1, len(ss))]) AS pr
         |        FROM (SELECT string_split(sym, ' ') AS ss, cnt FROM w${r - 1}))
         |  GROUP BY pr
         |),
         |m$r AS (
         |  SELECT pair, c, split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r
         |  FROM p$r ORDER BY c DESC, pair LIMIT 1
         |),
         |w$r AS (
         |  SELECT ${sqlBpeFold("string_split(w.sym, ' ')")} AS sym, w.cnt
         |  FROM w${r - 1} w CROSS JOIN m$r m
         |)""".stripMargin
    }
    (w0 +: per).mkString(",\n")
  }

  def sqlMinhashOn(src: String): String = sqlSigChainOn(src, "")

  val sqlMinhash = sqlMinhashOn("documents")

  /** Shared CTE pair: banded-LSH candidates + exact Jaccard — the ONE
    * place the oracle states candidate-pair semantics; q_neardup_pairs,
    * q_components, and q_cluster_dedup all build on `simpairs` so a
    * future change cannot desynchronize them. */
  val sqlCandJaccard =
    """cand AS (
      |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
      |  FROM bb x JOIN bb y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
      |),
      |simpairs AS (
      |  SELECT c.id1, c.id2,
      |         CAST(len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) /
      |         CAST(len(s1.sh) + len(s2.sh) - len(list_distinct(list_intersect(s1.sh, s2.sh))) AS DOUBLE) AS sim
      |  FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.id1
      |  JOIN sh s2 ON s2.doc_id = c.id2
      |)""".stripMargin

  /** Shared CTE chain: minhash pairs (Jaccard ≥ 0.5) → symmetric
    * edges → recursive min-reachable closure. Used by q_components
    * and q_cluster_dedup. */
  val sqlNearDupReach =
    s"""RECURSIVE $sqlMinhash,
       |$sqlCandJaccard,
       |pairs AS (SELECT id1, id2 FROM simpairs WHERE sim >= 0.5),
       |edges AS (
       |  SELECT id1 AS a, id2 AS b FROM pairs
       |  UNION
       |  SELECT id2 AS a, id1 AS b FROM pairs
       |),
       |reach(id, comp) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.id
       |)""".stripMargin

  /** Shared CTE chain: minhash near-dup pairs → symmetric `edges`
    * (src, dst) WITHOUT the recursive closure — the graph-operator
    * oracles (q_pagerank, q_degree_hist) build on this. */
  val sqlNearDupEdges =
    s"""$sqlMinhash,
       |$sqlCandJaccard,
       |prpairs AS (SELECT id1, id2 FROM simpairs WHERE sim >= 0.5),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM prpairs
       |  UNION
       |  SELECT id2 AS src, id1 AS dst FROM prpairs
       |)""".stripMargin

  /** DuckDB cosine similarity mirroring VectorOps.cosine: sequential
    * list folds for dot and norms, sqrt each norm then multiply. */
  def sqlCosine(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), q -> q[1]*q[2]))
       | / (sqrt(list_sum(list_transform(list_zip($a, $a), q -> q[1]*q[2])))
       |    * sqrt(list_sum(list_transform(list_zip($b, $b), q -> q[1]*q[2]))))""".stripMargin

  /** DuckDB CTEs mirroring Similarity.hyperplanes/lshBuckets: 8 tables
    * × 4 md5-derived hyperplanes over d=64, sign-bit bucket strings.
    * Every coordinate is exact integer / 2^32 arithmetic, so buckets
    * are bit-identical cross-engine. */
  val sqlAnnIndex =
    """planes AS (
      |  SELECT l, i,
      |         [CAST(concat('0x', substr(md5(l || ':' || i || ':' || j), 1, 8)) AS BIGINT)
      |            / 4294967296.0 * 2 - 1
      |          for j in range(1, 65)] AS hv
      |  FROM generate_series(1, 8) t1(l) CROSS JOIN generate_series(1, 4) t2(i)
      |),
      |bits AS (
      |  SELECT e.vec_id, p.l, p.i,
      |         CASE WHEN list_sum(list_transform(list_zip(e.embedding::DOUBLE[], p.hv),
      |                                           q -> q[1]*q[2])) >= 0
      |              THEN '1' ELSE '0' END AS bit
      |  FROM embeddings e CROSS JOIN planes p
      |),
      |bk AS (
      |  SELECT vec_id, CAST(l AS INTEGER) AS tbl, string_agg(bit, '' ORDER BY i) AS bucket
      |  FROM bits GROUP BY vec_id, l
      |)""".stripMargin

  /** Corpus-adaptive twin of sqlAnnIndex for q_embed_neardup: plane
    * count = Dedup.autoBits(count) replayed with the SAME integer
    * arithmetic ((n+31)//32 ceil-div, then ceil-log2 as the binary
    * digit count of q-1 — never a floating log2, whose rounding at
    * exact powers of two could differ across engines). This keeps the
    * oracle hash-exact at ANY verify scale, not just where
    * autoBits(n) happens to equal 4. */
  val sqlAnnIndexAuto =
    """ab AS (
      |  SELECT GREATEST(4, CASE WHEN q <= 1 THEN 0 ELSE length(printf('%b', q - 1)) END) AS bits
      |  FROM (SELECT (count(*) + 31) // 32 AS q FROM embeddings)
      |),
      |planes AS (
      |  SELECT l, i,
      |         [CAST(concat('0x', substr(md5(l || ':' || i || ':' || j), 1, 8)) AS BIGINT)
      |            / 4294967296.0 * 2 - 1
      |          for j in range(1, 65)] AS hv
      |  FROM generate_series(1, 8) t1(l)
      |  CROSS JOIN (SELECT unnest(range(1, (SELECT bits FROM ab) + 1)) AS i) t2
      |),
      |pbits AS (
      |  SELECT e.vec_id, p.l, p.i,
      |         CASE WHEN list_sum(list_transform(list_zip(e.embedding::DOUBLE[], p.hv),
      |                                           q -> q[1]*q[2])) >= 0
      |              THEN '1' ELSE '0' END AS bit
      |  FROM embeddings e CROSS JOIN planes p
      |),
      |bk AS (
      |  SELECT vec_id, CAST(l AS INTEGER) AS tbl, string_agg(bit, '' ORDER BY i) AS bucket
      |  FROM pbits GROUP BY vec_id, l
      |)""".stripMargin

  /** Probe set shared by the similarity-search oracles: the 5
    * lowest-vec_id embedding rows. */
  val sqlProbes =
    """pr AS (
      |  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 5)
      |)""".stripMargin

  /** BM25 CTE chain + score expression, shared by q_bm25 and q_rrf
    * (TextAnalysis.bm25Score twin: k1=1.2, b=0.75, terms
    * table/spark/value, rational Robertson idf). */
  val sqlBm25Ctes =
    """base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |t AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
      |         CAST(len(list_filter(toks, x -> x = 'table')) AS BIGINT) AS tf0,
      |         CAST(len(list_filter(toks, x -> x = 'spark')) AS BIGINT) AS tf1,
      |         CAST(len(list_filter(toks, x -> x = 'value')) AS BIGINT) AS tf2
      |  FROM base
      |),
      |st AS (
      |  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
      |         CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
      |         CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
      |  FROM t
      |)""".stripMargin

  val sqlBm25Expr =
    """(CAST(n - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5)
      |      * ((CAST(tf0 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf0 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))
      |  + (CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)
      |      * ((CAST(tf1 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf1 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))
      |  + (CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)
      |      * ((CAST(tf2 AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
      |         / (CAST(tf2 AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |            * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
      |               * (CAST(dl AS DOUBLE) / avgdl))))""".stripMargin

  /** DuckDB CTEs mirroring Similarity.trainPQ(maxIter=0)/encodePQ:
    * m=4 subspaces of 16 dims, codewords = the 16 lowest-vec_id rows'
    * subvectors renumbered 1..16 per subspace (FirstK), assignment =
    * argmin sqdist with lowest-cid tie-break. DuckDB list slices are
    * 1-based and end-INCLUSIVE: [j*16+1 : j*16+16]. */
  val sqlPqCodes =
    """cb AS (
      |  SELECT t.j, CAST(row_number() OVER (PARTITION BY t.j ORDER BY f.vec_id) AS INTEGER) AS cid,
      |         (f.embedding::DOUBLE[])[t.j*16+1 : t.j*16+16] AS cw
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16) f CROSS JOIN range(0, 4) t(j)
      |),
      |sub AS (
      |  SELECT e.vec_id, t.j, (e.embedding::DOUBLE[])[t.j*16+1 : t.j*16+16] AS sv
      |  FROM embeddings e CROSS JOIN range(0, 4) t(j)
      |),
      |dpq AS (
      |  SELECT s.vec_id, s.j, cb.cid,
      |         list_sum(list_transform(list_zip(s.sv, cb.cw), p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
      |  FROM sub s JOIN cb ON cb.j = s.j
      |),
      |pqa AS (
      |  SELECT vec_id, j, cid FROM (
      |    SELECT vec_id, j, cid,
      |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
      |    FROM dpq) WHERE rn = 1
      |)""".stripMargin

  /** Shared ADC CTEs (need sqlPqCodes + sqlProbes upstream): per-probe
    * m×k sub-distance tables and the summed approximate distance per
    * (probe, vec) — the ONE place the oracle states ADC semantics
    * (q_pq_topk and q_pq_rerank both build on `ad`). */
  val sqlPqAdc =
    """pt AS (
      |  SELECT pr.probe_id, cb.j, cb.cid,
      |         list_sum(list_transform(list_zip(pr.pv[cb.j*16+1 : cb.j*16+16], cb.cw),
      |                                 p -> (p[1]-p[2])*(p[1]-p[2]))) AS sd
      |  FROM pr CROSS JOIN cb
      |),
      |ad AS (
      |  SELECT pt.probe_id, a.vec_id, list_sum(list(pt.sd ORDER BY a.j)) AS adist
      |  FROM pqa a JOIN pt ON pt.j = a.j AND pt.cid = a.cid
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** DuckDB CTEs mirroring Dedup.simhash: per-token 64 bits from the
    * md5 digest (4 × 16-bit words), ±1 majority vote per bit, hex
    * repack — ends in fpt(doc_id, fp). */
  val sqlSimhashFp =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tb AS (
      |  SELECT doc_id,
      |         generate_subscripts(bits, 1) AS p,
      |         unnest(bits) AS b
      |  FROM (
      |    SELECT doc_id,
      |           flatten([[ (CAST(concat('0x', substr(md5(tok), 1+4*w, 4)) AS BIGINT) // CAST(power(2, j) AS BIGINT)) % 2
      |                      for j in range(15, -1, -1)]
      |                    for w in range(0, 4)]) AS bits
      |    FROM tok)
      |),
      |acc AS (SELECT doc_id, p, sum(2*b - 1) AS s FROM tb GROUP BY 1, 2),
      |dig AS (
      |  SELECT doc_id, (p-1)//4 AS d,
      |         sum((CASE WHEN s > 0 THEN 1 ELSE 0 END) *
      |             (CASE (p-1)%4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS v
      |  FROM acc GROUP BY 1, 2
      |),
      |fpt AS (
      |  SELECT doc_id, string_agg(substr('0123456789abcdef', CAST(v AS INTEGER)+1, 1), '' ORDER BY d) AS fp
      |  FROM dig GROUP BY doc_id
      |)""".stripMargin

  /** DuckDB CTEs mirroring TextAnalysis.winnowMins (k=5, w=4): 5-gram
    * rolling hashes, per-window-of-4 minima — ends in
    * mins(doc_id, mins). */
  val sqlWinnowMins =
    """cs AS (
      |  SELECT doc_id, string_split(text, '') AS cs, length(text) - 4 AS m
      |  FROM documents
      |),
      |hs AS (
      |  SELECT doc_id, m,
      |         CASE WHEN m >= 1 THEN
      |           [list_reduce(list_transform(cs[i:i+4], c -> CAST(ascii(c) AS BIGINT)),
      |                        (acc, c) -> (acc * 31 + c) % 2147483647)
      |            for i in range(1, m + 1)]
      |         ELSE [] END AS hs
      |  FROM cs
      |),
      |mins AS (
      |  SELECT doc_id,
      |         CASE WHEN m < 1 THEN []
      |              WHEN m <= 4 THEN [list_min(hs)]
      |              ELSE [list_min(hs[j:j+3]) for j in range(1, m - 2)]
      |         END AS mins
      |  FROM hs
      |)""".stripMargin

  /** Shared multimodal ingest: documents with the opaque binary
    * payload + typed metadata attached. */
  def mmTable(s: SparkSession, dir: String): DataFrame =
    Multimodal.withContent(Tables(s, dir, "documents"), "doc_id", "text")

  /** Char-trigram profiles for the n-gram language-ID variant. Must
    * match the q_lang_ngram oracle SQL VALUES literally. */
  val NgramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch"),
    "en" -> Seq(" th", "ing", " an"),
    "es" -> Seq(" de", "los", " la"),
    "fr" -> Seq(" le", "ent", "eau"))

  /** Language profiles for the language-ID heuristic. Word lists must
    * match the q_lang_id oracle SQL VALUES literally. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das"),
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"),
    "zh" -> Seq("zhe", "shi", "bu", "wo"))
}
