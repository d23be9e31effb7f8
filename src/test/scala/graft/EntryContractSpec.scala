package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the full query/oracle maps —
  * cheap string-level checks that catch wiring regressions before
  * the (slow) external oracle gate does. */
class EntryContractSpec extends AnyFunSuite {

  // Touch EntryHelpers FIRST: its sharedFixtureQueries val once
  // forced EntryVector's init mid-way through EntryHelpers' own init,
  // baking this object's still-null SQL fragments into EntryVector's
  // oracle strings. If this suite runs before any other entry-map
  // consumer, this ordering reproduces that cycle; the null-token
  // check below is the tripwire either way.
  private val fixtures = EntryHelpers.sharedFixtureQueries

  /** Rows gated on row-count only (no SQL-expressible oracle).
    * Empty since r13: q_hits_fast gained a full hash oracle (its
    * unnormalized scores are exact integers — see EntryGraph). */
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle (or is a declared rows-only twin)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly,
      s"queries without oracle SQL: ${(missing -- rowsOnly).toSeq.sorted.mkString(", ")}")
  }

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracle entries without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no oracle SQL carries a null-interpolated fragment") {
    // a Scala `null` reaching string interpolation renders as the
    // lowercase token `null`; the SQL itself only ever uses NULL —
    // an object-initialization cycle between the entry objects
    // produced exactly this (14 ANN rows failed the sf0.1 gate with
    // `syntax error at or near "null"`)
    val nullTok = "\\bnull\\b".r
    val infected = SparkEntry.oracleSql.collect {
      case (name, sql) if nullTok.findFirstIn(sql).isDefined => name
    }
    assert(infected.isEmpty,
      s"oracle SQL with a lowercase null token (init-order cycle?): " +
        s"${infected.toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL is well-formed at the string level") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
      assert(sql.toUpperCase.contains("SELECT"), s"$name: no SELECT in oracle SQL")
    }
    assert(fixtures.subsetOf(SparkEntry.queries.keySet),
      "warmable fixture names must all be real queries")
  }

  test("SessionMemo evicts a stopped session's entries and unpersists cached values") {
    // VERDICT r13 item 4. The deadness predicate is injected because a
    // REAL SparkSession.stop() stops the JVM-global SparkContext sbt's
    // shared test session rides — the production default
    // (sparkContext.isStopped) is a one-line seam over the same sweep.
    val spark = TestSpark.spark
    val dead = scala.collection.mutable.Set.empty[org.apache.spark.sql.SparkSession]
    val memo = new EntryHelpers.SessionMemo[org.apache.spark.sql.DataFrame](
      isDead = dead.contains)
    import spark.implicits._
    val df = memo.getOrElseUpdate(spark, "fixture") {
      val d = Seq((1L, "a"), (2L, "b")).toDF("id", "v").persist()
      d.count(); d
    }
    assert(memo.holds(spark), "live session entry must be held")
    assert(df.storageLevel.useMemory, "fixture must be cached while live")
    // a sweep with the session alive is a no-op
    memo.evictStopped()
    assert(memo.holds(spark))
    // mark the session dead: the next access (or explicit evict)
    // drops the entry and unpersists the cached value
    dead += spark
    memo.evictStopped()
    assert(!memo.holds(spark), "dead session entry must be dropped")
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "dead session's cached fixture must be unpersisted")
    // accessing the memo WITH a dead session refuses (review r14):
    // memoizing a value built against it would re-insert the very pin
    // the sweep just removed
    intercept[IllegalArgumentException] {
      memo.getOrElseUpdate(spark, "fixture")(Seq((9L, "x")).toDF("id", "v"))
    }
    assert(!memo.holds(spark), "a refused access must not insert")
    // and a fresh entry for a (newly) live session works again
    dead -= spark
    val again = memo.getOrElseUpdate(spark, "fixture")(
      Seq((3L, "c")).toDF("id", "v"))
    assert(memo.holds(spark) && again.count() == 1L)
  }

  test("SessionMemo sweep unpersists Datasets nested inside Product values") {
    // ADVICE r14: the model memos hold tuples / case classes whose
    // FIELDS are persisted DataFrames (lrModelMemo's (DataFrame,
    // Standardizer, model), the NB weight tables) — a sweep that only
    // matches direct Dataset values leaks those blocks on eviction
    val spark = TestSpark.spark
    val dead = scala.collection.mutable.Set.empty[org.apache.spark.sql.SparkSession]
    val memo = new EntryHelpers.SessionMemo[
      (org.apache.spark.sql.DataFrame, (String, org.apache.spark.sql.DataFrame))](
      isDead = dead.contains)
    import spark.implicits._
    val (a, (_, b)) = memo.getOrElseUpdate(spark, "m") {
      val x = Seq((1L, "a")).toDF("id", "v").persist()
      val y = Seq((2L, "b")).toDF("id", "v").persist()
      x.count(); y.count()
      (x, ("model", y))
    }
    assert(a.storageLevel.useMemory && b.storageLevel.useMemory)
    dead += spark
    memo.evictStopped()
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "tuple-direct cached DataFrame must be unpersisted on eviction")
    assert(b.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "NESTED cached DataFrame (inside a Product field) must be unpersisted")
  }

  test("stopped-session temp dirs are swept, live sessions' dirs survive") {
    // VERDICT r14 item 5: JVM-exit-only cleanup accumulates
    // per-session artifact dirs forever in a long-lived service JVM.
    // The deadness predicate is the same test seam as SessionMemo's —
    // a real .stop() would kill sbt's shared context.
    val spark = TestSpark.spark
    val s2 = spark.newSession() // distinct session object → distinct UUID tag
    val liveDir = new java.io.File(
      EntryHelpers.sessionTmpDir(spark, "sweepspec", "live"))
    val deadDir = new java.io.File(
      EntryHelpers.sessionTmpDir(s2, "sweepspec", "dead"))
    liveDir.mkdirs(); deadDir.mkdirs()
    assert(liveDir.isDirectory && deadDir.isDirectory)
    assert(liveDir.getPath != deadDir.getPath,
      "per-session tags must give distinct dirs")
    EntryHelpers.sweepStoppedSessionTmpDirs(isDead = _ eq s2)
    assert(!deadDir.exists, "the stopped session's dir must be deleted")
    assert(liveDir.isDirectory, "a live session's dir must survive the sweep")
    // a re-registered dir for a live session still lands at the same
    // path (the registry sweep must not have evicted the live entry)
    assert(EntryHelpers.sessionTmpDir(spark, "sweepspec", "live")
      == liveDir.getPath)
  }
}
