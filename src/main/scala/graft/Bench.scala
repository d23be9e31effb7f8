package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop write forces FULL evaluation of every output column (count()
    // lets Catalyst prune unreferenced projections, so pure-projection
    // queries would only measure the Parquet scan). Failures propagate:
    // a broken query must not bench "fast and green".
    // releaseCaches after each query: operator-internal caches (the
    // nearDuplicates signature table) must not leak across queries —
    // both for memory hygiene and so no query benches against another
    // query's warm cache.
    // JVM/codegen warm-up outside the timed region: without it the
    // first query benched absorbs ~3 s of JIT + Spark init, and map
    // iteration order decides which query that is (BENCH_r03's
    // q_text_stats vs r2's — same query, 5× apart).
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b: iterate on specific queries
    // without paying the full suite (driver runs leave it unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = selected.map { case (name, fn) =>
      // settle the heap between queries: without this, whichever query
      // follows an allocation-heavy one absorbs its GC debt (observed
      // 2-4x swings on the same query across runs)
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.releaseCaches()
      name -> dt
    }
    // 3-decimal (millisecond) formatting: full double precision made
    // the one-line JSON ~2x longer and the driver's log tail truncated
    // it mid-line at r7 (43 of 115 queries lost, "parsed": null) —
    // sub-ms digits carry no information at these run times anyway.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
