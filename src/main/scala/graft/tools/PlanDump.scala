package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` for declared queries to text files —
  * the optimization round's before/after plan evidence
  * (plans/r18/<query>_{before,after}.txt; judge checks plan claims
  * against these files without running Spark).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [q_a,q_b,...]
  *   - outDir: directory for the .txt files (created if absent)
  *   - suffix: appended as `<query>_<suffix>.txt` (e.g. before/after)
  *   - optional comma list restricts to named queries (default: all)
  *
  * Building a query's DataFrame may run its driver-side work (model
  * fits, artifact writes) but never executes the returned plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [q_a,q_b,...]")
    val outDir = args(0)
    val suffix = args(1)
    val only = if (args.length >= 3) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val selected = only match {
      case Some(names) => graft.SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => graft.SparkEntry.queries
    }
    if (selected.keys.exists(graft.SparkEntry.sharedFixtureQueries))
      graft.SparkEntry.warmSharedFixtures(spark, sfDir, selected.keySet)
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
        println(s"[plandump] $name -> ${name}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    org.apache.spark.sql.graftglue.ColumnGlue.stopStateStoreMaintenance()
    spark.stop()
  }
}
