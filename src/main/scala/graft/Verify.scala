package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // if events.parquet carries TIMESTAMP(NANOS), surface it as epoch-nano
      // longs (Tables.normalizeEventTs handles the timestamp[us] form)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q_a,q_b: iterate on specific queries
    // locally (unset for the driver's full gate, same as Bench's twin)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    var nFailed = 0
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Loud failure marker (VERDICT r9 item 3): a thrown query used
        // to leave NO result dir, so the driver's correctness JSON
        // simply omitted the row — 15 queries vanished from the r9
        // gate and every artifact still looked green. Leaving a dir
        // containing only _ERROR.txt (no parquet) makes the driver's
        // read fail → the row surfaces red with an err, not absent.
        nFailed += 1
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        val d = Paths.get(s"$outDir/$name")
        try {
          org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
          Files.createDirectories(d)
          Files.writeString(d.resolve("_ERROR.txt"),
            s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(2000)}\n")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name could not write error marker: ${m.getMessage}")
        }
      }
      finally operators.Dedup.releaseCaches()
    }
    if (nFailed > 0)
      System.err.println(s"[verify] $nFailed of ${selected.size} queries FAILED")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
