package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Throwaway step profiler for q_hits's anti-scaling (r19, VERDICT r18
  * item 2: 13.6 s at 32 cores vs ~3.7 s at 8 — ratio 0.27, the suite's
  * worst scaler). Replays Graph.hits's exact per-round shape with
  * wall-clock timers per phase so the degradation is attributed to a
  * measured step (edge prep, the sorted-fold aggregation, the re-anchor
  * join + eager checkpoint, the final join) instead of a guess. Not
  * part of any gate. */
object HitsProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[hitsprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm-up like Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    (1 to 2).foreach { rep =>
      println(s"[hitsprof] === rep $rep (cpus=$cpus) ===")
      val o = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val edges = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      // replay Graph.hits(iters=2, sortedFold=true) stepwise
      val e = t("edge pin (dedup + cache)") {
        val p = graft.operators.Dedup.pin(
          edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
            .filter(col("src") =!= col("dst")).distinct())
        println(s"[hitsprof]   edges=${p.count()}")
        p
      }
      val nodes = t("node pin") {
        val n = graft.operators.Dedup.pin(
          e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
        println(s"[hitsprof]   nodes=${n.count()}")
        n
      }
      def foldedSum(c: org.apache.spark.sql.Column) =
        graft.functions.VectorOps.foldSum(array_sort(collect_list(c)))
      var hubs = nodes.select(col("id"), lit(1.0).as("hub"))
      var auths = hubs
      (1 to 2).foreach { round =>
        val aSums = t(s"r$round aSums agg (collect+fold) plan") {
          e.join(hubs.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst").as("id")).agg(foldedSum(col("hub")).as("s"))
        }
        val a = t(s"r$round a: anchor join + checkpoint") {
          nodes.join(aSums, Seq("id"), "left")
            .select(col("id"), coalesce(col("s"), lit(0.0)).as("auth"))
            .localCheckpoint(eager = true)
        }
        val hSums = e.join(a.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(foldedSum(col("auth")).as("s"))
        val h = t(s"r$round h: anchor join + checkpoint") {
          nodes.join(hSums, Seq("id"), "left")
            .select(col("id"), coalesce(col("s"), lit(0.0)).as("hub"))
            .localCheckpoint(eager = true)
        }
        auths = a; hubs = h
      }
      t("final join + noop") {
        auths.join(hubs, Seq("id"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
