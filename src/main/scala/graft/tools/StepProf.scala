package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{KMeans, Similarity}

/** Throwaway step profiler for the index lifecycle rows (r18
  * optimization round): replays q_ivfpq_delete's steps with wall-clock
  * timers so the expensive step is a number, not a guess. Not part of
  * any gate. */
object StepProf {
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
    // job/task counter (r19): each lifecycle step is a chain of small
    // sequential actions whose fixed overhead dominates at gate scale —
    // count them so "too many driver jobs" is a number per step
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          tasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
          if (sys.env.contains("STEPPROF_TRACE")) {
            val site = Option(j.properties)
              .map(_.getProperty("callSite.short", "?")).getOrElse("?")
            println(s"[stepprof]     job site=$site tasks=${
              j.stageInfos.map(_.numTasks).sum}")
          }
        }
      })
    def t[T](label: String)(body: => T): T = {
      val (j0, k0) = (jobs.get(), tasks.get())
      val t0 = System.nanoTime()
      val r = body
      println(f"[stepprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  jobs=${jobs.get() - j0}%3d tasks=${tasks.get() - k0}%4d")
      r
    }
    // warm-up like Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    (1 to 2).foreach { rep =>
      println(s"[stepprof] === rep $rep ===")
      val emb = Tables(spark, sfDir, "embeddings")
      val model = t("trainPQ(maxIter=0)") {
        Similarity.trainPQ(emb, "vec_id", "embedding", d = 64, m = 4, k = 16, maxIter = 0)
      }
      val cents = t("cents FirstK(8)") {
        KMeans.initCentroids(emb, "vec_id", "embedding", KMeans.FirstK(8))
      }
      val idx = java.nio.file.Files.createTempDirectory("stepprof_").toString + "/index"
      t("buildIvfPqIndex") {
        Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model, idx)
      }
      t("deleteFromIvfPqIndex") {
        Similarity.deleteFromIvfPqIndex(spark,
          emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id", idx)
      }
      val masked = t("masked serve + checkpoint") {
        Similarity.ivfPqTopKIndexed(spark, idx,
            emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
            cents, model, nprobe = 2, k = 10)
          .withColumn("phase", lit("masked"))
          .localCheckpoint(eager = true)
      }
      t("compactIvfPqIndex") { Similarity.compactIvfPqIndex(spark, idx) }
      t("appendIvfPqIndex") {
        Similarity.appendIvfPqIndex(spark, emb.filter(col("vec_id") % 14 === 3),
          "vec_id", "embedding", model, idx)
      }
      t("final serve + union + noop") {
        val fin = Similarity.ivfPqTopKIndexed(spark, idx,
            emb.orderBy("vec_id").limit(5), "vec_id", "embedding",
            cents, model, nprobe = 2, k = 10)
          .withColumn("phase", lit("final"))
        masked.unionByName(fin)
          .select("phase", "probe_id", "vec_id", "rank", "adist")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
