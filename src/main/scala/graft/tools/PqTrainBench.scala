package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}
import graft.functions.VectorOps

/** One-off measurement for VERDICT r13 item 6 (one-pass PQ training):
  * times `Similarity.trainPQ` (which now persists the narrow
  * (id, vec) projection once and slices it in memory for all m
  * sub-fits) against the PREVIOUS shape — m independent fits whose
  * every Lloyd pass re-reads the source — at real Lloyd settings
  * (maxIter > 0; the oracle rows use maxIter = 0, where the fits
  * never iterate and the difference is one scan).
  * Usage: `runMain graft.tools.PqTrainBench <sfDir> [m] [k] [maxIter]`.
  * Prints one line per variant; BASELINE.md records the result. */
object PqTrainBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: runMain graft.tools.PqTrainBench <sfDir> [m] [k] [maxIter]")
    val sfDir = args(0)
    val m = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 16
    val maxIter = if (args.length > 3) args(3).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, sfDir, "embeddings")
    // warm-up must READ THE DATA: a parquet count() scans only
    // footers (empty required schema), leaving the embedding pages
    // cold for whichever variant runs first (review r14). Summing a
    // derived value forces every embedding byte through the page
    // cache + decoder once, so BOTH variants below measure the
    // warm-cache regime — the only one a single process can compare
    // fairly (a cold cache exists once per file per boot).
    emb.agg(sum(size(col("embedding")))).collect()

    // the pre-r14 shape, replicated for the measurement only: every
    // sub-fit plans straight over the source, so each of its Lloyd
    // passes re-scans the parquet
    def uncached(): Similarity.PQModel = {
      val dsub = 64 / m
      val v = VectorOps.toDouble(col("embedding"))
      val books = (0 until m).map { j =>
        val sub = emb.select(col("vec_id"), slice(v, j * dsub + 1, dsub).as("__sub"))
        KMeans.fit(sub, "vec_id", "__sub", KMeans.FirstK(k), maxIter).centroids
      }
      Similarity.PQModel(64, m, k, books)
    }

    def time[T](what: String)(body: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = body
      println(f"[pqtrain] $what%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(m=$m k=$k maxIter=$maxIter, $sfDir)")
      r
    }
    // alternate the order so neither variant systematically follows
    // the other's JIT/GC shadow; the page cache is warm for all four
    // runs (see the warm-up above)
    val a1 = time("uncached")(uncached())
    val b1 = time("cached")(
      Similarity.trainPQ(emb, "vec_id", "embedding", 64, m, k, maxIter))
    val b2 = time("cached")(
      Similarity.trainPQ(emb, "vec_id", "embedding", 64, m, k, maxIter))
    val a2 = time("uncached")(uncached())
    // same arithmetic, byte-identical codebooks — caching moves bytes
    def flat(x: Similarity.PQModel) =
      x.codebooks.map(_.toSeq.map { case (c, w) => (c, w.toSeq) })
    require(flat(a1) == flat(b1) && flat(b1) == flat(b2) && flat(a2) == flat(a1),
      "variants must train identical codebooks")
    spark.stop()
  }
}
