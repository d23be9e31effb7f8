package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** One-off large-corpus stress of the MinHash banded-LSH near-dup
  * chain (VERDICT r15 item 6 — the AnnStress pattern for LSH): the
  * oracle gate runs near-dup + components at sf0.1 (~5k docs) and the
  * sf1 bench at ×10; this drives the chain once at ×100 decorrelated
  * replicas (ScaleUp.documentsReplica: per-replica token prefixes —
  * within-replica near-dup structure preserved verbatim, ZERO
  * cross-replica shingle collisions) and records what the design
  * claims should happen:
  *  - the Σ m(m−1)/2 bucket model (the candidate bill the LSH join
  *    actually pays) and its growth vs replicas — decorrelated
  *    replicas must grow it LINEARLY (each replica only pairs with
  *    itself), where naive byte-copies would grow it quadratically;
  *  - the maxBucket blacklist hit rate: how many (band, bucket) keys
  *    the skew cap drops, how many explode rows they carried, and
  *    what share of the UNCAPPED candidate bill they represented;
  *  - wall-clock for nearDuplicates (signature + bucket join + exact
  *    Jaccard verify) and for BOTH connected-components variants over
  *    the verified pairs, against the model numbers.
  *
  * Usage: runMain graft.tools.DedupStress <srcSfDir> <workDir>
  *          [replicas=100] [maxBucket=100] [minSim=0.5]
  * Prints one [dedupstress] line per measurement. */
object DedupStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.DedupStress <srcSfDir> <workDir> " +
        "[replicas] [maxBucket] [minSim]")
    val srcDir = args(0)
    val workDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 100
    val maxBucket = if (args.length > 3) args(3).toInt else 100
    val minSim = if (args.length > 4) args(4).toDouble else 0.5
    val (n, h, b) = (3, 16, 8) // the gate chain's family
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dedupstress] $what%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. documents-only scale-up (the one table this stress reads),
    // with the same key-collision fail-fast as ScaleUp.write
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
    val mxRow = src.agg(max(col("doc_id"))).collect()(0)
    if (!mxRow.isNullAt(0)) require(mxRow.getLong(0) < ScaleUp.KeyShift,
      s"documents.doc_id max ${mxRow.getLong(0)} >= shift " +
        s"${ScaleUp.KeyShift} — replicas would collide")
    time(s"scaleup x$replicas") {
      (0 until replicas).map(r => ScaleUp.documentsReplica(src, r))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$workDir/documents")
    }
    val docs = spark.read.parquet(s"$workDir/documents")
    val nDocs = docs.count()
    println(s"[dedupstress] corpus rows: $nDocs (n=$n, h=$h, b=$b, " +
      s"maxBucket=$maxBucket, minSim=$minSim)")

    // 2. the bucket model: per-(band, bucket) occupancy m and the
    // Σ m(m−1)/2 candidate bill, capped vs uncapped, plus the
    // blacklist hit rate — the numbers the maxBucket guard is sized by
    val occupancy = time("bucket occupancy (sign + explode)") {
      Dedup.minhashBuckets(docs, "doc_id", "text", n, h, b, parity = true)
        .groupBy("band", "bucket").agg(count(lit(1)).cast("long").as("m"))
        .localCheckpoint()
    }
    val stats = occupancy.agg(
      count(lit(1)).as("n_buckets"),
      sum(expr("m * (m - 1) DIV 2")).as("cand_uncapped"),
      sum(when(col("m") > maxBucket, 1L).otherwise(0L)).as("over_buckets"),
      sum(when(col("m") > maxBucket, col("m")).otherwise(0L)).as("over_rows"),
      sum(when(col("m") > maxBucket, expr("m * (m - 1) DIV 2"))
        .otherwise(0L)).as("cand_dropped"),
      max(col("m")).as("max_m")).collect()(0)
    val candUncapped = stats.getAs[Long]("cand_uncapped")
    val candDropped = stats.getAs[Long]("cand_dropped")
    val candModel = candUncapped - candDropped
    println(s"[dedupstress] buckets=${stats.getAs[Long]("n_buckets")} " +
      s"max_m=${stats.getAs[Long]("max_m")} " +
      s"cand_uncapped=$candUncapped cand_dropped=$candDropped " +
      s"(blacklisted buckets=${stats.getAs[Long]("over_buckets")}, " +
      s"rows=${stats.getAs[Long]("over_rows")}) cand_model=$candModel")

    // 3. the chain itself: candidates + exact-Jaccard verify
    val pairs = time("nearDuplicates (verify incl.)") {
      val p = Dedup.nearDuplicates(docs, "doc_id", "text", n, h, b,
        minSim = minSim, parity = true, maxBucket = maxBucket)
        .localCheckpoint()
      p.count()
      p
    }
    val nPairs = pairs.count()
    println(s"[dedupstress] verified pairs (sim >= $minSim): $nPairs")

    // 4. components over the verified pairs, both variants
    val ccMin = time("connectedComponents (min-label)") {
      val c = Dedup.connectedComponents(pairs)
      c.select(countDistinct(col("component"))).collect()(0).getLong(0)
    }
    val ccStar = time("componentsStar (large/small-star)") {
      val c = Dedup.componentsStar(pairs)
      c.select(countDistinct(col("component"))).collect()(0).getLong(0)
    }
    require(ccMin == ccStar,
      s"component counts diverge: min-label $ccMin vs star $ccStar")
    println(s"[dedupstress] components: $ccMin (both variants agree)")
    Dedup.releaseCaches()
    spark.stop()
  }
}
