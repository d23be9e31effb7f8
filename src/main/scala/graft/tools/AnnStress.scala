package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}
import graft.functions.{TopKAgg, VectorOps}

/** One-off sf10 stress of the PERSISTED IVF-PQ serving stack (VERDICT
  * r14 item 6): the oracle gate runs at toy geometry (m=4, k=16, 8
  * cells, 5 probes, nprobe=2), which never exercises the priced
  * ceilings — this drives the production shape once at 100× the gate
  * corpus and records wall-clock + recall so BASELINE.md can carry
  * real numbers instead of extrapolation.
  *
  * What it does (each stage timed):
  *  1. scales ONLY the embeddings table srcDir × replicas with the
  *     ScaleUp recipe (key shift + per-replica sign isometry — no
  *     spurious cross-replica near-neighbors);
  *  2. trains the coarse quantizer (kCells Lloyd cells) and the PQ
  *     codebook (m×kCodes) on a deterministic ~1/7 SAMPLE — the
  *     documented 100 TB training posture;
  *  3. builds the persisted cell-partitioned index (floats never
  *     stored in it);
  *  4. serves a probe panel from the index at each requested nprobe,
  *     plus the UNPRUNED full-ADC scan over the same stored codes
  *     (pqTopK) as the pruning-win baseline;
  *  5. measures recall@k against the EXACT squared-L2 top-k (the
  *     metric ADC approximates — cosine would grade the index against
  *     a different question) on a probe subsample, via annRecall.
  *
  * Usage: runMain graft.tools.AnnStress <srcSfDir> <workDir>
  *          [replicas=100] [nProbes=1000] [recallProbes=100] [kCells=64]
  * Prints one [annstress] line per measurement. */
object AnnStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.AnnStress <srcSfDir> <workDir> " +
        "[replicas] [nProbes] [recallProbes] [kCells]")
    val srcDir = args(0)
    val workDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 100
    val nProbes = if (args.length > 3) args(3).toInt else 1000
    val recallProbes = if (args.length > 4) args(4).toInt else 100
    val kCells = if (args.length > 5) args(5).toInt else 64
    val m = 8
    val kCodes = 256
    val k = 10
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
      println(f"[annstress] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. embeddings-only scale-up (the one table this stress reads).
    // Key-collision check first, as ScaleUp.write does (review r15):
    // replica r shifts vec_id by r·KeyShift, which silently collides
    // if the source already carries shifted ids (e.g. pointing this
    // at a ScaleUp output) — duplicate vec_ids would corrupt every
    // recall and serve number recorded from this run.
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val mxRow = src.agg(max(col("vec_id"))).collect()(0)
    if (!mxRow.isNullAt(0)) require(mxRow.getLong(0) < ScaleUp.KeyShift,
      s"embeddings.vec_id max ${mxRow.getLong(0)} >= shift " +
        s"${ScaleUp.KeyShift} — replicas would collide; stress from the " +
        "original source, not a ScaleUp output")
    time(s"scaleup x$replicas") {
      (0 until replicas).map(r => ScaleUp.embeddingsReplica(src, r))
        .reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$workDir/embeddings")
    }
    val emb = spark.read.parquet(s"$workDir/embeddings")
    val n = emb.count()
    println(s"[annstress] corpus rows: $n (d=64, $kCells cells, " +
      s"m=$m x k=$kCodes codes)")

    // 2. train on a deterministic sample (the 100 TB posture: both
    // quantizers train on a sample, the full corpus only encodes)
    val sample = emb.filter(col("vec_id") % 7 === 0)
    val cents = time("train coarse (sample)") {
      KMeans.fit(sample, "vec_id", "embedding",
        KMeans.FirstK(kCells), maxIter = 5).centroids
    }
    val model = time("train PQ (sample)") {
      Similarity.trainPQ(sample, "vec_id", "embedding", d = 64,
        m = m, k = kCodes, maxIter = 3)
    }

    // 3. the persisted index: assign + encode the FULL corpus
    val indexPath = s"$workDir/index"
    time("build index (full corpus)") {
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", cents, model,
        indexPath)
    }

    // 4. serve the panel — probes drawn from the corpus; count() the
    // result to force full execution without collecting 10k rows
    val probes = emb.orderBy("vec_id").limit(nProbes).localCheckpoint()
    def serveIndexed(nprobe: Int): DataFrame =
      Similarity.ivfPqTopKIndexed(spark, indexPath, probes,
        "vec_id", "embedding", cents, model, nprobe = nprobe, k = k,
        maxProbes = nProbes)
    val served = Seq(4, 16).map { np =>
      // second rep re-times the warm path (plans are rebuilt; only
      // the page cache and JIT are shared, as in Bench)
      time(s"serve nprobe=$np ($nProbes probes)") { serveIndexed(np).count() }
      time(s"serve nprobe=$np rep2") { serveIndexed(np).count() }
      np -> serveIndexed(np)
    }
    // the unpruned baseline: full ADC over the SAME stored codes
    val codes = spark.read.parquet(indexPath).select(col("id"), col("codes"))
    def serveFlat(): DataFrame =
      Similarity.pqTopK(codes, "id", "codes", probes,
        "vec_id", "embedding", model, k = k, maxProbes = nProbes)
    time(s"serve full-ADC scan ($nProbes probes)") { serveFlat().count() }
    time("serve full-ADC scan rep2") { serveFlat().count() }

    // 5. recall@k against the exact squared-L2 top-k on a subsample
    val rp = probes.orderBy("vec_id").limit(recallProbes).localCheckpoint()
    val pvecs = rp.select(col("vec_id").cast("long").as("probe_id"),
      VectorOps.toDouble(col("embedding")).as("__pv"))
    val exact = time(s"exact L2 top-$k ($recallProbes probes)") {
      emb.select(col("vec_id").cast("long").as("__id"),
          VectorOps.toDouble(col("embedding")).as("__v"))
        .crossJoin(broadcast(pvecs))
        .filter(col("__id") =!= col("probe_id"))
        .select(col("probe_id"), col("__id"),
          VectorOps.sqDist(col("__v"), col("__pv")).as("__d"))
        .groupBy("probe_id")
        .agg(TopKAgg.topK(k, col("__id"), -col("__d")).as("top"))
        .select(col("probe_id"), explode(col("top._1")).as("vec_id"))
        .localCheckpoint()
    }
    val rpIds = rp.select(col("vec_id").cast("long").as("probe_id"))
    served.foreach { case (np, approx) =>
      val rec = Similarity.annRecall(
          approx.join(broadcast(rpIds), "probe_id"), exact)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"[annstress] recall@$k nprobe=$np%-3d          $rec%8.4f")
    }
    val recFlat = Similarity.annRecall(
        serveFlat().select(col("probe_id"), col("vec_id"))
          .join(broadcast(rpIds), "probe_id"), exact)
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    println(f"[annstress] recall@$k full-ADC (quantization ceiling) $recFlat%8.4f")

    // 6. the production recipe past the quantization ceiling:
    // shortlist by ADC, exact-float re-rank of only probes×shortlist
    // rows (q_ivfpq_rerank's path) — recall is then bounded by cell
    // pruning + shortlist size alone, not by code resolution. The
    // re-rank metric is exact COSINE (exactRerank), so its recall
    // baseline is the exact cosine top-k, not the L2 one above.
    val exactCos = time(s"exact cosine top-$k ($recallProbes probes)") {
      Similarity.topKCosine(emb, "vec_id", "embedding",
          rp, "vec_id", "embedding", k)
        .select(col("probe_id"), col("vec_id")).localCheckpoint()
    }
    Seq(50, 200).foreach { shortlist =>
      def serveRerank(): DataFrame =
        Similarity.ivfPqTopKRerank(emb, "vec_id", "embedding", probes,
          "vec_id", "embedding", cents, model, nprobe = 16, k = k,
          shortlist = shortlist, maxProbes = nProbes)
      time(s"rerank nprobe=16 sl=$shortlist ($nProbes probes)") {
        serveRerank().count()
      }
      val rec = Similarity.annRecall(
          serveRerank().select(col("probe_id"), col("vec_id"))
            .join(broadcast(rpIds), "probe_id"), exactCos)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"[annstress] recall@$k rerank sl=$shortlist%-4d vs cos $rec%8.4f")
      // the same query from the PERSISTED index (no assignment or
      // encode at query time — the production serving path); results
      // must match the in-memory recipe bit for bit, so only the
      // wall-clock is news here
      def serveRerankIdx(): DataFrame =
        Similarity.ivfPqTopKIndexedRerank(spark, indexPath,
          emb, "vec_id", "embedding", probes, "vec_id", "embedding",
          cents, model, nprobe = 16, k = k, shortlist = shortlist,
          maxProbes = nProbes)
      time(s"rerank-idx nprobe=16 sl=$shortlist") { serveRerankIdx().count() }
      time(s"rerank-idx sl=$shortlist rep2") { serveRerankIdx().count() }
    }
    spark.stop()
  }
}
