package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{KMeans, Similarity}
import graft.functions.{TopKAgg, VectorOps}

/** One-off large-corpus stress of the PERSISTED IVF-PQ serving stack
  * (VERDICT r14 item 6, extended r16): the oracle gate runs at toy
  * geometry (m=4, k=16, 8 cells, 5 probes, nprobe=2), which never
  * exercises the priced ceilings — this drives the production shape
  * once at 100×+ the gate corpus and records wall-clock + recall so
  * BASELINE.md can carry real numbers instead of extrapolation.
  *
  * Corpus (first arg):
  *  - a testdata dir → embeddings scaled srcDir × replicas with the
  *    ScaleUp recipe (key shift + per-replica sign isometry — no
  *    spurious cross-replica near-neighbors; geometry is near-random,
  *    so recall is dominated by distance concentration — adjudicated
  *    in BASELINE round-15);
  *  - `planted:N:CLUSTERS:SIGMA` → ScaleUp.plantedEmbeddings
  *    (VERDICT r15 item 2): Gaussian neighborhoods make recall@k a
  *    number with a meaningful target instead of an essay.
  *
  * Modes: trains BOTH a raw and a RESIDUAL PQ codebook (VERDICT r15
  * item 1) on the same sample under the same coarse quantizer, builds
  * one persisted index per mode, and reports serve wall-clock +
  * recall@k side by side — the residual-encoding recall delta is the
  * headline this tool exists to measure.
  *
  * What it does (each stage timed):
  *  1. corpus (scale-up or planted) written once to workDir;
  *  2. coarse quantizer (kCells Lloyd cells) + both PQ codebooks
  *     (m×kCodes, raw and residual) trained on a deterministic ~1/7
  *     SAMPLE — the documented 100 TB training posture;
  *  3. one persisted cell-partitioned index per mode (floats never
  *     stored in them);
  *  4. serves a probe panel from each index at each requested nprobe
  *     (plus, raw mode only, the UNPRUNED full-ADC scan over the
  *     stored codes as the pruning-win baseline);
  *  5. recall@k against the EXACT squared-L2 top-k (the metric ADC
  *     approximates) on a probe subsample, via annRecall — per
  *     nprobe AND at nprobe=kCells (the quantization ceiling: no
  *     pruning loss, pure code-resolution loss);
  *  6. shortlist + exact-float re-rank recall (vs exact cosine, the
  *     re-rank's own metric) from the PERSISTED index — the
  *     production query path — per mode.
  *
  * Usage: runMain graft.tools.AnnStress <srcSfDir|planted:N:C:SIGMA>
  *          <workDir> [replicas=100] [nProbes=1000] [recallProbes=100]
  *          [kCells=64]
  * Prints one [annstress] line per measurement. */
object AnnStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.AnnStress <srcSfDir|planted:N:C:SIGMA> " +
        "<workDir> [replicas] [nProbes] [recallProbes] [kCells]")
    val srcSpec = args(0)
    val workDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 100
    val nProbes = if (args.length > 3) args(3).toInt else 1000
    val recallProbes = if (args.length > 4) args(4).toInt else 100
    val kCells = if (args.length > 5) args(5).toInt else 64
    // codebook geometry + mode filter via env (r17): the serving-
    // budget sweep showed recall 0.9 unreachable at m=8 — the lever
    // is MORE CODE BYTES, measured by re-running with ANN_M=16
    val m = sys.env.get("SPARK_GRAFT_ANN_M").map(_.toInt).getOrElse(8)
    val kCodes = 256
    val modeFilter = sys.env.get("SPARK_GRAFT_ANN_MODES")
      .map(_.split(",").toSet)
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
      println(f"[annstress] $what%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. corpus
    if (srcSpec.startsWith("planted:")) {
      val parts = srcSpec.stripPrefix("planted:").split(":")
      require(parts.length == 3 || parts.length == 4,
        "planted:N:CLUSTERS:SIGMA[:ANISO]")
      val (pn, pc, ps) = (parts(0).toLong, parts(1).toInt, parts(2).toDouble)
      val pa = if (parts.length == 4) parts(3).toDouble else 1.0
      time(s"plant n=$pn c=$pc sigma=$ps aniso=$pa") {
        ScaleUp.plantedEmbeddings(spark, pn, pc, ps, pa)
          .write.mode("overwrite").parquet(s"$workDir/embeddings")
      }
    } else {
      // Key-collision check first, as ScaleUp.write does (review r15):
      // replica r shifts vec_id by r·KeyShift, which silently collides
      // if the source already carries shifted ids (e.g. pointing this
      // at a ScaleUp output) — duplicate vec_ids would corrupt every
      // recall and serve number recorded from this run.
      val src = spark.read.parquet(s"$srcSpec/embeddings.parquet")
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
    def enabled(mode: String): Boolean = modeFilter.forall(_.contains(mode))
    val modelRaw = if (!enabled("raw")) None else Some(
      time("train PQ raw (sample)") {
        Similarity.trainPQ(sample, "vec_id", "embedding", d = 64,
          m = m, k = kCodes, maxIter = 3)
      })
    val modelRes = if (!enabled("residual")) None else Some(
      time("train PQ residual (sample)") {
        Similarity.trainPQResidual(sample, "vec_id", "embedding", d = 64,
          cents, m = m, k = kCodes, maxIter = 3)
      })
    // OPQ mode (round 16): learn the rotation on the sample, rotate
    // the corpus ONCE (written next to it — at 100 TB this is the
    // one extra corpus pass OPQ costs), then train a fresh coarse
    // quantizer + RESIDUAL codebooks in rotated space — OPQ+residual
    // is the production combo, both levers stacked. Exact L2/cosine
    // ground truth is rotation-INVARIANT (R is orthogonal), so the
    // raw-space baselines grade the rotated serves directly.
    val opqIvf = if (!enabled("opq_res")) None else Some {
      val t = time("train OPQ-IVF (sample)") {
        Similarity.trainOpqIvf(sample, "vec_id", "embedding", d = 64,
          kCells = kCells, m = m, k = kCodes, iters = 3, lloydIter = 5,
          pqMaxIter = 2)
      }
      time("rotate corpus (one pass)") {
        Similarity.rotateVectors(emb, "vec_id", "embedding", t.rotation,
          "embedding").write.mode("overwrite").parquet(s"$workDir/embeddings_opq")
      }
      t
    }
    val embO = opqIvf.map(_ => spark.read.parquet(s"$workDir/embeddings_opq"))

    // probe panel + recall ground truths, shared by both modes
    val probes = emb.orderBy("vec_id").limit(nProbes).localCheckpoint()
    val rp = probes.orderBy("vec_id").limit(recallProbes).localCheckpoint()
    val rpIds = rp.select(col("vec_id").cast("long").as("probe_id"))
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
    val exactCos = time(s"exact cosine top-$k ($recallProbes probes)") {
      Similarity.topKCosine(emb, "vec_id", "embedding",
          rp, "vec_id", "embedding", k)
        .select(col("probe_id"), col("vec_id")).localCheckpoint()
    }

    def recallOf(approx: DataFrame, truth: DataFrame): Double =
      Similarity.annRecall(
          approx.select(col("probe_id"), col("vec_id"))
            .join(broadcast(rpIds), "probe_id"), truth)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)

    val probesO = embO.map(_.orderBy("vec_id").limit(nProbes).localCheckpoint())

    // 3.–6. per mode: build, serve, recall, rerank
    (modelRaw.map(mr => ("raw", emb, probes, cents, mr)).toSeq ++
     modelRes.map(mr => ("residual", emb, probes, cents, mr)).toSeq ++
     opqIvf.map(o => ("opq_res", embO.get, probesO.get, o.cents, o.pq)).toSeq)
      .foreach { case (mode, corpus, prb, cts, model) =>
      val indexPath = s"$workDir/index_$mode"
      time(s"[$mode] build index (full corpus)") {
        Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", cts, model,
          indexPath)
      }
      def serveIndexed(nprobe: Int): DataFrame =
        Similarity.ivfPqTopKIndexed(spark, indexPath, prb,
          "vec_id", "embedding", cts, model, nprobe = nprobe, k = k,
          maxProbes = nProbes)
      Seq(4, 16).foreach { np =>
        // second rep re-times the warm path (plans are rebuilt; only
        // the page cache and JIT are shared, as in Bench)
        time(s"[$mode] serve nprobe=$np ($nProbes probes)") {
          serveIndexed(np).count()
        }
        time(s"[$mode] serve nprobe=$np rep2") { serveIndexed(np).count() }
        val rec = recallOf(serveIndexed(np), exact)
        println(f"[annstress] [$mode] recall@$k nprobe=$np%-3d        $rec%8.4f")
      }
      // the quantization ceiling: nprobe = all cells removes pruning
      // loss entirely — what remains is code resolution alone
      val recAll = recallOf(serveIndexed(kCells), exact)
      println(f"[annstress] [$mode] recall@$k nprobe=$kCells (ceiling) $recAll%8.4f")
      // the production recipe past the ceiling: ADC shortlist from
      // the PERSISTED index + exact-float re-rank of probes×shortlist
      // rows (ivfPqTopKIndexedRerank — bit-identical to the in-memory
      // recipe, without its per-query corpus re-encode; the r15
      // crossover is recorded in BASELINE round-15). Re-rank metric
      // is exact COSINE, so its baseline is the cosine top-k.
      Seq(50, 200).foreach { shortlist =>
        def serveRerankIdx(): DataFrame =
          Similarity.ivfPqTopKIndexedRerank(spark, indexPath,
            corpus, "vec_id", "embedding", prb, "vec_id", "embedding",
            cts, model, nprobe = 16, k = k, shortlist = shortlist,
            maxProbes = nProbes)
        time(s"[$mode] rerank-idx np=16 sl=$shortlist") {
          serveRerankIdx().count()
        }
        time(s"[$mode] rerank-idx sl=$shortlist rep2") {
          serveRerankIdx().count()
        }
        val rec = recallOf(serveRerankIdx(), exactCos)
        println(f"[annstress] [$mode] recall@$k rerank sl=$shortlist%-4d    $rec%8.4f")
      }
      // recall-vs-budget sweep (VERDICT r16 item 5), residual mode
      // only (the production encoding): the full (nprobe, shortlist)
      // grid of the indexed rerank serve, timed on the recall panel —
      // the table pickServingBudget consumes. Enable with
      // SPARK_GRAFT_ANN_SWEEP=1.
      if (mode == "residual" && sys.env.get("SPARK_GRAFT_ANN_SWEEP").contains("1")) {
        val swept = for {
          np <- Seq(1, 2, 4, 8, 16, 32).filter(_ <= kCells)
          sl <- Seq(50, 100, 200, 400)
        } yield {
          def run(): DataFrame =
            Similarity.ivfPqTopKIndexedRerank(spark, indexPath,
              corpus, "vec_id", "embedding", rp, "vec_id", "embedding",
              cts, model, nprobe = np, k = k, shortlist = sl,
              maxProbes = nProbes)
          run().count() // warm (plan + page cache)
          val t0 = System.nanoTime(); run().count()
          val sec = (System.nanoTime() - t0) / 1e9
          val rec = recallOf(run(), exactCos)
          println(f"[annsweep] nprobe=$np%-3d shortlist=$sl%-4d recall=$rec%.4f sec=$sec%.2f")
          Similarity.ServingBudget(np, sl, rec, sec)
        }
        Seq(0.5, 0.7, 0.9).foreach { tgt =>
          val pick = Similarity.pickServingBudget(swept, tgt)
          println(s"[annsweep] target=$tgt -> " + pick.map(b =>
            f"nprobe=${b.nprobe} shortlist=${b.shortlist} " +
              f"(recall=${b.recall}%.4f sec=${b.seconds}%.2f)")
            .getOrElse("UNREACHABLE in swept grid"))
        }
        // persist the swept grid next to the index (VERDICT r17 item
        // 5): the deployer's pickServingBudgetIndexed then reads the
        // index's OWN record instead of BASELINE prose
        Similarity.saveServingSweep(spark, indexPath, swept)
        println(s"[annsweep] sweep persisted at $indexPath/_graft_sweep " +
          s"(${swept.length} grid points)")
      }
      // takedown-at-scale stress (VERDICT r17 item 2): the delete
      // lifecycle is oracle-gated at sf0.1 only; this measures the
      // O(takedown) claim and the serve-side anti-join cost under a
      // LARGE live tombstone set — delete 0.1% / 1% / 10% of the
      // corpus, record delete wall-clock (should be ~flat: one
      // id-projection scan + a takedown-sized write), serve latency
      // with tombstones live vs after compact, and compact cost vs
      // tombstone fraction. Fresh index per fraction so the fractions
      // are independent measurements. Enable with
      // SPARK_GRAFT_ANN_DELETE=1 (runs on the residual index — the
      // production encoding).
      if (mode == "residual" && sys.env.get("SPARK_GRAFT_ANN_DELETE").contains("1")) {
        Seq(1000L, 100L, 10L).foreach { mod =>
          val delPath = s"$workDir/index_del_$mod"
          time(s"[del 1/$mod] build index") {
            Similarity.buildIvfPqIndex(corpus, "vec_id", "embedding", cts,
              model, delPath)
          }
          val doomed = corpus.filter(col("vec_id") % mod === 0)
            .select("vec_id")
          val nDel = doomed.count()
          time(s"[del 1/$mod] delete $nDel ids") {
            Similarity.deleteFromIvfPqIndex(spark, doomed, "vec_id", delPath)
          }
          def serveDel(): DataFrame =
            Similarity.ivfPqTopKIndexed(spark, delPath, prb,
              "vec_id", "embedding", cts, model, nprobe = 16, k = k,
              maxProbes = nProbes)
          time(s"[del 1/$mod] serve masked") { serveDel().count() }
          time(s"[del 1/$mod] serve masked rep2") { serveDel().count() }
          time(s"[del 1/$mod] compact") {
            Similarity.compactIvfPqIndex(spark, delPath)
          }
          time(s"[del 1/$mod] serve compacted") { serveDel().count() }
          time(s"[del 1/$mod] serve compacted rep2") { serveDel().count() }
        }
      }
    }

    // the unpruned baseline, raw mode only (flat pqTopK has no coarse
    // cell, so residual codes cannot serve it): full ADC over the
    // stored codes — the pruning-win denominator
    modelRaw.foreach { mr =>
      val codesRaw = Similarity.ivfPqIndexCodes(spark, s"$workDir/index_raw")
        .select(col("id"), col("codes"))
      def serveFlat(): DataFrame =
        Similarity.pqTopK(codesRaw, "id", "codes", probes,
          "vec_id", "embedding", mr, k = k, maxProbes = nProbes)
      time(s"serve full-ADC scan ($nProbes probes)") { serveFlat().count() }
      time("serve full-ADC scan rep2") { serveFlat().count() }
      val recFlat = recallOf(
        serveFlat().select(col("probe_id"), col("vec_id")), exact)
      println(f"[annstress] [raw] recall@$k full-ADC (no pruning)   $recFlat%8.4f")
    }
    spark.stop()
  }
}
