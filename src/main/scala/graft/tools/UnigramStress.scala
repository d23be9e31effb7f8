package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.UnigramTokenizer

/** One-off scale measurement of the unigram-LM tokenizer (round 16):
  * the operator's posture claims training is DICTIONARY-bound (one
  * corpus pass for word counts, then every EM/DP round runs on the
  * distinct-word table) while encoding is corpus-bound (one
  * dictionary segmentation + one occurrence join + one reassembly).
  * This drives both at ×R decorrelated document replicas
  * (ScaleUp.documentsReplica — the per-replica token prefixes grow
  * the DICTIONARY ×R too, the worst case for the DP frontier) and
  * prints wall-clock + dictionary geometry so BASELINE.md records
  * measured scaling instead of the design argument.
  *
  * A SECOND mode (`bigdict:N` as the first arg — VERDICT r16 item 4)
  * targets the dictionary axis directly: the replica recipe only
  * reached ~3×10³ distinct words, but the operator's own doc names
  * 10⁵–10⁸ distinct words as the regime where the DP rounds become
  * real shuffles. It synthesizes a corpus of N DISTINCT hash-derived
  * words (a 3-letter md5 prefix + the word's id rendered base-16 as
  * letters, so lengths run 4 up to ~3+16 and grow slowly with N; 24
  * words per doc) and measures train/encode wall-clock at dictionary
  * sizes the replica path cannot reach — run it at N and 10N to
  * record the dictionary-scaling exponent.
  *
  * Usage: runMain graft.tools.UnigramStress <srcSfDir|bigdict:N> <workDir>
  *          [replicas=100] [vocabSize=200]
  * Prints one [unistress] line per measurement. */
object UnigramStress {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: runMain graft.tools.UnigramStress <srcSfDir|bigdict:N> " +
        "<workDir> [replicas] [vocabSize]")
    val srcDir = args(0)
    val workDir = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 100
    val vocabSize = if (args.length > 3) args(3).toInt else 200
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
      println(f"[unistress] $what%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (srcDir.startsWith("bigdict:")) {
      val nWords = srcDir.stripPrefix("bigdict:").toLong
      time(s"synthesize $nWords-word dictionary corpus") {
        // word i = a 3-letter md5-derived prefix + hex(i) rendered as
        // letters a..p — distinct by construction (the base-16 id can
        // never collide), deterministic, length 4 up to ~3+16 growing
        // slowly (log16) with i (ADVICE r17: comment now matches the
        // construction BASELINE.md's dictionary-scaling record measured)
        spark.range(nWords)
          .select((col("id") / 24).cast("long").as("doc_id"),
            concat(
              // letter prefix from the hash: 3 chars of md5 mapped a..p
              translate(substring(md5(concat(lit("uw:"), col("id"))), 1, 3),
                "0123456789abcdef", "abcdefghijklmnop"),
              // the id itself, base-16 rendered as letters — uniqueness
              translate(hex(col("id")), "0123456789ABCDEF", "abcdefghijklmnop"))
              .as("w"))
          .groupBy("doc_id")
          .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
          .write.mode("overwrite").parquet(s"$workDir/documents")
      }
    } else {
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
    }
    val docs = spark.read.parquet(s"$workDir/documents")
    val nDocs = docs.count()
    val dict = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(countDistinct(col("w")), max(length(col("w")))).collect()(0)
    println(s"[unistress] corpus: $nDocs docs, dictionary " +
      s"${dict.getLong(0)} distinct words (max len ${dict.getInt(1)}), " +
      s"vocabSize=$vocabSize")

    val model = time("train (seed + 1 hard-EM round)") {
      UnigramTokenizer.train(docs, "text", vocabSize = vocabSize,
        rounds = 1, maxPieceLen = 4, maxWordLen = 32)
    }
    println(s"[unistress] model: ${model.pieces.length} pieces, " +
      s"total count ${model.total}")
    val enc = time("encode (full corpus)") {
      val e = UnigramTokenizer.encode(docs, "doc_id", "text", model,
        maxWordLen = 32)
      e.write.format("noop").mode("overwrite").save()
      e
    }
    time("encode rep2") {
      UnigramTokenizer.encode(docs, "doc_id", "text", model, maxWordLen = 32)
        .write.format("noop").mode("overwrite").save()
    }
    val stats = enc.agg(sum(col("n_pieces")), count(lit(1))).collect()(0)
    println(s"[unistress] encoded: ${stats.getLong(1)} docs, " +
      s"${stats.getLong(0)} pieces")
    spark.stop()
  }
}
