package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM-training-data pipelines: media payloads
  * travel as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / resize / frame-sample stages are real
  * Spark plumbing over them.
  *
  * Not in the reference (its one relation is the gene table, SURVEY
  * §1) — this is 100 TB extension surface. The container has no image
  * or audio codec libraries, so the DECODE KERNEL is a deterministic
  * fake (bytes are treated as gray8 pixels); everything around it —
  * schema, batch shape, partitioning, the hex/byte arithmetic, the
  * binary slicing — is the real engine path a codec would plug into.
  *
  * Scale posture: every operator here is rowwise (no shuffle) and
  * stays in whole-stage codegen except decodeBatched, which is the
  * deliberate `mapPartitions` escape hatch for codec libraries that
  * want batched native calls (the Spark analog of a batched
  * decode UDF). At 100 TB the binary column dominates scan bytes —
  * Parquet column pruning means queries that don't touch `content`
  * never read it, which is why metadata lives in a separate struct
  * column rather than inside the payload.
  *
  * Cross-engine determinism: the fake decode is hex-pair byte
  * arithmetic (exact integers), frame identity is md5 over the frame's
  * hex rendering, and embeddings derive from md5 via exact
  * integer / 2^32 scaling — all bit-exact in the DuckDB oracle.
  */
object Multimodal {

  /** Ingest: attach the opaque payload (UTF-8 bytes of textCol — a
    * stand-in for real media bytes) plus a typed metadata struct
    * (format, width, height, channels, n_bytes). gray8 16-px-wide
    * raster: height = ceil(n/16). */
  def withContent(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val content = encode(col(textCol), "UTF-8")
    val n = length(content).cast("long")
    df.select(col(idCol), content.as("content"),
      struct(
        lit("gray8").as("format"),
        lit(16).as("width"),
        floor((n + 15) / 16.0).cast("int").as("height"),
        lit(1).as("channels"),
        n.as("n_bytes")).as("meta"))
  }

  /** Byte values of a binary column as array<long> — the fake "pixel
    * decode". Latin-1 maps bytes 0-255 to code points 0-255, so
    * decode + one-pass char split + ascii() reads every byte exactly,
    * in O(n) (the hex/substr form is O(n²) in payload length — each
    * substr re-scans the string). Pure codegen HOFs; exact. */
  def byteValues(content: Column): Column =
    when(length(content) === 0, typedlit(Seq.empty[Long]))
      .otherwise(transform(split(decode(content, "ISO-8859-1"), ""),
        c => ascii(c).cast("long")))

  /** Per-payload pixel statistics (the decode-and-summarize stage):
    * (id, n_px, sum_px, min_px, max_px, mean_px). Sum/min/max are
    * exact integers; mean is one exact-integer division — bit-stable
    * cross-engine with no rounding contract needed. */
  def pixelStats(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val bs = byteValues(col(contentCol))
    df.select(col(idCol), bs.as("px"))
      .select(col(idCol),
        size(col("px")).cast("long").as("n_px"),
        aggregate(col("px"), lit(0L), (a, v) => a + v).as("sum_px"),
        array_min(col("px")).as("min_px"),
        array_max(col("px")).as("max_px"))
      .withColumn("mean_px",
        // empty payload: define mean as 0.0 (matches fakeDecode) —
        // Spark's 0/0 would be NULL, DuckDB's NaN
        when(col("n_px") > 0, col("sum_px").cast("double") / col("n_px").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Fixed-size frame sampling (the video/audio chunking stage):
    * explode the payload into ceil(n/frameBytes) binary frames of
    * frameBytes each (last one short), keeping at most maxFrames per
    * payload. Output: (id, frame_idx 1-based, frame: binary). The
    * slice runs on the real binary column. */
  def frameSample(df: DataFrame, idCol: String, contentCol: String,
                  frameBytes: Int, maxFrames: Int = Int.MaxValue): DataFrame = {
    // loud, like every sibling's parameter require (review r15): 0
    // died mid-job on an ANSI cast of floor(Infinity); a negative
    // value routed EVERY payload to the empty-array branch — an empty
    // result with no error
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val n = length(col(contentCol))
    val nFrames = least(floor((n + frameBytes - 1) / frameBytes.toDouble).cast("int"),
      lit(maxFrames))
    // guard the empty payload: sequence(1, 0) DESCENDS to [1, 0] in
    // Spark — an empty payload must explode to zero frame rows
    df.select(col(idCol), col(contentCol).as("__c"),
      explode(when(nFrames >= 1, sequence(lit(1), nFrames))
        .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"),
        col("__c").substr((col("frame_idx") - 1) * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** Deterministic feature extraction (the embedding stage a vision /
    * audio encoder would fill): d pseudo-random coordinates in [0, 1)
    * derived from the payload digest — exact integer / 2^32, so the
    * oracle reproduces every double bitwise. Output embeddings feed
    * the Similarity operators directly. */
  def featureExtract(df: DataFrame, idCol: String, contentCol: String, d: Int): DataFrame = {
    // d <= 0 would NOT produce an empty embedding: sequence(1, 0)
    // descends to [1, 0] (review r15 — the pitfall this file already
    // guards in frameSample), silently emitting 2-element vectors
    require(d >= 1, s"embedding dimension d must be >= 1, got $d")
    val base = md5(col(contentCol))
    df.select(col(idCol),
      transform(sequence(lit(1), lit(d)), j =>
        Sampling.unitFromMd5(concat(base, lit(":"), j.cast("string")))).as("embedding"))
  }

  /** Stride resize of the fake gray8 raster (the thumbnail stage):
    * keep every `stride`-th pixel, update metadata to match. Output:
    * (id, px: array<long> downsampled, meta with width/height/n_bytes
    * recomputed). */
  def resizeByStride(df: DataFrame, idCol: String, contentCol: String, stride: Int): DataFrame = {
    // stride = 0 divides into Infinity and dies on the ANSI int cast
    // mid-job; a negative stride makes the sample-count sequence
    // DESCEND and element_at walk backwards — wrong-length px arrays
    // with no error (review r15)
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val bs = byteValues(col(contentCol))
    df.select(col(idCol), bs.as("__px"))
      .select(col(idCol),
        // empty-payload guard: see frameSample (descending sequence)
        when(size(col("__px")) >= 1,
          transform(sequence(lit(1), ((size(col("__px")) - 1) / stride + 1).cast("int")),
            i => element_at(col("__px"), (i - 1) * stride + 1)))
          .otherwise(array().cast("array<long>")).as("px"))
      .select(col(idCol), col("px"),
        struct(
          lit("gray8").as("format"),
          lit(16).as("width"),
          floor((size(col("px")) + 15) / 16.0).cast("int").as("height"),
          lit(1).as("channels"),
          size(col("px")).cast("long").as("n_bytes")).as("meta"))
  }

  /** 64-bit perceptual difference hash (dHash — the classic
    * duplicate-image fingerprint) of each decoded gray8 raster, as 16
    * hex chars: sample the pixel sequence at 72 evenly spaced points
    * (9 per row × 8 rows), emit bit (r, c) = 1 iff sample[r·9+c] <
    * sample[r·9+c+1] — brightness gradients survive re-encoding and
    * resizing, so near-identical images land within a few bits. All
    * exact integer arithmetic (floor-div sampling, nibble packing),
    * bit-replayable in the oracle. Empty payloads emit NO row (there
    * is no image to hash). Runs the native DHash64 kernel; dHashHof
    * below is its bit-identical staged-HOF twin (pinned in
    * MultimodalSpec) — the form the DuckDB oracle mirrors.
    * Output: (idCol, dhash: 16-hex string). */
  def dHash(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.DHash64.dhash64(col(contentCol)).as("dhash"))
      .filter(col("dhash").isNotNull)

  /** The staged-HOF twin of the DHash64 kernel — each stage is its
    * own projection so the 72-sample array materializes once per row
    * instead of being inlined into all 64 bit expressions. */
  def dHashHof(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val hexDigits = "0123456789abcdef"
    df.select(col(idCol), byteValues(col(contentCol)).as("__px"))
      .filter(size(col("__px")) > 0)
      .select(col(idCol), col("__px"), size(col("__px")).cast("long").as("__n"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(71L)), k =>
          element_at(col("__px"),
            call_function("div", k * col("__n"), lit(72L)).cast("int") + 1)).as("__s"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(63)), k => {
          val r = call_function("div", k, lit(8)).cast("int")
          val c = k % 8
          when(element_at(col("__s"), r * 9 + c + 1) <
               element_at(col("__s"), r * 9 + c + 2), 1).otherwise(0)
        }).as("__b"))
      .select(col(idCol),
        array_join(transform(sequence(lit(0), lit(15)), j =>
          lit(hexDigits).substr(
            element_at(col("__b"), j * 4 + 1) * 8 + element_at(col("__b"), j * 4 + 2) * 4 +
              element_at(col("__b"), j * 4 + 3) * 2 + element_at(col("__b"), j * 4 + 4) + 1,
            lit(1))), "").as("dhash"))
  }

  /** Near-duplicate IMAGES: perceptual dHash + the shared
    * banded-Hamming join (Dedup.hammingNearDup — same pigeonhole
    * recall and maxBucket skew guard as the text SimHash path). The
    * multimodal twin of text near-dup: re-encoded, slightly edited,
    * or re-sampled copies of an image differ in a few gradient bits,
    * not in their byte hash. Output: (id1, id2, hamming ≤
    * maxHamming), id1 < id2. */
  def imageNearDup(df: DataFrame, idCol: String, contentCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame =
    Dedup.hammingNearDup(dHash(df, idCol, contentCol), idCol, "dhash",
      maxHamming, maxBucket)

  /** Decoded-record shape produced by a batch decoder. */
  final case class Decoded(id: Long, width: Int, height: Int, meanPx: Double)

  /** The batched-decode escape hatch: partitions are processed in
    * batches of `batchSize` payloads, each batch handed to `decode` in
    * one call — the shape a native codec binding wants (amortized
    * library-call overhead, vectorized decode). This is deliberately
    * `mapPartitions` (SURVEY's "(d) last resort"): a codec is
    * imperative per-byte work no Catalyst expression can express.
    * Partitioning, ordering within a partition, and laziness are
    * preserved; the decoder must be deterministic per payload. */
  def decodeBatched(df: DataFrame, idCol: String, contentCol: String, batchSize: Int)(
      decode: Seq[(Long, Array[Byte])] => Seq[Decoded]): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val in = df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decode(batch))
    }(Encoders.product[Decoded])
      .toDF()
  }

  /** The stubbed decode kernel — where libjpeg/ffmpeg would run. The
    * deterministic fake reads the gray8 raster: width 16, height =
    * ceil(n/16), meanPx = exact byte mean. Marked clearly as a stub;
    * replace with a real codec binding in production. */
  val fakeDecode: Seq[(Long, Array[Byte])] => Seq[Decoded] = batch =>
    batch.map { case (id, bytes) =>
      val n = bytes.length
      var s = 0L
      var i = 0
      while (i < n) { s += bytes(i) & 0xff; i += 1 }
      Decoded(id, 16, (n + 15) / 16, if (n == 0) 0.0 else s.toDouble / n)
    }
}
