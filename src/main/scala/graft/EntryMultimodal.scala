package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{ClusterMetrics, Curation, Dedup, Events, Graph, KMeans, Multimodal, PCA, Sampling, Similarity, Skew, TemporalJoins, TextAnalysis, Tokenizer}
import graft.functions.VectorOps
import graft.sources.GeneIO
import graft.streaming.{DedupStream, EventStream}
import graft.EntryHelpers._

/** Multimodal (binary column) metadata, frame sampling, embedding plumbing.
  *
  * One slice of the driver contract, split out of the former
  * monolithic SparkEntry maps (VERDICT r10 item 7) purely for
  * compile-time and review tractability — SparkEntry.queries /
  * .oracleSql concatenate the slices; entry text is unchanged. */
private[graft] object EntryMultimodal {

  import KMeans.{FirstK, ExplicitIds}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── multimodal: binary payload ingest + typed metadata ──────────
    // The payload is the text's UTF-8 bytes standing in for media
    // bytes; the schema/plumbing (opaque binary + struct metadata,
    // payload column prunable) is the real 100 TB path.
    "q_mm_meta" -> ((s, dir) => {
      mmTable(s, dir).select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"), col("meta.n_bytes").as("n_bytes"))
    }),


    // ── multimodal: stubbed decode → pixel statistics ───────────────
    // (hex-pair byte arithmetic — the deterministic fake decode; the
    // mapPartitions batch path is pinned equal in MultimodalSpec)
    "q_mm_stats" -> ((s, dir) => {
      Multimodal.pixelStats(mmTable(s, dir), "doc_id", "content")
    }),


    // ── multimodal: fixed-size frame sampling over the binary column
    "q_mm_frames" -> ((s, dir) => {
      Multimodal.frameSample(mmTable(s, dir), "doc_id", "content", frameBytes = 256)
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          md5(hex(col("frame"))).as("frame_md5"))
    }),


    // ── multimodal: deterministic feature extraction → embedding ────
    "q_mm_embed" -> ((s, dir) => {
      Multimodal.featureExtract(mmTable(s, dir), "doc_id", "content", d = 8)
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("d0", "v")))
        .select(col("doc_id"), (col("d0") + 1).cast("int").as("dim"), col("v"))
    }),


    // ── multimodal: perceptual dHash image near-dup ─────────────────
    // The image twin of q_simhash_neardup: 64-bit gradient hash per
    // payload, banded-Hamming candidates, exact verify ≤ 3 bits.
    // Every doc's first 144 bytes become a fixed-size "image"; docs
    // with doc_id%10=0 also plant a variant copy with the first byte
    // flipped — a single-pixel edit the gradient hash must land
    // within a few bits of (re-encode/edit robustness, which raw
    // byte hashing cannot express). Mirrored in the oracle.
    "q_image_neardup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), substring(col("text"), 1, 144).as("img"))
      val variants = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("x"), substring(substring(col("text"), 1, 144), 2, 143)).as("img"))
      val payloads = Multimodal.withContent(base.unionByName(variants), "doc_id", "img")
      Multimodal.imageNearDup(payloads, "doc_id", "content",
        maxHamming = 3, maxBucket = 100)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q_image_neardup" ->
      """WITH pay AS (
        |  SELECT doc_id, substr(text, 1, 144) AS img FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'x' || substr(substr(text, 1, 144), 2, 143)
        |  FROM documents WHERE doc_id % 10 = 0
        |),
        |b AS (
        |  SELECT doc_id, hex(encode(img)) AS hx, octet_length(encode(img)) AS n
        |  FROM pay
        |),
        |px AS (
        |  SELECT doc_id, n,
        |         [CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT)
        |          for i in range(1, n+1)] AS px
        |  FROM b WHERE n > 0
        |),
        |smp AS (SELECT doc_id, [px[CAST((k*n)//72 AS INTEGER) + 1] for k in range(0, 72)] AS s
        |        FROM px),
        |bits AS (SELECT doc_id,
        |                [CASE WHEN s[(k//8)*9 + (k%8) + 1] < s[(k//8)*9 + (k%8) + 2]
        |                      THEN 1 ELSE 0 END for k in range(0, 64)] AS bt
        |         FROM smp),
        |fpt AS (SELECT doc_id,
        |               array_to_string([substr('0123456789abcdef',
        |                 bt[4*j+1]*8 + bt[4*j+2]*4 + bt[4*j+3]*2 + bt[4*j+4] + 1, 1)
        |                 for j in range(0, 16)], '') AS fp
        |        FROM bits),
        |bx0 AS (
        |  SELECT doc_id, fp, bi, substr(fp, bi*4+1, 4) AS bk
        |  FROM fpt CROSS JOIN range(0, 4) t(bi)
        |),
        |bxh AS (SELECT bi, bk FROM bx0 GROUP BY 1, 2 HAVING count(*) > 100),
        |bx AS (SELECT bx0.* FROM bx0 ANTI JOIN bxh USING (bi, bk)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id1, x.fp AS fp1, y.doc_id AS id2, y.fp AS fp2
        |  FROM bx x JOIN bx y ON x.bi = y.bi AND x.bk = y.bk AND x.doc_id < y.doc_id
        |),
        |hm AS (
        |  SELECT id1, id2,
        |         CAST(list_sum([bit_count(xor(CAST(concat('0x', substr(fp1, p, 1)) AS BIGINT),
        |                                      CAST(concat('0x', substr(fp2, p, 1)) AS BIGINT)))
        |                        for p in range(1, 17)]) AS INTEGER) AS hamming
        |  FROM cand
        |)
        |SELECT id1, id2, hamming FROM hm WHERE hamming <= 3""".stripMargin,


    "q_mm_meta" ->
      """SELECT doc_id, 'gray8' AS format, CAST(16 AS INTEGER) AS width,
        |       CAST((octet_length(encode(text)) + 15) // 16 AS INTEGER) AS height,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,


    "q_mm_stats" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |),
        |px AS (
        |  SELECT doc_id, n,
        |         [CAST(concat('0x', substr(hx, 2*i-1, 2)) AS BIGINT)
        |          for i in range(1, n+1)] AS px
        |  FROM b
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_px,
        |       coalesce(CAST(list_sum(px) AS BIGINT), 0) AS sum_px,
        |       list_min(px) AS min_px, list_max(px) AS max_px,
        |       CASE WHEN n > 0 THEN CAST(list_sum(px) AS DOUBLE) / CAST(n AS DOUBLE)
        |            ELSE 0.0 END AS mean_px
        |FROM px""".stripMargin,


    "q_mm_frames" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |         substr(hx, (i-1)*512+1, 512) AS fhx
        |  FROM (SELECT doc_id, hx,
        |               unnest(range(1, CAST((n + 255) // 256 AS BIGINT) + 1)) AS i
        |        FROM b)
        |)
        |SELECT doc_id, frame_idx, CAST(length(fhx) // 2 AS BIGINT) AS n_bytes,
        |       md5(fhx) AS frame_md5
        |FROM f""".stripMargin,


    "q_mm_embed" ->
      """SELECT doc_id, CAST(j AS INTEGER) AS dim,
        |       CAST(concat('0x', substr(md5(md5(text) || ':' || j), 1, 8)) AS BIGINT)
        |         / 4294967296.0 AS v
        |FROM documents CROSS JOIN generate_series(1, 8) t(j)""".stripMargin,
  )
}
