package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus interchange — one JSON object per line, the standard
  * LLM training-data exchange format (and the gap left once GeneIO
  * covers the reference's TSV formats: a pipeline that ingests from
  * or hands off to other tools speaks JSONL, not parquet).
  *
  * Scale posture:
  *  - the WRITER is a rowwise `to_json(struct(...))` projection into
  *    a splittable text sink — no shuffle unless the caller asks for
  *    a shard count (then ONE round-robin repartition, never a global
  *    sort);
  *  - the READER is a splittable text scan with schema-PROJECTED
  *    parsing (Jackson inside codegen; unreferenced fields are never
  *    materialized) and PERMISSIVE corrupt-line capture, so one
  *    malformed line among 100 TB costs one audit row, not the
  *    ingest job (the reference's parse path is fatal-on-error —
  *    `KMeans.java:368-371` — which a corpus-scale ingest cannot
  *    afford).
  *
  * Round-trip exactness is the contract the oracle gates
  * (q_jsonl_roundtrip): JSON string escaping is lossless for any
  * UTF-8 text (quotes, newlines, control chars), numeric fields
  * round-trip as their declared schema types, and absent/null fields
  * read back as NULL (Spark's to_json omits null fields by design).
  */
object DocIO {

  /** Render every column of `df` as one JSON object per row and write
    * as text. shards > 0 adds one round-robin repartition for a fixed
    * output file count (0 = keep the scan's partitioning). */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 0): Unit = {
    require(shards >= 0, s"shards must be >= 0, got $shards")
    val out = df.select(to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))
    val sharded = if (shards > 0) out.repartition(shards) else out
    sharded.write.mode("overwrite").text(path)
  }

  /** Schema'd JSONL read with corrupt-line capture: malformed lines
    * land with every data column NULL and the raw line preserved in
    * `corruptCol` (PERMISSIVE mode) — filter `corruptCol.isNotNull`
    * for the audit, `.isNull` for the clean feed. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains '$corruptCol' — pick another corruptCol name")
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** CSV metadata-table writer (header + RFC-4180 quoting). CSV is
    * for FLAT tables — ids, labels, metrics, partition manifests:
    * multiLine stays OFF, so a row never crosses a line boundary and
    * the scan stays SPLITTABLE (the 100 TB posture; corpus text with
    * embedded newlines belongs in JSONL above, where escaping keeps
    * every record one line by construction). NULL is written as \N
    * (the classic dump convention) so it round-trips distinguishably
    * from the empty string — CSV's default "" encoding for both is
    * lossy.
    *
    * Embedded line breaks FAIL the write (ADVICE r11): the writer
    * would quote them per RFC-4180, but readCsv keeps multiLine off
    * (splittability), so such data writes cleanly and reads back
    * corrupt — a silent round-trip break. The guard is a rowwise
    * codegen'd rlike inside the write projection (no extra scan);
    * strip or escape line breaks upstream, or use JSONL. */
  def writeCsv(df: DataFrame, path: String, shards: Int = 0): Unit = {
    require(shards >= 0, s"shards must be >= 0, got $shards")
    val guarded = df.select(df.schema.fields.map { f =>
      if (f.dataType == StringType)
        // the literal 2-char string \N is indistinguishable from NULL
        // under the dump convention — same silent-round-trip class
        when(col(f.name).rlike("[\n\r]") || col(f.name) === "\\N", raise_error(concat(
            lit(s"writeCsv: string column '${f.name}' holds an embedded line " +
              "break or the literal \\N — readCsv (multiLine off, \\N = NULL) " +
              "cannot round-trip it; strip/escape upstream or use writeJsonl"),
            lit(" (value: "), substring(col(f.name), 1, 80), lit(")"))))
          .otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)
    val sharded = if (shards > 0) guarded.repartition(shards) else guarded
    // the writer's whitespace trim defaults to ON (unlike the reader's
    // parse side) and silently eats leading/trailing spaces — found by
    // the round-trip fuzz; pinned off for losslessness
    sharded.write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }

  /** Schema'd CSV read with the writeCsv conventions (header, \N for
    * NULL) and the same PERMISSIVE corrupt-line capture contract as
    * readJsonl. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains '$corruptCol' — pick another corruptCol name")
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("header", "true").option("nullValue", "\\N")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }

  /** Ingest audit: (clean, corrupt) line counts in one pass. The
    * parsed frame is cached for the scan: Spark refuses a raw-JSON
    * read whose pushed projection is ONLY the corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the
    * parser cannot know a line is corrupt without materializing the
    * data columns), and caching the parsed result is the documented
    * contract for auditing it. */
  def ingestAudit(parsed: DataFrame,
                  corruptCol: String = "_corrupt_record"): (Long, Long) = {
    val cached = parsed.cache()
    try {
      val row = cached.agg(
        sum(when(col(corruptCol).isNull, 1L).otherwise(0L)).cast("long"),
        sum(when(col(corruptCol).isNotNull, 1L).otherwise(0L)).cast("long")).head()
      (if (row.isNullAt(0)) 0L else row.getLong(0),
        if (row.isNullAt(1)) 0L else row.getLong(1))
    } finally { cached.unpersist(); () }
  }
}
