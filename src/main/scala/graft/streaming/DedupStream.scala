package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Structured Streaming twins of the batch dedup operators — for the
  * ingest-time shape of a training-data pipeline, where documents
  * arrive continuously and exact duplicates should be dropped before
  * they ever land in the corpus.
  *
  * State posture at 100 TB: the dedup state is ONE 32-hex-char hash
  * per distinct content seen within the watermark horizon, evicted as
  * the watermark advances (dropDuplicatesWithinWatermark) — memory is
  * bounded by arrival rate × horizon, not corpus size. Global
  * (horizon-free) dedup belongs in the batch operator
  * (Dedup.dropExactDuplicates) over the accumulated table.
  */
object DedupStream {

  /** Streaming exact dedup: keep the first arrival of each distinct
    * content, dropping later duplicates that arrive within the
    * watermark horizon. Dedup key = content hash of keyCols (same
    * contract as the batch Dedup.exactGroups); state is evicted by
    * the watermark. */
  def dropExactDuplicates(docs: DataFrame, tsCol: String, keyCols: Seq[String],
                          watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("__h", Dedup.contentHash(keyCols.map(col): _*))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Streaming MinHash LSH index build: the banding pipeline
    * (shingle → signature → band buckets) is stateless rowwise
    * compute, so it runs unchanged on a stream in append mode — each
    * arriving document emits its B bucket rows incrementally. The
    * bucket table/sink then serves candidate lookups. */
  def minhashBuckets(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, h: Int = 16, b: Int = 8,
                     parity: Boolean = false): DataFrame =
    Dedup.minhashBuckets(docs, idCol, textCol, n, h, b, parity)

  /** Streaming incremental exact dedup: drop arriving documents whose
    * content already exists in the STATIC corpus index (the persisted
    * Dedup.exactIndex relation — one 32-hex hash per distinct
    * content). A stream-static left-anti join is stateless per
    * micro-batch — no watermark, no state store; Spark re-plans the
    * static side each batch, so an index small enough broadcasts and
    * the stream is never shuffled. Batch ≡ streaming EXACTLY (the
    * join is the same relation algebra; DedupStreamSpec pins it).
    * Complementary to dropExactDuplicates above: that dedups the
    * stream against ITSELF within the watermark horizon; this dedups
    * it against the accumulated corpus. Run both at ingest — horizon
    * state catches burst dups, the index join catches everything
    * older. Refresh the index between batches by unioning admitted
    * hashes (exactIndex's contract). */
  def dropSeenExact(stream: DataFrame, index: DataFrame, keyCols: Seq[String]): DataFrame =
    Dedup.dropSeenExact(stream, index, keyCols)

  final case class BandFresh(doc_id: Long, band: Int, fresh: Int)

  /** Streaming near-dup admission state: LSH band-bucket OCCUPANCY.
    * Each arriving document's signature explodes to its B (band,
    * bucket) rows (stateless rowwise compute — the minhashBuckets
    * chain), then one flatMapGroupsWithState per bucket keeps the
    * lifetime minimum doc_id seen: a band row is `fresh` = 1 iff its
    * document is the FIRST EVER occupant of that bucket (arrival
    * order; within a micro-batch the lowest doc_id claims it, the
    * capPerKey determinism convention). A document is then ADMITTED
    * iff ALL its bands are fresh — i.e. it shares no bucket with any
    * earlier document, the streaming form of the batch candidate
    * rule (bb self-join on doc_id order). Too-short docs emit no
    * band rows and are the caller's pass-through, mirroring
    * dropSeenNearDup.
    *
    * State per bucket is ONE long — memory is O(distinct buckets
    * seen), the same asymptotics as the batch index it replaces, and
    * the decision is incremental: no rescan of the accumulated
    * corpus per batch. The all-bands-fresh fold is a stateless
    * per-doc aggregate over the sink (all B rows of a doc emit in
    * its arrival batch), kept outside the stateful plan — the
    * q_stream_kmv final-state-selection convention. */
  def bandOccupancy(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, h: Int = 16, b: Int = 8,
                    parity: Boolean = false): org.apache.spark.sql.Dataset[BandFresh] = {
    require(h % b == 0, s"h=$h must be divisible by b=$b")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val bands = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(Dedup.bandBuckets(
          Dedup.minhashSignatureOf(col(textCol), n, h, parity), b, h / b)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    implicit val outEnc = Encoders.product[BandFresh]
    implicit val stateEnc = Encoders.scalaLong
    bands.groupByKey((r: Row) => (r.getInt(1), r.getString(2)))
      .flatMapGroupsWithState[Long, BandFresh](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, String), rows: Iterator[Row], state: GroupState[Long]) =>
          val ids = rows.map(_.getLong(0)).toArray.sorted
          val prior = state.getOption
          state.update(math.min(prior.getOrElse(Long.MaxValue), ids.head))
          ids.iterator.zipWithIndex.map { case (d, i) =>
            BandFresh(d, key._1, if (prior.isEmpty && i == 0) 1 else 0)
          }
      }
  }
}
