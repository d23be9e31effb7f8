package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.WinnowMins

/** Structured Streaming twins of the batch curation operators — the
  * ingest-time shape of quota enforcement: admit documents as they
  * arrive, per-key, until the key's quota is filled.
  */
object CurationStream {

  /** Streaming per-key admission cap: admit the first n rows of each
    * key IN ARRIVAL ORDER, drop the rest. The streaming form of
    * Curation.capPerKey — where the batch operator replays
    * deterministically by lowest id, a stream can only rank by
    * arrival, so the admitted SET differs from the batch result
    * unless arrival order is id order (the spec pins exactly that
    * case).
    *
    * "Arrival order" is well-defined ACROSS micro-batches (the count
    * state advances batch by batch) but NOT within one: the
    * post-shuffle group iterator order is nondeterministic, so which
    * rows of a key win a quota that fills mid-batch can differ
    * across reruns/recovery. Pass orderCol to make that choice
    * deterministic — the key's rows in each batch are sorted by that
    * column (nulls first) before admitting, at the cost of buffering
    * one (key, micro-batch) group in memory (bounded by batch size,
    * not stream length). Determinism holds exactly when orderCol is
    * unique per (key, batch) — use an id column; ties fall back to
    * the iterator order the sort is stable over. orderCol must be an
    * atomic (orderable) type, checked at plan time. Groups whose
    * quota is already full skip the buffer+sort entirely — in the
    * steady state of a long stream, saturated keys cost O(1) per
    * batch, not a sort.
    *
    * State per key is ONE long (the admitted count), kept forever
    * (NoTimeout): a quota is a lifetime budget, so state size is
    * O(distinct keys) — at 100 TB that is the domain/source
    * cardinality (millions), a few MB of state, not corpus-sized.
    * flatMapGroupsWithState in append mode — the escape hatch for
    * per-group logic with output cardinality 0..group-size that
    * windowed aggregation can't express. */
  def capPerKey(docs: DataFrame, keyCol: String, n: Int,
                orderCol: Option[String] = None): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val schema = docs.schema
    val ki = schema.fieldIndex(keyCol)
    val oi = orderCol.map { c =>
      val i = schema.fieldIndex(c)
      // fail at plan time, not mid-batch on an executor: the runtime
      // comparator casts to java.lang.Comparable, which the external
      // values of array/map/struct/binary columns are not
      import org.apache.spark.sql.types._
      val comparable = schema(i).dataType match {
        case StringType | BooleanType | ByteType | ShortType | IntegerType | LongType |
             FloatType | DoubleType | DateType | TimestampType | TimestampNTZType => true
        case _: DecimalType => true
        case _ => false
      }
      require(comparable,
        s"orderCol '$c' must be an orderable scalar type, got ${schema(i).dataType}")
      i
    }
    implicit val keyEnc = Encoders.STRING
    implicit val rowEnc = Encoders.row(schema)
    implicit val stateEnc = Encoders.scalaLong
    // marker-prefixed key: a NULL key must be its OWN quota group
    // (as in the batch operator's groupBy), not collapse into the
    // string "null" and share that domain's budget
    docs.groupByKey((r: Row) =>
      if (r.isNullAt(ki)) "" else "v" + String.valueOf(r.get(ki)))(keyEnc)
      .flatMapGroupsWithState[Long, Row](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state) =>
          var admitted = state.getOption.getOrElse(0L)
          val ordered = oi match {
            case _ if admitted >= n => Iterator.empty // saturated: drop without buffering
            case None => rows
            case Some(i) => rows.toIndexedSeq.sorted(new Ordering[Row] {
              def compare(a: Row, b: Row): Int = (a.isNullAt(i), b.isNullAt(i)) match {
                case (true, true)  => 0
                case (true, false) => -1
                case (false, true) => 1
                case _ => a.get(i).asInstanceOf[Comparable[Any]].compareTo(b.get(i))
              }
            }).iterator
          }
          val out = Seq.newBuilder[Row]
          ordered.foreach { r =>
            if (admitted < n) { out += r; admitted += 1 }
          }
          state.update(admitted)
          out.result().iterator
      }
  }

  /** Ingest-time benchmark decontamination: drop arriving documents
    * sharing ≥ minShared winnow fingerprints with a STATIC eval
    * suite. The suite's distinct fingerprints are computed ONCE at
    * query-build time and shipped as a plan literal — the broadcast
    * side-input posture of the K-Means centroid step: an eval suite
    * is thousands of documents, so its fingerprint set is KBs–MBs
    * (guarded by maxBenchFps, loudly), never corpus-sized. The
    * filter is then pure rowwise codegen: no join, no state, no
    * watermark — a document's fate depends only on its own text, so
    * batch and streaming agree EXACTLY (pinned in
    * CurationStreamSpec), and restart/replay cannot change it.
    *
    * Same detection guarantee as Curation.winnowContamination (any
    * shared substring of length ≥ w+k-1 chars yields a shared
    * fingerprint), but the threshold pools fingerprints across the
    * whole suite: a doc sharing one fingerprint with each of three
    * probes counts 3 here, where the batch report counts per-probe.
    * At minShared=1 (the drop-decision default) they agree. For
    * suites too big for a plan literal, run the batch operator's
    * broadcast join instead — this is the latency path. */
  def dropContaminated(docs: DataFrame, textCol: String,
                       bench: DataFrame, benchText: String,
                       k: Int = 5, w: Int = 4, minShared: Int = 1,
                       maxBenchFps: Int = 2000000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(bench.isStreaming == false,
      "bench must be a static DataFrame — its fingerprints become a plan literal")
    val fps = bench
      .select(explode(array_distinct(WinnowMins.winnowMins(col(benchText), k, w))).as("f"))
      .distinct().collect().map(_.getLong(0))
    require(fps.length <= maxBenchFps,
      s"benchmark fingerprint set (${fps.length}) exceeds maxBenchFps=$maxBenchFps — " +
        "use Curation.winnowContamination's broadcast join for suites this large")
    val benchLit = typedlit(fps.sorted.toSeq)
    docs.filter(
      size(array_intersect(WinnowMins.winnowMins(col(textCol), k, w), benchLit)) < minShared)
  }

  final case class KmvSketchRow(key: String, n_sketch: Long,
                                kth_min: Option[Long], est: Double)

  /** Streaming twin of Curation.kmvDistinct: the per-key K-Minimum-
    * Values distinct sketch maintained across micro-batches. This is
    * the property HLL is usually chosen for — and KMV shares it: the
    * sketch is a bounded MERGEABLE state (the k smallest distinct
    * hashes), so ingest-time cardinality tracking needs O(k) longs
    * per key, forever, regardless of stream length. Each batch folds
    * its hashes into the state and re-emits the key's current
    * (n_sketch, kth_min, est) — update-mode semantics.
    *
    * Exactness contract: after ANY prefix of batches, a key's
    * emission is bit-identical to batch kmvDistinct over the rows
    * seen so far — same md5-derived hash, same (k−1)·2³²/kth_min
    * division (the spec pins this batch-twin equality). Merging is
    * set-union of minima: arrival order cannot matter. */
  def kmvDistinct(docs: DataFrame, keyCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"sketch size must be >= 2, got $k")
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val strEnc = Encoders.STRING
    implicit val stateEnc: org.apache.spark.sql.Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    implicit val outEnc = Encoders.product[KmvSketchRow]
    docs
      .select(col(keyCol).cast("string").as("k"),
        conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .filter(col("hv").isNotNull)
      .groupByKey((r: Row) => r.getString(0))(strEnc)
      .mapGroupsWithState[Array[Long], KmvSketchRow](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Row], state: org.apache.spark.sql.streaming.GroupState[Array[Long]]) =>
          val cur = state.getOption.getOrElse(Array.empty[Long])
          val merged = (cur ++ rows.map(_.getLong(1))).distinct.sorted.take(k)
          state.update(merged)
          val n = merged.length
          if (n < k) KmvSketchRow(key, n.toLong, None, n.toDouble)
          else KmvSketchRow(key, n.toLong, Some(merged.last),
            ((k - 1).toLong * 4294967296L).toDouble / merged.last.toDouble)
      }.toDF()
  }
}
