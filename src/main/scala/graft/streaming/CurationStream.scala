package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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
}
