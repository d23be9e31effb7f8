package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable

/** Bounded-state frequent-items sketch (Misra & Gries 1982), merged
  * with the count-subtraction rule of Agarwal et al. 2012 ("Mergeable
  * Summaries") — the candidate-generation half of the exact two-pass
  * heavy-hitters operator (Curation.heavyHitters).
  *
  * Guarantee: with k counters, every key whose true frequency exceeds
  * n/k SURVIVES in the final state — per partition (each decrement
  * step removes k+1 occurrences at once, so a > n/k key can never hit
  * zero forever), and across merges (subtracting the (k+1)-th largest
  * count keeps every estimate within the summed deficiency bound).
  * The state may also hold false positives and UNDER-estimates the
  * surviving counts — which is why the operator's second exact pass
  * exists; this aggregate only has to never LOSE a true heavy hitter.
  *
  * Scale shape: the whole point vs `groupBy(key).count()` — state is
  * ≤ k entries per task regardless of the number of DISTINCT keys, so
  * a 100 TB corpus with billions of distinct tokens ships k strings
  * per task instead of a vocabulary-sized shuffle. Candidate sets are
  * partitioning-DEPENDENT (arrival order matters to MG); only the
  * operator's exact-threshold output is deterministic.
  */
class MisraGriesAgg(k: Int)
  extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(m: mutable.HashMap[String, Long], key: String): mutable.HashMap[String, Long] = {
    if (key != null) {
      m.get(key) match {
        case Some(c) => m.update(key, c + 1)
        case None if m.size < k => m.update(key, 1L)
        case None =>
          // the MG step: decrement every counter, dropping zeros —
          // O(k), paid at most once per k increments (amortized O(1))
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (kk, c) => if (c == 1L) dead += kk else m.update(kk, c - 1) }
          dead.foreach(m.remove)
      }
    }
    m
  }

  def merge(a: mutable.HashMap[String, Long],
            b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (kk, c) => a.update(kk, a.getOrElse(kk, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all, drop <= 0 —
      // the mergeable-summaries shrink that preserves the deficiency
      // bound (ties beyond the cut die together; harmless, the bound
      // is one-sided)
      val cut = a.values.toArray.sortInPlace()(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (kk, c) => if (c - cut <= 0L) dead += kk else a.update(kk, c - cut) }
      dead.foreach(a.remove)
    }
    a
  }

  def finish(m: mutable.HashMap[String, Long]): Seq[String] = m.keys.toSeq.sorted

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] = MisraGriesAgg.mapEnc
  def outputEncoder: Encoder[Seq[String]] = MisraGriesAgg.seqEnc
}

object MisraGriesAgg {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val seqEnc: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
  private[functions] val mapEnc: Encoder[mutable.HashMap[String, Long]] =
    ExpressionEncoder[mutable.HashMap[String, Long]]()

  /** `df.agg(mgCandidates(k, key))` — candidate heavy-hitter keys,
    * sorted; a SUPERSET of every key with frequency > n/k. */
  def mgCandidates(k: Int, key: Column): Column =
    udaf(new MisraGriesAgg(k)).apply(key)
}
