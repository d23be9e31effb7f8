package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregation: keeps the k (score desc, id asc)-best
  * (id, score) pairs per group.
  *
  * This is the similarity-search scale primitive: a window
  * `row_number() <= k` over (probe × corpus) shuffles EVERY scored row
  * to the probe's partition — O(corpus) network per probe. This
  * Aggregator runs in partial mode before the exchange, so each map
  * task ships at most k pairs per probe: the shuffle is
  * O(k · tasks · probes), independent of corpus size — the same
  * shape-change VectorMeanAgg gives K-Means (SURVEY.md §2 op 7-8).
  *
  * Determinism: the final order is (score desc, id asc), so equal
  * scores break toward the lowest id — matching the oracle SQL's
  * ORDER BY score DESC, id.
  */
class TopKAgg(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  // keep buffers slightly over-full and trim lazily to amortize sorting
  private val slack = math.max(4 * k, 64)

  private def trim(b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] =
    if (b.length <= k) b
    else b.sortInPlace()(ordering).take(k)

  private val ordering: Ordering[(Long, Double)] =
    Ordering.by { case (id, score) => (-score, id) }

  def zero: Seq[(Long, Double)] = Seq.empty

  def reduce(b: Seq[(Long, Double)], v: (Long, Double)): Seq[(Long, Double)] = {
    val buf = ArrayBuffer.from(b)
    buf += v
    (if (buf.length > slack) trim(buf) else buf).toSeq
  }

  def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(ArrayBuffer.from(a ++ b)).toSeq

  def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.sorted(ordering).take(k)

  def bufferEncoder: Encoder[Seq[(Long, Double)]] = TopKAgg.seqEnc
  def outputEncoder: Encoder[Seq[(Long, Double)]] = TopKAgg.seqEnc
}

object TopKAgg {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val seqEnc: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  /** `groupBy(probe).agg(topK(k, id, score))` — long id, double score. */
  def topK(k: Int, id: Column, score: Column): Column =
    udaf(new TopKAgg(k)).apply(id, score)
}
