package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the unigram-LM Viterbi segmentation
  * — the compiled form of UnigramTokenizer's rowwise DP (kept as the
  * test twin `segmentWordsHof`, pinned in UnigramTokenizerSpec).
  *
  * Why an Expression (the PqEncodeExpr / NearestCentroidExpr
  * precedent): the r18 rowwise DP removed the 16 per-round shuffles —
  * the scale-correct half — but ran the lattice as an interpreted
  * `aggregate`/`transform` HOF chain (CodegenFallback) probing the
  * vocabulary through `try_element_at` on a plan MAP literal, which
  * Spark's GetMapValue scans LINEARLY per probe. Per distinct word
  * that is O(len · maxPieceLen · |vocab|) string compares plus boxed
  * struct allocations per lattice step — the honest 0.67× sf1
  * regression on q_unigram_encode, and far worse at production vocab
  * sizes (10⁴–10⁵ pieces; ADVICE r18). This kernel runs the SAME DP
  * as one primitive loop per word with the vocabulary in a HASH map
  * (O(1) probes, byte-equality on UTF8String), so cost is
  * O(len · maxPieceLen) per word independent of |vocab|.
  *
  * Bit-exactness contract (every decision replayed from the HOF twin,
  * which the DuckDB oracle mirrors):
  *  - positions and pieces are CODE POINTS (UTF-8 lead-byte
  *    boundaries — exactly UTF8String's numChars/substring units, the
  *    units Spark's length()/substr() and the old split/sequence DP
  *    used);
  *  - probabilities multiply left-to-right along the path
  *    (prob(prefix) · p(piece) — the identical IEEE product order);
  *  - per position, candidates are visited in ascending start order
  *    (the old `sequence(max(1, j−L+1), j)`), the first reachable one
  *    seeds the running best, and a candidate replaces it only when
  *    (prob desc, np asc, pieces asc) strictly improves — pieces
  *    compared as BINARY UTF-8 bytes (UTF8String.compareTo), which is
  *    precisely Spark's string `<`;
  *  - no-path words fall back to one `unk` piece, or with
  *    `fallbackChars` to the per-character expansion: covered chars
  *    as their char pieces, unseen chars as their UTF-8 bytes
  *    rendered `<0xNN>` (uppercase hex — hex()'s convention);
  *  - a NULL word mirrors the HOF chain's CaseWhen fallthrough:
  *    (unk, 1) without fallbackChars, NULL with (split(NULL) nulls
  *    the piece array there).
  */
final class UnigramSegModel(val pieces: Array[String],
                            val probs: Array[Double],
                            val maxPieceLen: Int,
                            val fallbackChars: Array[String],
                            val unk: String) extends Serializable {
  def hasFallback: Boolean = fallbackChars != null
  @transient lazy val probMap: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(UTF8String.fromString(pieces(i)), java.lang.Double.valueOf(probs(i)))
      i += 1
    }
    m
  }
  @transient lazy val fbSet: java.util.HashSet[UTF8String] =
    if (fallbackChars == null) null
    else {
      val s = new java.util.HashSet[UTF8String](fallbackChars.length * 2)
      fallbackChars.foreach(c => s.add(UTF8String.fromString(c)))
      s
    }
  @transient lazy val unkU: UTF8String = UTF8String.fromString(unk)
}

case class UnigramSegExpr(child: Expression,
                          pieces: Vector[String], probs: Vector[Double],
                          maxPieceLen: Int,
                          fallbackChars: Option[Vector[String]],
                          unk: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "unigram_segment"
  override def inputTypes: Seq[ColumnGlue.AbstractType] = Seq(StringType)
  /** Field nullability mirrors the HOF twin's CaseWhen outputs, so the
    * checkpointed frame's schema is unchanged. */
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", StringType, nullable = true),
    StructField("np", LongType, nullable = true)))
  override def nullable: Boolean = true
  @transient private lazy val model: UnigramSegModel =
    new UnigramSegModel(pieces.toArray, probs.toArray, maxPieceLen,
      fallbackChars.map(_.toArray).orNull, unk)
  override def eval(input: InternalRow): Any =
    UnigramKernels.segment(child.eval(input).asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val modelRef = ctx.addReferenceObj("unigramSegModel", model,
      classOf[UnigramSegModel].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        InternalRow ${ev.value} = graft.functions.UnigramKernels.segment(
          ${childGen.isNull} ? null : ${childGen.value}, $modelRef);
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(c: Expression): UnigramSegExpr =
    copy(child = c)
}

object UnigramKernels {

  /** (pieces, np) struct column for one Viterbi segmentation of `w`.
    * `vocab` is the model's (piece, probability) list — vocabSize-
    * bounded driver data, embedded in the plan like a codebook. */
  def segmentCol(w: Column, vocab: Seq[(String, Double)], maxPieceLen: Int,
                 fallbackChars: Option[Seq[String]], unk: String): Column =
    ColumnGlue.column(UnigramSegExpr(ColumnGlue.expression(w),
      vocab.map(_._1).toVector, vocab.map(_._2).toVector, maxPieceLen,
      fallbackChars.map(_.toVector), unk))

  private val Space = UTF8String.fromString(" ")
  private val HexU = "0123456789ABCDEF".getBytes("US-ASCII")

  private def unkRow(m: UnigramSegModel): InternalRow =
    new GenericInternalRow(Array[Any](m.unkU, 1L))

  /** `<0xNN>` byte pieces of one code point's UTF-8 bytes. */
  private def bytePieces(bytes: Array[Byte], from: Int, until: Int,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    var i = from
    while (i < until) {
      val b = bytes(i) & 0xff
      val p = new Array[Byte](6)
      p(0) = '<'; p(1) = '0'; p(2) = 'x'
      p(3) = HexU(b >>> 4); p(4) = HexU(b & 0xf); p(5) = '>'
      out.add(UTF8String.fromBytes(p))
      i += 1
    }
  }

  /** One word's Viterbi segmentation — see UnigramSegExpr for the
    * bit-exactness contract. Returns null only for a NULL word under
    * byte-fallback (mirroring the HOF chain). */
  def segment(w0: UTF8String, m: UnigramSegModel): InternalRow = {
    if (w0 == null) return if (m.hasFallback) null else unkRow(m)
    // own copy of the bytes: piece views below must not alias a
    // reusable row buffer, and the copy makes the returned string safe
    val bytes = w0.getBytes
    // code-point boundaries — UTF8String's own character unit
    val nBytes = bytes.length
    val offs = new Array[Int](nBytes + 1)
    var n = 0
    var i = 0
    while (i < nBytes) {
      offs(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(n) = nBytes
    val L = m.maxPieceLen
    val probMap = m.probMap
    // st(k) = best segmentation of the length-k prefix
    val ok = new Array[Boolean](n + 1)
    val prob = new Array[Double](n + 1)
    val np = new Array[Long](n + 1)
    val pcs = new Array[UTF8String](n + 1)
    ok(0) = true; prob(0) = 1.0; np(0) = 0L; pcs(0) = UTF8String.EMPTY_UTF8
    var j = 1
    while (j <= n) {
      var bOk = false
      var bPr = 0.0
      var bNp = 0L
      var bPc: UTF8String = null
      var s = if (j - L + 1 > 1) j - L + 1 else 1
      while (s <= j) {
        if (ok(s - 1)) {
          val off = offs(s - 1)
          val piece = UTF8String.fromBytes(bytes, off, offs(j) - off)
          val p = probMap.get(piece)
          if (p != null) {
            val cPr = prob(s - 1) * p.doubleValue()
            val cNp = np(s - 1) + 1L
            val cPc = if (pcs(s - 1).numBytes() == 0) piece
                      else UTF8String.concat(pcs(s - 1), Space, piece)
            if (!bOk) { bOk = true; bPr = cPr; bNp = cNp; bPc = cPc }
            else if (cPr > bPr || (cPr == bPr &&
                (cNp < bNp || (cNp == bNp && cPc.compareTo(bPc) < 0)))) {
              bPr = cPr; bNp = cNp; bPc = cPc
            }
          }
        }
        s += 1
      }
      ok(j) = bOk; prob(j) = bPr; np(j) = bNp
      pcs(j) = if (bOk) bPc else UTF8String.EMPTY_UTF8
      j += 1
    }
    if (ok(n)) return new GenericInternalRow(Array[Any](pcs(n), np(n)))
    if (!m.hasFallback) return unkRow(m)
    // byte fallback: covered chars as char pieces, unseen chars as
    // their UTF-8 bytes rendered <0xNN>
    val parts = new java.util.ArrayList[UTF8String](n)
    val fb = m.fbSet
    var c = 0
    while (c < n) {
      val off = offs(c)
      val cp = UTF8String.fromBytes(bytes, off, offs(c + 1) - off)
      if (fb.contains(cp)) parts.add(cp)
      else bytePieces(bytes, off, offs(c + 1), parts)
      c += 1
    }
    val joined = UTF8String.concatWs(Space,
      parts.toArray(new Array[UTF8String](parts.size())): _*)
    new GenericInternalRow(Array[Any](joined, parts.size().toLong))
  }
}
