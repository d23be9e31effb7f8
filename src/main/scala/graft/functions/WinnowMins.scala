package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing winnowing per-window minima
  * of the k-gram rolling hashes of a string — bit-identical to the
  * composed-HOF form in TextAnalysis.winnowMins (pinned by property
  * test in PureKernelProps) but one tight JVM loop per row.
  *
  * Why an Expression: the HOF form splits the text into a per-
  * character string array, then for each of the m ≈ |text| gram
  * positions slices a k-element sub-array and folds it — O(m·k)
  * ARRAY ALLOCATIONS plus boxed ascii()/mod arithmetic per document;
  * the window-minima stage slices again per window. This kernel
  * decodes code points once into an int buffer and runs the same
  * arithmetic in primitive longs.
  *
  * Contract match with the HOF twin (and the DuckDB oracle):
  *  - characters = Unicode code points (split(text, '') semantics);
  *  - per-char value = Spark ascii(): the code point itself;
  *  - gram hash = fold acc·31 + cp mod 2³¹-1 over k chars;
  *  - m = numChars - (k-1); m < 1 → empty array; m ≤ w → [min of
  *    all]; else m-w+1 sliding-window minima in order.
  */
case class WinnowMins(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_mins requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowMins.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowMins.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {

  /** Column form, usable anywhere a built-in function is. */
  def winnowMins(text: Column, k: Int, w: Int): Column =
    ColumnGlue.column(WinnowMins(ColumnGlue.expression(text), k, w))

  private val P = 2147483647L

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    // decode once: code points in order (split('') + ascii() twin)
    val s = text.toString
    val len = s.length
    var nChars = 0
    val cps = new Array[Int](len)
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      cps(nChars) = cp
      nChars += 1
      i += Character.charCount(cp)
    }
    val m = nChars - (k - 1)
    if (m < 1) return new GenericArrayData(new Array[Long](0))
    // k-gram rolling hashes (non-rolling fold per gram, matching the
    // HOF's per-slice aggregate exactly — same mod points)
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 31L + cps(g + j)) % P
        j += 1
      }
      hs(g) = acc
      g += 1
    }
    if (m <= w) {
      var mn = Long.MaxValue
      var x = 0
      while (x < m) { if (hs(x) < mn) mn = hs(x); x += 1 }
      return new GenericArrayData(Array(mn))
    }
    val out = new Array[Long](m - w + 1)
    var j2 = 0
    while (j2 <= m - w) {
      var mn = Long.MaxValue
      var x = j2
      while (x < j2 + w) { if (hs(x) < mn) mn = hs(x); x += 1 }
      out(j2) = mn
      j2 += 1
    }
    new GenericArrayData(out)
  }
}
