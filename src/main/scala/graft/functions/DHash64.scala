package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the 64-bit perceptual
  * difference hash (dHash) of a binary payload as 16 lowercase hex
  * chars — bit-identical to the staged-HOF form in
  * Multimodal.dHashHof (72 floor-div-spaced byte samples, bit (r,c) =
  * 1 iff sample[r·9+c] < sample[r·9+c+1], MSB-first nibble repack)
  * but evaluated in one tight JVM loop per row.
  *
  * Why an Expression and not the HOF chain: the declarative form
  * costs a byte-array materialization (split + ascii per byte) plus
  * 72 element_at samples and 64 comparisons through staged
  * projections per row — this kernel indexes the payload bytes
  * directly. doGenCode emits a static call so the surrounding plan
  * stays inside whole-stage codegen. Empty payloads evaluate to NULL
  * (there is no image to hash); callers drop the null row.
  */
case class DHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dhash64 requires binary, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // nullSafeCodeGen (not defineCodeGen): compute returns null for
    // empty payloads, so the result's null flag must be re-checked
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.DHash64.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): DHash64 =
    copy(child = newChild)
}

object DHash64 {

  /** Column form, usable anywhere a built-in function is. */
  def dhash64(content: Column): Column =
    ColumnGlue.column(DHash64(ColumnGlue.expression(content)))

  /** The kernel: 72 evenly spaced samples (floor(k·n/72), matching
    * the HOF twin's exact integer arithmetic), 8 rows × 8 adjacent-
    * sample comparisons, MSB-first nibble repack. Returns null for an
    * empty payload. */
  def compute(bytes: Array[Byte]): UTF8String = {
    val n = bytes.length
    if (n == 0) return null
    val s = new Array[Int](72)
    var k = 0
    while (k < 72) {
      s(k) = bytes(((k.toLong * n) / 72L).toInt) & 0xff
      k += 1
    }
    val out = new Array[Byte](16)
    var d = 0
    while (d < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        val bit = 4 * d + b           // bit index 0..63
        val r = bit >> 3
        val c = bit & 7
        v = (v << 1) | (if (s(r * 9 + c) < s(r * 9 + c + 1)) 1 else 0)
        b += 1
      }
      out(d) = (if (v < 10) '0' + v else 'a' + v - 10).toByte
      d += 1
    }
    UTF8String.fromBytes(out)
  }
}
