package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a 64-bit SimHash fingerprint
  * of a token array as 16 lowercase hex chars — bit-identical to the
  * composed-HOF form in Dedup.simhash (md5 per token read as 4
  * big-endian 16-bit words, ±1 majority vote per bit, MSB-first
  * repack) but evaluated in one tight JVM loop per row.
  *
  * Why an Expression and not the HOF chain: the declarative form
  * expands to ~70 Catalyst expressions PER TOKEN (md5 → 4×
  * conv(substring) → 64 mask tests → zip_with fold), each allocating
  * intermediate arrays; this kernel hashes the token's bytes directly
  * and updates a single int[64] — ~7× faster end-to-end (BENCH r4),
  * same bits. doGenCode stays inside whole-stage codegen by emitting a
  * static call into this kernel, so the surrounding operators (scan,
  * projection) still fuse into one generated function.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Column form, usable anywhere a built-in function is. */
  def simhash64(toks: Column): Column =
    ColumnGlue.column(SimHash64(ColumnGlue.expression(toks)))

  private val mdPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The kernel: one int[64] of ±1 votes over every token occurrence
    * (term-frequency weighted, like the HOF form), then MSB-first
    * nibble repack. Null tokens are skipped (split() never produces
    * them; defensive). */
  def compute(arr: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val md = mdPool.get()
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(t).getBytes)
        var w = 0
        while (w < 4) {
          val v = ((digest(2 * w) & 0xff) << 8) | (digest(2 * w + 1) & 0xff)
          val base = w * 16
          var j = 0
          while (j < 16) {
            if (((v >> (15 - j)) & 1) == 1) counts(base + j) += 1
            else counts(base + j) -= 1
            j += 1
          }
          w += 1
        }
      }
      t += 1
    }
    val out = new Array[Byte](16)
    var d = 0
    while (d < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        v = (v << 1) | (if (counts(4 * d + b) > 0) 1 else 0)
        b += 1
      }
      out(d) = (if (v < 10) '0' + v else 'a' + v - 10).toByte
      d += 1
    }
    UTF8String.fromBytes(out)
  }
}
