package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing the h-element MinHash
  * signature of a shingle array in one pass — bit-identical to the
  * composed-HOF chain in Dedup (shingleHashes → minhashSignature,
  * pinned in DedupSpec) but evaluated as a single S·h integer loop
  * per row.
  *
  * Why an Expression: the HOF form materializes the S-element base-
  * hash array, then for EACH of the h signature rows allocates and
  * scans a fresh S-element transform result under array_min — h+1
  * array allocations and h·S boxed expression evaluations per
  * document. This kernel hashes each shingle once and folds the h
  * running minima in registers. Both base-hash modes are supported:
  *  - parity=true: first 32 bits of md5 (the DuckDB-mirrorable form
  *    the oracle gate hashes against);
  *  - parity=false: xxhash64 masked to 32 bits (the scale default) —
  *    delegated to Spark's own XxHash64Function so the bits match
  *    the built-in xxhash64() exactly.
  * Mixing: sig_i = min over shingles x of (a_i·x + b_i) mod (2³¹-1),
  * a_i = 1299721·i + 7, b_i = 104729·i — identical constants to
  * Dedup.minhashSignature (formula-derived so the oracle generates
  * them with range(1, h+1)).
  *
  * Returns null for an empty shingle array, mirroring the HOF form's
  * when(size > 0, ...) guard. doGenCode emits a static kernel call,
  * keeping the surrounding projection inside whole-stage codegen.
  */
case class MinHashSig(child: Expression, h: Int, parity: Boolean)
    extends UnaryExpression {
  require(h > 0, s"h must be positive, got $h")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], h, parity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($c, $h, $parity);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Column form, usable anywhere a built-in function is. */
  def minhashSig(shingles: Column, h: Int, parity: Boolean): Column =
    ColumnGlue.column(MinHashSig(ColumnGlue.expression(shingles), h, parity))

  private val P = 2147483647L

  private val mdPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The kernel: one base hash per shingle, h running minima updated
    * in place. Null shingles are skipped (array_distinct over split
    * output never produces them; defensive, and the HOF transform
    * would propagate a null INTO array_min which ignores it). */
  def compute(arr: ArrayData, h: Int, parity: Boolean): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](h)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = if (parity) mdPool.get() else null
    var t = 0
    var seen = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val s = arr.getUTF8String(t)
        val x =
          if (parity) {
            md.reset()
            val d = md.digest(s.getBytes)
            ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          } else {
            XxHash64Function.hash(s, StringType, 42L) & 0xffffffffL
          }
        var i = 1
        while (i <= h) {
          val v = ((1299721L * i + 7L) * x + 104729L * i) % P
          if (v < mins(i - 1)) mins(i - 1) = v
          i += 1
        }
        seen += 1
      }
      t += 1
    }
    if (seen == 0) null else new GenericArrayData(mins)
  }
}
