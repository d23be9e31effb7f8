package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression building the distinct word n-gram
  * shingle set of a document in one pass — bit-identical to the
  * composed-HOF form in Dedup.shinglesHof (split → transform(slice →
  * concat_ws) → array_distinct, pinned in DedupSpec) but without the
  * per-position sub-array slicing.
  *
  * Why an Expression: the HOF form allocates an n-element slice and
  * a concat result per gram position, then array_distinct re-scans
  * the full gram list quadratically (its generic path) — for a
  * 1 000-token document that is ~2 000 intermediate arrays per row.
  * This kernel splits once, concatenates each gram directly from the
  * token array, and dedups with a hash set in first-occurrence
  * order (array_distinct's order contract).
  *
  * Tokenization contract (matches Dedup.tokens = split(text, " "),
  * Java regex limit -1): split on every single 0x20 byte, KEEPING
  * empty tokens including trailing ones; empty input → one empty
  * token. A single-space pattern has no regex metacharacters and
  * UTF-8 guarantees 0x20 never occurs inside a multibyte sequence,
  * so the byte-level split is exactly the regex split. Output: empty
  * array when the doc has < n tokens. */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles requires string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  /** Column form, usable anywhere a built-in function is. */
  def shingles(text: Column, n: Int): Column =
    ColumnGlue.column(Shingles(ColumnGlue.expression(text), n))

  private val Space = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // split on 0x20, limit -1 semantics (trailing empties kept)
    val bytes = text.getBytes
    val toks = new java.util.ArrayList[UTF8String]()
    var start = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        toks.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    toks.add(UTF8String.fromBytes(bytes, start, bytes.length - start))
    val nt = toks.size()
    if (nt < n) return new GenericArrayData(new Array[Any](0))
    val m = nt - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    val gram = new Array[UTF8String](n)
    while (g < m) {
      var j = 0
      while (j < n) { gram(j) = toks.get(g + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, gram: _*))
      g += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
