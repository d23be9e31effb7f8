package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftglue.ColumnGlue

import graft.functions.SimHash64
import graft.operators.{Dedup, TextAnalysis}

/** SparkSessionExtensions entry point: makes graft's native
  * expressions AND its Column-composed kernels callable from SQL
  * text, e.g.
  * {{{
  *   SELECT simhash64(split(text, ' '))            FROM documents
  *   SELECT minhash_signature(text, 3, 16, false)  FROM documents
  *   SELECT winnow_fingerprints(text, 5, 4)        FROM documents
  *   SELECT hamming_hex(fp1, fp2)                  FROM pairs
  *   SELECT rolling_fingerprint(text)              FROM documents
  *   SELECT vec_dot(a, b), vec_sqdist(a, b)        FROM vectors
  * }}}
  * Column-composed functions resolve to the same Catalyst trees as
  * their Column-API twins (ColumnGlue.expression), so SQL and
  * DataFrame callers get identical plans and identical results —
  * pinned in GraftExtensionsSpec. Tuning parameters (n, h, k, w,
  * parity) must be foldable literals: they select the SHAPE of the
  * expression tree at resolution time, exactly like the Column API's
  * Int/Boolean arguments.
  *
  * Cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (applied at session build). For an already-running session use
  * `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def oneArg(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(e) => f(e)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${args.length}")
  }

  private def litInt(fn: String, pos: Int, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) =>
      if (v.isValidInt) v.toInt
      else throw new IllegalArgumentException(
        s"$fn: argument $pos out of Int range: $v")
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $e")
  }

  private def litBool(fn: String, pos: Int, e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a boolean literal, got $e")
  }

  private def colIn(e: Expression): Column = ColumnGlue.column(e)
  private def exprOut(c: Column): Expression = ColumnGlue.resolvedExpression(c)

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftExtensions", name)

  /** (name, info, builder) rows — one per injectable function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      oneArg("simhash64", SimHash64.apply)),

    ("dhash64",
      new ExpressionInfo(classOf[graft.functions.DHash64].getName, "dhash64"),
      oneArg("dhash64", graft.functions.DHash64.apply)),

    ("minhash_signature", info("minhash_signature"), {
      case Seq(text, n, h, parity) =>
        exprOut(Dedup.minhashSignatureOf(colIn(text),
          litInt("minhash_signature", 2, n),
          litInt("minhash_signature", 3, h),
          litBool("minhash_signature", 4, parity)))
      case args => throw new IllegalArgumentException(
        s"minhash_signature expects (text, n, h, parity), got ${args.length} arguments")
    }),

    ("winnow_fingerprints", info("winnow_fingerprints"), {
      case Seq(text, k, w) =>
        exprOut(TextAnalysis.winnowFingerprints(colIn(text),
          litInt("winnow_fingerprints", 2, k),
          litInt("winnow_fingerprints", 3, w)))
      case args => throw new IllegalArgumentException(
        s"winnow_fingerprints expects (text, k, w), got ${args.length} arguments")
    }),

    ("hamming_hex", info("hamming_hex"), {
      case Seq(a, b) => exprOut(Dedup.hammingHex(colIn(a), colIn(b)))
      case args => throw new IllegalArgumentException(
        s"hamming_hex expects exactly 2 arguments, got ${args.length}")
    }),

    ("rolling_fingerprint", info("rolling_fingerprint"),
      oneArg("rolling_fingerprint", e => exprOut(TextAnalysis.fingerprint(colIn(e))))),

    ("vec_dot", info("vec_dot"), {
      case Seq(a, b) => graft.functions.DotExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_dot expects exactly 2 arguments, got ${args.length}")
    }),

    ("vec_sqdist", info("vec_sqdist"), {
      case Seq(a, b) => graft.functions.SqDistExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_sqdist expects exactly 2 arguments, got ${args.length}")
    }))

  /** Register every graft function on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      ColumnGlue.registerTempFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], name, builder)
    }
}
