package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftglue.ColumnGlue

import graft.functions.SimHash64

/** SparkSessionExtensions entry point: makes graft's native
  * expressions callable from SQL text, e.g.
  * `SELECT simhash64(split(text, ' ')) FROM documents`.
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

  /** (name, info, builder) rows — one per injectable function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      oneArg("simhash64", SimHash64.apply)))

  /** Register every graft function on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      ColumnGlue.registerTempFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], name, builder)
    }
}
