package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the two hot dense-vector folds —
  * squared Euclidean distance and dot product — bit-identical to the
  * zip_with/aggregate HOF forms in VectorOps (kept there as twins,
  * pinned in VectorOpsSpec) but one primitive double loop per row.
  *
  * Why Expressions: the HOF form materializes the zipped product
  * array, then folds it with per-element lambda dispatch — an array
  * allocation plus ~2 boxed evaluations per dimension per row. In an
  * N×M scoring join (ANN verify, K-Means assignment with k centroid
  * literals) that allocation sits in the innermost loop of the whole
  * engine. The kernels run the SAME arithmetic in the SAME order —
  * per-element product/difference rounded first, then one sequential
  * left-to-right add chain starting at 0.0, no FMA (Java semantics
  * forbid fusing) — so results are bit-equal to the HOFs and to the
  * oracle's list_reduce folds.
  *
  * Null contract (matches the HOF chain exactly): any null element,
  * or a length mismatch (zip_with pads with null), nulls the result;
  * two empty arrays give 0.0 (the fold init).
  */
abstract class VectorFold extends BinaryExpression with ImplicitCastInputTypes {
  /** array<double> via ImplicitCastInputTypes, so SQL callers passing
    * integer/float arrays (e.g. vec_dot(array(1,2), array(3,4))) get
    * the analyzer's element-wise numeric coercion — the same leniency
    * as the HOF twins and Spark's own numeric built-ins — instead of
    * an analysis failure. Leniency cuts both ways, exactly as with
    * built-ins: string arrays also coerce, and a non-numeric string
    * element becomes a null element (non-ANSI mode), which valid()
    * then turns into a null result — a typo'd text column yields
    * NULLs, not an error. */
  override def inputTypes: Seq[ColumnGlue.AbstractType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def kernelCall(a: String, b: String): String

  /** Codegen splits validity (length match + null elements — a bit
    * scan, no allocation) from the primitive fold, so the hot path
    * never boxes the result: a per-row Double.valueOf would be
    * exactly the allocation these kernels exist to remove. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (!graft.functions.VectorKernels.valid($a, $b)) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${kernelCall(a, b)}; }
       """.stripMargin)
}

case class SqDistExpr(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_sqdist"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (!VectorKernels.valid(x, y)) null else VectorKernels.sqDist(x, y)
  }
  override protected def kernelCall(a: String, b: String): String =
    s"graft.functions.VectorKernels.sqDist($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistExpr =
    copy(left = l, right = r)
}

case class DotExpr(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (!VectorKernels.valid(x, y)) null else VectorKernels.dot(x, y)
  }
  override protected def kernelCall(a: String, b: String): String =
    s"graft.functions.VectorKernels.dot($a, $b)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

object VectorKernels {

  def sqDistCol(a: Column, b: Column): Column =
    ColumnGlue.column(SqDistExpr(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  def dotCol(a: Column, b: Column): Column =
    ColumnGlue.column(DotExpr(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Lengths equal and no null element — the HOF chain's implicit
    * null contract, checked WITHOUT computing (and without boxing a
    * nullable result). */
  def valid(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Primitive folds — call only after valid(a, b). */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc = acc + d * d
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = acc + a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
