package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine kernel (static forwarder → callable from generated Java code).
  *
  * Arithmetic is fixed by the fixture/oracle contract: float products
  * widened to double, accumulated in index order, dot over the SHORTER
  * length, norms over each array's FULL length, `1e-12` epsilon — the HOF
  * form (`AnnOps.cosineHof`), this kernel and the DuckDB oracle SQL agree
  * bitwise (asserted in OpsSpec).
  */
object CosineKernel {
  def score(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += (a(i) * b(i)).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += (a(i) * a(i)).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += (b(i) * b(i)).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb) + 1e-12)
  }

  /** ArrayData entry point used by the expression: `toFloatArray` is a bulk
    * `Platform.copyMemory` on `UnsafeArrayData` — no per-element boxing,
    * unlike the `Seq[Float]` conversion a Scala UDF pays per row.
    */
  def score(a: ArrayData, b: ArrayData): Double =
    score(a.toFloatArray(), b.toFloatArray())
}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — participates in whole-stage codegen. The ANN
  * paths score O(candidates · dim) per query (brute-force: the full corpus
  * per query), so the per-row cost of the scoring expression IS the query
  * cost: a Scala UDF boxes every element into `Seq[Float]`, and the
  * built-in higher-order-function form re-interprets its lambda per
  * element; this expression is one static call on raw `ArrayData`.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.CosineKernel.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column helper: cos(a, b) as a codegen'd expression. */
  def cos(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSim(Bridge.toExpr(a), Bridge.toExpr(b)))
}
