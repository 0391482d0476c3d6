package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  /** Null-element probe (callable from generated code): `toFloatArray`
    * would silently read a null slot as 0.0f, so the expression returns
    * SQL NULL instead — matching the HOF form, where a null element
    * poisons the aggregate to NULL.
    */
  def anyNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }
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
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract for the SQL surface: without declared input
  // types, graft_cosine(array(1.0, 2.0), ...) — DOUBLE literals — would
  // pass analysis and then reinterpret 8-byte slots as floats at runtime
  // (silent garbage). With them, mismatched numerics are implicitly CAST
  // to array<float> and non-castable types fail analysis with a clear error.
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    // null ELEMENTS → SQL NULL (parity with the HOF form, whose aggregate
    // is poisoned to NULL by a null element; toFloatArray would silently
    // read the slot as 0.0f)
    if (CosineKernel.anyNullElement(aa) || CosineKernel.anyNullElement(bb)) null
    else CosineKernel.score(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if (graft.expr.CosineKernel.anyNullElement($a) ||
         |    graft.expr.CosineKernel.anyNullElement($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expr.CosineKernel.score($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column helper: cos(a, b) as a codegen'd expression. */
  def cos(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSim(Bridge.toExpr(a), Bridge.toExpr(b)))
}
