package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Positional-equality kernel (static forwarder → callable from generated
  * Java code). ≅ MinHash.calculateMinHashScore
  * (/root/reference/mcrit/minhash/MinHash.py:83-91) at the 8-bit default:
  * 100 × (#equal bytes) / length.
  */
object SigScoreKernel {
  def score(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    100.0 * eq / n
  }
}

/** Native Catalyst expression for the signature score — participates in
  * whole-stage codegen (the verify stage scores every candidate pair, so a
  * Scala UDF here would break the codegen span around the join).
  */
case class SignatureScore(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time contract for the SQL surface: strings implicitly CAST to
  // their UTF-8 bytes; non-castable types fail analysis instead of
  // ClassCastException-ing at runtime
  override def inputTypes = Seq(BinaryType, BinaryType)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_score"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigScoreKernel.score(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.SigScoreKernel.score($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignatureScore =
    copy(left = newLeft, right = newRight)
}

object SignatureScore {
  /** Column helper: sigScore(a, b) as a codegen'd expression. */
  def sigScore(a: Column, b: Column): Column =
    Bridge.toColumn(SignatureScore(Bridge.toExpr(a), Bridge.toExpr(b)))
}
