package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernel for the whole-doc fingerprint (P3 analog): md5 hex of
  * the whitespace-collapsed lowercase trimmed text — semantics identical to
  * `md5(regexp_replace(lower(trim(text)), "\\s+", " "))` (trim/lower via
  * UTF8String, exactly Spark's; the collapse matches Java regex `\s` =
  * `[ \t\n\x0B\f\r]`, all ASCII, so a byte-level pass is exact for any
  * UTF-8 input) — but without compiling and running a regex over every
  * document, which dominated the exact-dedup query's profile.
  */
object NormalizedMd5Kernel {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private val HexDigits = "0123456789abcdef".getBytes

  def compute(input: UTF8String): UTF8String = {
    val s = input.trim().toLowerCase
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var o = 0
    var i = 0
    var inWs = false
    while (i < bytes.length) {
      val b = bytes(i)
      if (isWs(b)) {
        if (!inWs) { out(o) = ' '; o += 1; inWs = true }
      } else {
        out(o) = b; o += 1; inWs = false
      }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(out, 0, o)
    val digest = md.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((digest(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(digest(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }
}

/** Native Catalyst expression for the fingerprint — stays inside whole-stage
  * codegen (it feeds the exact-dedup groupBy over every document).
  */
case class NormalizedMd5(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  // analysis-time contract for the SQL surface (castable types coerce to
  // string; others fail analysis rather than at runtime)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType
  override def prettyName: String = "normalized_md5"

  override protected def nullSafeEval(input: Any): Any =
    NormalizedMd5Kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizedMd5Kernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizedMd5 =
    copy(child = newChild)
}

object NormalizedMd5 {
  def normalizedMd5(text: Column): Column =
    Bridge.toColumn(NormalizedMd5(Bridge.toExpr(text)))
}
