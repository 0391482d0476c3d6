package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the graft native expressions as
  * SQL functions, so `spark.sql` queries (and any SQL-speaking client) can
  * use them without the Scala Column helpers:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.expr.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * SELECT url FROM docs WHERE graft_cosine(emb, other) > 0.95
  * SELECT sig_score(a.sig, b.sig) FROM pairs
  * SELECT normalized_md5(text) AS fp FROM docs
  * }}}
  *
  * The registered functions are the same codegen `Expression`s the library
  * uses internally (`CosineSim`, `SignatureScore`, `NormalizedMd5`) — SQL
  * callers get identical plans and bit-identical results to the Scala API
  * (asserted in GraftExtensionsSpec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(name: String, usage: String,
      build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { args =>
      require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
      build(args(0), args(1))
    })

  private def unary(name: String, usage: String, build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, usage), { args =>
      require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
      build(args(0))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of two float arrays", CosineSim(_, _)))
    ext.injectFunction(binary("sig_score",
      "sig_score(a, b) - positional-equality score of two packed signatures (0-100)",
      SignatureScore(_, _)))
    ext.injectFunction(unary("normalized_md5",
      "normalized_md5(text) - md5 hex of the whitespace-normalized text", NormalizedMd5(_)))
  }
}
