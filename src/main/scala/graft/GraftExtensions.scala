package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{BloomMightContain, CosineSimilarity, DotProduct, NfcNormalize}

/** Session-extensions entry point — the deployment hook for clusters:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the native vector expressions into every session (and every
  * `newSession()`) without any explicit `register` call. The imperative
  * twin `GraftFunctions.register` remains for sessions built without the
  * conf (e.g. notebooks attaching to an existing session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => CosineSimilarity(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_sim(a, b) takes exactly two arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          "dot_product(a, b) takes exactly two arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => NfcNormalize(c)
        case _ => throw new IllegalArgumentException(
          "nfc_normalize(s) takes exactly one argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => children match {
        case Seq(b, h) => BloomMightContain(b, h)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain(filter, hash) takes exactly two arguments")
      }))
  }
}
