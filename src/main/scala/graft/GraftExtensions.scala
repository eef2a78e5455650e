package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
import graft.functions.{MinHashBands, MinHashSig, NGramsExpr, SeqDot, SimHashBits}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions for SQL use —
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT seq_dot(a.embedding, b.embedding) FROM ...
  * SELECT minhash_sig(shingles, 8), minhash_bands(shingles, 8, 4) ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("seq_dot"),
      new ExpressionInfo(classOf[SeqDot].getName, "seq_dot"),
      (exprs: Seq[Expression]) =>
        SeqDot(Cast(exprs(0), ArrayType(DoubleType)),
               Cast(exprs(1), ArrayType(DoubleType)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, intArg(exprs(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (exprs: Seq[Expression]) =>
        MinHashBands(exprs.head, intArg(exprs(1), "k"),
                     intArg(exprs(2), "bands"))))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (exprs: Seq[Expression]) =>
        SimHashBits(exprs.head, intArg(exprs(1), "d"))))
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGramsExpr].getName, "ngrams"),
      (exprs: Seq[Expression]) =>
        NGramsExpr(exprs.head, intArg(exprs(1), "maxGram"),
                   intArg(exprs(2), "minChars"))))
  }
}
