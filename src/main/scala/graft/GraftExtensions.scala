package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
import graft.functions.{MinHashBands, MinHashSig, NGramsExpr, NormalizeTextExpr, SeqDot, SimHashBits}

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
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName,
                         "word_shingles"),
      (exprs: Seq[Expression]) =>
        graft.functions.WordShingles(exprs.head, intArg(exprs(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("ws_tokens"),
      new ExpressionInfo(classOf[graft.functions.TokensExpr].getName,
                         "ws_tokens"),
      (exprs: Seq[Expression]) =>
        graft.functions.TokensExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("stop_hits"),
      new ExpressionInfo(classOf[graft.functions.StopHits].getName,
                         "stop_hits"),
      (exprs: Seq[Expression]) =>
        graft.functions.StopHits(exprs.head,
          exprs.drop(1).map(e => strArg(e, "stop word")))))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName,
                         "normalize_text"),
      (exprs: Seq[Expression]) =>
        NormalizeTextExpr(exprs.head,
          if (exprs.length > 1) strArg(exprs(1), "form") else "NFC")))
    // Spark's own Bloom sketch expressions (the machinery behind runtime
    // join filtering), surfaced for SQL: build the filter with
    // bloom_filter_agg(xxhash64(x)) and probe with might_contain(bf,
    // xxhash64(x)) — the Decontam scale path in pure SQL. NOTE the
    // scalar-subquery probe form trips a codegen fallback (interpreted
    // projection, correct results); the Decontam Column API embeds the
    // serialized filter as a BINARY literal, which stays codegen'd.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, est) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est)
        case Seq(c, est, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est, bits)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg takes 1-3 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
  }

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
  }
}
