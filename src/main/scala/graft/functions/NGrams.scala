package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** All contiguous 1..maxGram-grams of a token array, space-joined,
  * length-gated, and deduplicated — in one pass per row.
  *
  * Semantically identical to the HOF chain
  * `flatten(transform(sequence(1, maxGram), n -> transform(sequence(0,
  * size-n), i -> array_join(slice(toks, i+1, n), " "))))` followed by
  * `length(g) >= minChars` filtering and per-sentence dedup, but those
  * interpreted higher-order functions sit outside whole-stage codegen and
  * re-walk the token array maxGram·n times (the round-1 ngram_mentions
  * pathology: NER.py:99-100 candidate generation); this is one tight loop
  * with a dedup set. Join semantics match `array_join` (null tokens are
  * skipped, no separator left behind); the length gate counts codepoints
  * like Spark's `length()`. Codegen'd via a static-call `doGenCode` so
  * the surrounding projection stays inside whole-stage codegen (see
  * [[MinHashSig]]'s note).
  *
  * Emitting pre-deduped, pre-filtered arrays also shrinks the explode
  * output ~2× before the global per-document `distinct()`, which is the
  * shuffle that matters at corpus scale.
  */
case class NGramsExpr(child: Expression, maxGram: Int, minChars: Int)
    extends UnaryExpression {
  require(maxGram >= 1, "maxGram must be >= 1")
  // equivalence precondition with the replaced HOF chain: that chain
  // emitted an empty-string placeholder for sentences shorter than n
  // tokens, filtered out only when the length gate is active
  require(minChars >= 1, "minChars must be >= 1")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngrams"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.ngrams(v.asInstanceOf[ArrayData], maxGram, minChars)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeTextEval.ngrams($c, $maxGram, $minChars)")

  override protected def withNewChildInternal(c: Expression): NGramsExpr =
    copy(child = c)
}

object NGrams {
  /** Column API over an array<string> token column. */
  def apply(tokens: Column, maxGram: Int, minChars: Int): Column =
    GraftBridge.column(
      NGramsExpr(GraftBridge.expression(tokens), maxGram, minChars))
}

/** Exactly-n word shingles of a token array (documents shorter than n
  * tokens shingle to the whole joined text), space-joined, NOT deduped —
  * the single-pass native form of the interpreted chain
  * `CASE WHEN size(toks) >= n THEN transform(sequence(0, size-n),
  * i -> array_join(slice(toks, i+1, n), ' ')) ELSE
  * array(array_join(toks, ' ')) END`.
  *
  * Two reasons this is an expression and not that Column chain:
  * (1) the chain references `toks` four times, so whenever the optimizer
  * collapses the staging projection into a consumer (a pushed-down
  * filter predicate, a generator lambda), `tokens(text)` re-evaluates
  * per reference — per SHINGLE inside a slice lambda, i.e. O(tokens²)
  * per row (measured 5.0s → sub-second on the bloom decontamination
  * pass, whose `Filter(exists(...))` collapse re-substituted the whole
  * stack); a single-child expression is immune to that re-substitution
  * by construction. (2) one tight loop per row beats four interpreted
  * higher-order passes. Join semantics match `array_join` (null tokens
  * skipped). Codegen'd via static call (see [[MinHashSig]]).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.wordShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeTextEval.wordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}
