package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
  * like Spark's `length()`.
  *
  * Emitting pre-deduped, pre-filtered arrays also shrinks the explode
  * output ~2× before the global per-document `distinct()`, which is the
  * shuffle that matters at corpus scale.
  */
case class NGramsExpr(child: Expression, maxGram: Int, minChars: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxGram >= 1, "maxGram must be >= 1")
  // equivalence precondition with the replaced HOF chain: that chain
  // emitted an empty-string placeholder for sentences shorter than n
  // tokens, filtered out only when the length gate is active
  require(minChars >= 1, "minChars must be >= 1")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngrams"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var g = 1
    while (g <= maxGram) {
      var start = 0
      while (start + g <= n) {
        val window = java.util.Arrays.copyOfRange(toks, start, start + g)
        val gram = UTF8String.concatWs(sep, window: _*)
        if (gram != null && gram.numChars() >= minChars) seen.add(gram)
        start += 1
      }
      g += 1
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

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
  * skipped).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    if (len >= n) {
      val out = new Array[Any](len - n + 1)
      var s = 0
      while (s + n <= len) {
        out(s) = UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(toks, s, s + n): _*)
        s += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(
        Array[Any](UTF8String.concatWs(sep, toks: _*)))
    }
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}
