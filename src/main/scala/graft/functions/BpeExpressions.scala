package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native BPE merge application over int-symbol words — the encode hot
  * kernel of the id-domain tokenizer family (Bpe.collectMergesIds /
  * encodeIdsStats). A composed-builtin form would be a per-merge
  * `aggregate(struct(out array, pending))` fold; at production merge
  * counts (10k+) that is thousands of nested lambda trees per row —
  * the same plan-scale pathology the Quant kernels replaced (see
  * QuantExpressions). This is ONE generated static call applying ALL
  * merges; the merge table rides the codegen references array.
  */
object BpeEval {

  /** Apply `merges` rows `[a, b, newId]` IN ORDER; each application is
    * one greedy left-to-right non-overlapping scan (match at i fuses
    * (s(i), s(i+1)) and resumes at i+2 — `[a,a,a]` under (a,a) yields
    * `[new, a]`), exactly the semantics of a fixed-width string
    * `replace` over the encoded word, which is how the SQL oracle
    * replays it. Sequential replay of the training merges equals the
    * trainer's own corpus evolution, so encode(word) IS the final
    * training representation of that word.
    */
  def applyMerges(word: ArrayData, merges: Array[Array[Int]]): ArrayData = {
    var cur = word.toIntArray()
    var m = 0
    while (m < merges.length && cur.length >= 2) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      val nid = merges(m)(2)
      val out = new Array[Int](cur.length)
      var o = 0
      var i = 0
      while (i < cur.length) {
        if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
          out(o) = nid; o += 1; i += 2
        } else {
          out(o) = cur(i); o += 1; i += 1
        }
      }
      cur = if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      m += 1
    }
    new GenericArrayData(cur.map(x => x: Any))
  }
}

/** Ordered BPE merge application: array&lt;int&gt; word in, fused
  * array&lt;int&gt; out. `merges` are (a, b, newId) rows in training
  * order, held as a value-equal IndexedSeq so plan canonicalization /
  * cache dedup see equal expressions for equal merge tables.
  */
case class BpeApplyMerges(child: Expression,
                          merges: IndexedSeq[(Int, Int, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_apply_merges"

  @transient private lazy val mergeArr: Array[Array[Int]] =
    merges.map { case (a, b, n) => Array(a, b, n) }.toArray

  override def nullSafeEval(v: Any): Any =
    BpeEval.applyMerges(v.asInstanceOf[ArrayData], mergeArr)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "int[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.BpeEval.applyMerges($c, $ref);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): BpeApplyMerges =
    copy(child = c)
}

object BpeApplyMerges {
  /** `merges` = (round, a, b) triples are NOT what this takes — pass
    * (a, b, newId) rows already in training order. */
  def apply(word: Column, merges: Seq[(Int, Int, Int)]): Column =
    GraftBridge.column(BpeApplyMerges(
      Cast(GraftBridge.expression(word), ArrayType(IntegerType)),
      merges.toIndexedSeq))
}
