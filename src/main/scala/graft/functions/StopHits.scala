package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens present in a fixed word set —
  * `size(filter(toks, t -> t.isin(words)))` as one native expression.
  * The HOF chain's `ArrayFilter` is CodegenFallback and disqualifies
  * its whole projection from whole-stage codegen; here the word set
  * rides the codegen references array (`ctx.addReferenceObj`) and the
  * generated code is a single static call, so the language-ID /
  * quality-score projections stay fused.
  */
case class StopHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stop_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.stopHits(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopWords", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeTextEval.stopHits($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): StopHits =
    copy(child = c)
}

object StopHits {
  /** Column API over an array<string> token column. */
  def apply(tokens: Column, words: Seq[String]): Column =
    GraftBridge.column(StopHits(GraftBridge.expression(tokens), words))
}
