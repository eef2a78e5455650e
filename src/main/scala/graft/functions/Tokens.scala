package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization in one pass:
  * `filter(split(text, "\\s+"), t -> length(t) > 0)` as a single native
  * expression — the most common primitive in every text pipeline
  * (counts, shingles, spans, packing all start here).
  *
  * Two wins over the HOF chain: (1) `ArrayFilter`/`Split` HOFs are
  * CodegenFallback, so any projection containing them is disqualified
  * from whole-stage codegen (`CollapseCodegenStages.supportCodegen`) —
  * this expression generates a static call instead; (2) one byte scan
  * per row versus regex-split + interpreted filter pass.
  *
  * Exact-equivalence contract: token boundaries are Java regex `\s` =
  * the six ASCII whitespace chars (space, \t, \n, \x0B, \f, \r) — NOT
  * unicode whitespace — matching both `split(text, "\\s+")` and the
  * DuckDB oracle's RE2 `\s`. ASCII bytes never occur inside UTF-8
  * multi-byte sequences, so the byte-level scan is exact. Randomized
  * bit-equivalence with the HOF chain is pinned in ExtensionsSpec.
  */
case class TokensExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ws_tokens"

  override def nullSafeEval(v: Any): Any =
    NativeTextEval.wsTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeTextEval.wsTokens($c)")

  override protected def withNewChildInternal(c: Expression): TokensExpr =
    copy(child = c)
}

object Tokens {
  /** Column API: whitespace tokens of a string column. */
  def apply(text: Column): Column =
    GraftBridge.column(TokensExpr(GraftBridge.expression(text)))
}
