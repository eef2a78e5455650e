package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the sequential (left-to-right) dot
  * product of two double arrays — the hot kernel of every embedding
  * operator (SURVEY §4.3 custom-work tier b: a codegen'd `Expression`
  * beats the interpreted higher-order `zip_with`+`aggregate` chain by
  * ~an order of magnitude while preserving the exact fold order the
  * DuckDB `list_reduce` oracles replicate).
  *
  * Semantics: Σ_i a(i)*b(i) accumulated strictly left-to-right in double;
  * length mismatch → sums over the shorter prefix; null input → null.
  */
case class SeqDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "seq_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  private def asDoubleArray(c: Column): Expression =
    Cast(GraftBridge.expression(c), ArrayType(DoubleType))

  /** Column API: sequential dot product (codegen'd). */
  def seqDot(a: Column, b: Column): Column =
    GraftBridge.column(SeqDot(asDoubleArray(a), asDoubleArray(b)))

  /** Register `seq_dot` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seq_dot",
      exprs => SeqDot(Cast(exprs(0), ArrayType(DoubleType)),
                      Cast(exprs(1), ArrayType(DoubleType))),
      "scala_udf")
}
