package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — the first
  * step of any text-pipeline cleaning pass (the same logical glyph can
  * arrive precomposed U+00E9 or decomposed e+U+0301; dedup hashes,
  * shingles and dictionary lookups all diverge unless one form is
  * pinned). Spark has no built-in for this; a Scala UDF would break
  * whole-stage codegen on the hottest map stage, so this wraps
  * `java.text.Normalizer` behind `doGenCode`.
  *
  * The runtime helper short-circuits via `Normalizer.isNormalized` —
  * true for all-ASCII input after a cheap scan, which is the
  * overwhelming hot path on web corpora — and only then materializes a
  * normalized copy.
  */
object NormalizeText {

  /** Runtime kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def nfc(c: Column): Column = ofForm(c, "NFC")
  def nfkc(c: Column): Column = ofForm(c, "NFKC")

  def ofForm(c: Column, form: String): Column =
    GraftBridge.column(NormalizeTextExpr(GraftBridge.expression(c), form))

  /** Accent folding for accent-insensitive matching: decompose (NFD) and
    * drop combining marks. Composed in Column space — the regex runs on
    * the already-codegen'd NFD output.
    */
  def stripAccents(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(
      ofForm(c, "NFD"), "\\p{Mn}+", "")
}

case class NormalizeTextExpr(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(v: Any): Any =
    NormalizeText.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.NormalizeText.normalize($c, "$form")""")

  override protected def withNewChildInternal(c: Expression)
      : NormalizeTextExpr = copy(child = c)
}
