package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar string / normalization operators (SURVEY.md §2.2).
  *
  * Each function is pure Column DSL — codegen'd built-ins only, no UDFs —
  * so every use site stays inside whole-stage codegen and remains
  * pushdown/pruning friendly. Reference semantics cited per op
  * (file:line into /root/reference).
  */
object StringOps {

  /** P2 — sentence split on '.' (perform_NER.py:22). */
  def sentences(text: Column): Column = split(text, "\\.")

  /** P3 — sentence length gate, keep min..max chars inclusive
    * (perform_NER.py:25-26: skip >1000 or <15).
    */
  def lengthOk(s: Column, min: Int = 15, max: Int = 1000): Column =
    length(s).between(min, max)

  /** P4 — drop whitespace-tokens longer than `maxLen` chars and rejoin
    * (utils.py:31-38). Higher-order function, no UDF.
    */
  def dropLongTokens(text: Column, maxLen: Int = 100): Column =
    array_join(filter(split(text, " "), t => length(t) < maxLen), " ")

  /** P5 — remove non-greedy bracketed spans incl. contents
    * (utils.py:47-53: re.sub(r'\[.*?\]', '', text)).
    */
  def removeBrackets(text: Column): Column =
    regexp_replace(text, "\\[.*?\\]", "")

  /** P6 — delete sentence punctuation `.,;:?!` (NER.py:99-100). */
  def stripPunct(s: Column): Column = translate(s, ".,;:?!", "")

  /** P7 — name simplification: lowercase + delete ALL punctuation and
    * whitespace (node_synonymizer.py:26, 425-429). `\p{Punct}` matches
    * exactly Python's `string.punctuation` ASCII set.
    */
  def simplify(name: Column): Column =
    lower(regexp_replace(name, "[\\p{Punct}\\s]", ""))

  /** P8 — uppercase the CURIE prefix before the first ':', keep the rest
    * verbatim (node_synonymizer.py:386-390, 420-423).
    */
  def capitalizePrefix(curie: Column): Column = {
    val prefix = substring_index(curie, ":", 1)
    concat(upper(prefix), curie.substr(length(prefix) + 1, length(curie)))
  }

  /** P9/P10 — literal-prefix concat, null-propagating
    * (node_synonymizer.py:363-368; utils.py:178-208).
    */
  def withPrefix(prefix: String, id: Column): Column = concat(lit(prefix), id)

  /** R1-shaped candidate assembly: `prefix + ':' + ENTIRE input` —
    * deliberately the whole input, not the regex match
    * (look_for_identifiers.py:30-31, preserved quirk per SURVEY §6.4).
    */
  def curieCandidate(prefix: Column, input: Column): Column =
    concat(prefix, lit(":"), input)

  /** Stringified-Python-list ingestion (node_synonymizer.py:172, 315-318):
    * real synonymizer sqlite dumps store member-id lists as single-quoted
    * Python list literals (`"['a', 'b']"`) parsed with ast.literal_eval;
    * the `"nan"` sentinel (a pandas NaN round-trip, :316), empty strings
    * and nulls all become EMPTY arrays. Implementation is a
    * quote-translating `from_json` — pure Column DSL, codegen'd, no UDF.
    * Best-effort by design: items containing apostrophes or double quotes
    * are not representable after translation and parse to null (the
    * reference's own dumps contain neither — curies are quote-free).
    */
  def parsePyList(s: Column): Column = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    when(s.isNull || s === "nan" || s === "",
        array().cast(ArrayType(StringType)))
      .otherwise(from_json(translate(s, "'", "\""), ArrayType(StringType)))
  }
}
