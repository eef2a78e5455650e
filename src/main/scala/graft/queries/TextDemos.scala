package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.StringOps
import graft.tables.Tables

/** Testdata demos for the scalar/string operator family (SURVEY.md §2.2,
  * §2.3). Every query ends in a deterministic orderBy over a unique key
  * and aliases every computed column identically to its DuckDB oracle.
  * Derived integer columns are cast to long so Spark and DuckDB agree on
  * the output schema (DuckDB `length()` et al. return BIGINT).
  */
object TextDemos {
  type Q = (SparkSession, String) => DataFrame

  /** R1 demo dimension table: (pattern_name, prefix, pattern). Patterns are
    * in the Java∩RE2 common subset. Two rows share the all-digits shape to
    * exercise the multi-prefix fan-out of look_for_identifiers.py:19-38.
    */
  private val regexDim: Seq[(String, String, String)] = Seq(
    ("all_digits",  "PUBCHEM", "^[0-9]+$"),
    ("all_digits2", "CHEBI",   "^[0-9]+$"),
    ("nine_digits", "DPD",     "^[0-9]{9}$"),
    ("letters",     "NONE",    "^[A-Za-z]+$"))

  /** R2 demo prefix fan-out dimension (CONSTANTS.py:69-87 shape). */
  private val fanoutPrefixes: Seq[String] =
    Seq("CHEBI", "CHEMBL.COMPOUND", "DRUGBANK", "KEGG.COMPOUND",
        "MESH", "PUBCHEM.COMPOUND", "UMLS", "UniProtKB")

  val queries: Map[String, Q] = Map(
    // P2 sentence split as a generator (posexplode).
    "sentence_explode" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(StringOps.sentences(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
                col("col").as("sentence"))
        .orderBy("doc_id", "pos")
    }),
    // P3 length gate.
    "filter_len" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .filter(col("text_len").between(15, 1000))
        .orderBy("doc_id")
    }),
    // P4 long-token drop (threshold 6 so the testdata actually filters).
    "token_filter" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
                StringOps.dropLongTokens(col("text"), 6).as("filtered"))
        .orderBy("doc_id")
    }),
    // P5 bracket scrub — bracketed span synthesized from `lang` then removed.
    "regex_scrub" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          StringOps.removeBrackets(
            concat(lit("["), col("lang"), lit("] "), col("text")))
            .as("scrubbed"))
        .orderBy("doc_id")
    }),
    // P6 punctuation strip on the events props JSON strings.
    "translate_strip" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), StringOps.stripPunct(col("props")).as("stripped"))
        .orderBy("event_id")
    }),
    // P7 name simplification.
    "name_simplify" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"), StringOps.simplify(col("c_name")).as("simplified"))
        .orderBy("c_custkey")
    }),
    // P8 CURIE prefix capitalization over a synthesized curie column.
    "prefix_upper" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          StringOps.capitalizePrefix(
            concat(lower(col("c_mktsegment")), lit(":"), col("c_name")))
            .as("curie"))
        .orderBy("c_custkey")
    }),
    // P9 biolink:-style literal prefix concat.
    "prefix_concat" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          StringOps.withPrefix("biolink:", col("c_mktsegment")).as("curie"))
        .orderBy("c_custkey")
    }),
    // P11 startswith predicate.
    "pred_startswith" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").startsWith("FURN"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),
    // P12 contains predicate.
    "pred_contains" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("text").contains("spark"))
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),
    // P13 rlike format validation.
    "pred_rlike" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_brand").rlike("^Brand#[0-9]$"))
        .select(col("p_partkey"), col("p_brand"))
        .orderBy("p_partkey")
    }),
    // R1 multi-pattern CURIE detector: pattern dim × inputs, candidate =
    // prefix + ':' + ENTIRE input (look_for_identifiers.py:30-31 quirk).
    "multi_regex" -> ((s, dir) => {
      import s.implicits._
      val dim = regexDim.toDF("pattern_name", "prefix", "pattern")
      val inputs = Tables.customer(s, dir)
        .select(substring(col("c_name"), 10, 9).as("input")).distinct()
      inputs.crossJoin(broadcast(dim))
        .filter(regexp_like(col("input"), col("pattern")))
        .select(col("input"), col("pattern_name"),
                StringOps.curieCandidate(col("prefix"), col("input")).as("candidate"))
        .orderBy("input", "pattern_name")
    }),
    // Stringified-Python-list ingestion (node_synonymizer.py:172,
    // 315-318): single-quoted list literals synthesized from customer
    // columns, "nan" sentinel every 7th row, parsed via the
    // quote-translating from_json fallback and re-serialized for the
    // hash-stable compare. The oracle constructs the expected output
    // independently from the same base columns.
    "pylist_parse" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit("nan"))
            .otherwise(concat(lit("['"), col("c_mktsegment"), lit("', '"),
                              col("c_name"), lit("']")))
            .as("raw"))
        .select(col("c_custkey"),
          array_join(StringOps.parsePyList(col("raw")), "|").as("parsed"))
        .orderBy("c_custkey")
    }),
    // R2 suffix → all-prefix expansion (node_synonymizer.py:43-56).
    "prefix_fanout" -> ((s, dir) => {
      import s.implicits._
      val dim = fanoutPrefixes.toDF("prefix")
      Tables.customer(s, dir)
        .filter(col("c_custkey") < 20)
        .select(substring(col("c_name"), 10, 9).as("suffix"))
        .crossJoin(broadcast(dim))
        .select(col("suffix"), col("prefix"),
                StringOps.curieCandidate(col("prefix"), col("suffix")).as("candidate"))
        .orderBy("suffix", "prefix")
    })
  )

  private val regexDimSql =
    regexDim.map { case (n, p, r) => s"('$n','$p','$r')" }.mkString(", ")
  private val fanoutSql = fanoutPrefixes.map(p => s"('$p')").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "sentence_explode" ->
      """SELECT doc_id, CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS pos, unnest(parts) AS sentence
        |FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,
    "filter_len" ->
      """SELECT doc_id, length(text) AS text_len FROM documents
        |WHERE length(text) BETWEEN 15 AND 1000 ORDER BY doc_id""".stripMargin,
    "token_filter" ->
      """SELECT doc_id, array_to_string(list_filter(string_split(text, ' '), t -> length(t) < 6), ' ') AS filtered
        |FROM documents ORDER BY doc_id""".stripMargin,
    "regex_scrub" ->
      """SELECT doc_id, regexp_replace('[' || lang || '] ' || text, '\[.*?\]', '', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "translate_strip" ->
      """SELECT event_id, translate(props, '.,;:?!', '') AS stripped
        |FROM events ORDER BY event_id""".stripMargin,
    "name_simplify" ->
      """SELECT c_custkey, lower(regexp_replace(c_name, '[[:punct:][:space:]]', '', 'g')) AS simplified
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "prefix_upper" ->
      """SELECT c_custkey,
        |  upper(split_part(x, ':', 1)) || substr(x, length(split_part(x, ':', 1)) + 1) AS curie
        |FROM (SELECT c_custkey, lower(c_mktsegment) || ':' || c_name AS x FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "prefix_concat" ->
      """SELECT c_custkey, 'biolink:' || c_mktsegment AS curie
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "pred_startswith" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment LIKE 'FURN%' ORDER BY c_custkey""".stripMargin,
    "pred_contains" ->
      """SELECT doc_id FROM documents WHERE text LIKE '%spark%' ORDER BY doc_id""".stripMargin,
    "pred_rlike" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE regexp_matches(p_brand, '^Brand#[0-9]$') ORDER BY p_partkey""".stripMargin,
    "multi_regex" ->
      s"""WITH pats(pattern_name, prefix, pattern) AS (VALUES $regexDimSql),
         |ins AS (SELECT DISTINCT substr(c_name, 10, 9) AS input FROM customer)
         |SELECT input, pattern_name, prefix || ':' || input AS candidate
         |FROM ins, pats WHERE regexp_matches(input, pattern)
         |ORDER BY input, pattern_name""".stripMargin,
    "pylist_parse" ->
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 7 = 0 THEN ''
        |       ELSE c_mktsegment || '|' || c_name END AS parsed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "prefix_fanout" ->
      s"""WITH pre(prefix) AS (VALUES $fanoutSql)
         |SELECT suffix, prefix, prefix || ':' || suffix AS candidate
         |FROM (SELECT substr(c_name, 10, 9) AS suffix FROM customer WHERE c_custkey < 20), pre
         |ORDER BY suffix, prefix""".stripMargin
  )
}
