package graft.drugbank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.constants.Constants
import graft.ner.EntityLinker
import graft.ops.StringOps
import graft.synonymizer.Synonymizer

/** EP1 — perform_NER.py:57-146 as one Spark job (SURVEY §3):
  * XML records → synonymizer alignment → NER enrichment of the indication
  * (3 disease categories) and of the concatenated text fields (24
  * mechanistic categories) → per-drug record with the two aligned maps.
  *
  * The reference's per-drug sequential loop over 5 GPU pipelines becomes
  * two dataset-wide dictionary-match passes; the only shuffles are the
  * mention-dictionary join and the per-drug re-aggregation.
  */
object Stage1 {

  private def emptyMap = DrugBank.emptyMatchMap

  // `ner` is the TRAIT: a user can run the whole pipeline over the
  // external-model linker (ModelNer) instead of the dictionary matcher
  def run(drugs: DataFrame, syn: Synonymizer, ner: EntityLinker): DataFrame = {
    // The record frame feeds three branches (itself + both NER passes);
    // un-persisted, each branch re-expands the XML parse + synonymizer
    // join — the composite plan blew up to >1,000 Exchanges and ~26 s of
    // driver-side analysis. The reference materializes this boundary too
    // (pickle checkpoint, perform_NER.py:141-142).
    val recs = Sinks.stageBoundary(DrugBank.records(drugs, syn))

    // indication_NER_aligned (perform_NER.py:117-125): bracket-scrubbed
    // indication → disease-category matches.
    val indication = ner.asMap(ner.textToKg2Nodes(
        recs.filter(col("indication").isNotNull)
          .select(col("kg2_id"),
                  StringOps.removeBrackets(col("indication")).as("text")),
        "kg2_id", "text", Constants.IndicationCategories))
      .withColumnRenamed("matches", "indication_NER_aligned")

    // mechanistic_intermediate_nodes (perform_NER.py:126-134): each
    // truthy MOSTLY_TEXT_FIELDS value contributes
    // `remove_brackets(text) + "\n "` — the reference's `if text:` guard
    // skips null AND empty strings, and the separator TRAILS every
    // contribution (concat_ws would drop the trailing one and keep
    // empty-string fields, shifting sentence boundaries near the length
    // gates).
    val mechText = concat(
      Constants.MostlyTextFields.map { f =>
        when(col(f).isNotNull && length(col(f)) > 0,
          concat(StringOps.removeBrackets(col(f)), lit("\n ")))
          .otherwise(lit(""))
      }: _*)
    val mechanistic = ner.asMap(ner.textToKg2Nodes(
        recs.select(col("kg2_id"), mechText.as("text")),
        "kg2_id", "text", Constants.MechanisticCategories))
      .withColumnRenamed("matches", "mechanistic_intermediate_nodes")

    recs
      .join(indication, col("kg2_id") === indication("doc_key"), "left")
      .drop("doc_key")
      .join(mechanistic, col("kg2_id") === mechanistic("doc_key"), "left")
      .drop("doc_key")
      .withColumn("indication_NER_aligned",
        coalesce(col("indication_NER_aligned"), emptyMap))
      .withColumn("mechanistic_intermediate_nodes",
        coalesce(col("mechanistic_intermediate_nodes"), emptyMap))
  }
}
