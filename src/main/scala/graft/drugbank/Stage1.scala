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

    // mechanistic text (perform_NER.py:126-134): each truthy
    // MOSTLY_TEXT_FIELDS value contributes
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

    // BOTH NER passes fused into ONE linking pipeline (r19): the
    // indication pass (perform_NER.py:117-125, disease categories) and
    // the mechanistic pass (perform_NER.py:126-134, 24 categories) ride
    // one pass-tagged union through one sentences → mentions →
    // dictionary-join → merge pipeline, with the per-pass category
    // filter applied before the merge exactly as the two separate calls
    // applied it (textToKg2NodesByPass) — row-identical output, half
    // the linking machinery (one hits aggregate, one dictionary build,
    // and for the model adapter ONE model pass). The small merged-hits
    // frame feeds both map aggregations below, so it is stage-bounded
    // like recs (r20, folding the r19 ADVICE leak note): a bare persist
    // here was never unpersisted, and because recs is a fresh
    // localCheckpoint leaf per run, repeated Stage1.run calls in one
    // session (bench/demo loops) each left a DEAD cache entry behind —
    // the eager boundary holds its blocks only while this run's frame
    // is referenced.
    val tagged = recs.filter(col("indication").isNotNull)
      .select(struct(lit("ind").as("pass"), col("kg2_id").as("k")).as("pk"),
              StringOps.removeBrackets(col("indication")).as("text"))
      .unionByName(recs.select(
        struct(lit("mech").as("pass"), col("kg2_id").as("k")).as("pk"),
        mechText.as("text")))
    val hits = Sinks.stageBoundary(
      ner.textToKg2NodesByPass(tagged, "pk", "text",
        Map("ind" -> Constants.IndicationCategories,
            "mech" -> Constants.MechanisticCategories)))
    def passMap(pass: String, outName: String) =
      ner.asMap(hits
          .filter(col("doc_key").getField("pass") === pass)
          .select(col("doc_key").getField("k").as("doc_key"),
                  col("curie"), col("name"), col("category")))
        .withColumnRenamed("matches", outName)
    val indication = passMap("ind", "indication_NER_aligned")
    val mechanistic = passMap("mech", "mechanistic_intermediate_nodes")

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
