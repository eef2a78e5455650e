package graft.drugbank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stage2.IdentifierAlignment

/** EP2 — look_for_identifiers.py:40-112 as one Spark job (SURVEY §3):
  * re-load the stage-1 records, mine the structured bioentity fields for
  * names and bare-id suffixes, align them to KG2, and merge into
  * `mechanistic_intermediate_nodes` with FIRST-wins semantics — entries
  * already present from stage 1's NER pass keep their (mention-text) value
  * (look_for_identifiers.py:86-89, 102-105).
  *
  * Field notes mirroring the reference exactly: `pathways` has no `names`
  * key (skipped harmlessly); its ids are SMPDB:-prefixed so the `":" not
  * in id` gate drops them; nested pathway-enzyme ids are never reached by
  * `field.get('ids')`; `reactions` never exists in the records.
  */
object Stage2 {

  private val bioFields = Seq("transporters", "enzymes", "targets", "carriers")

  /** (key, name) pairs from every names-bearing identifier field. */
  def minedNames(records: DataFrame): DataFrame =
    bioFields.map(f =>
        records.select(col("kg2_id").as("key"),
                       explode(col(s"$f.names")).as("name")))
      .reduce(_ unionByName _)

  /** (key, id) pairs from every ids-bearing identifier field. */
  def minedIds(records: DataFrame): DataFrame =
    (bioFields.map(f =>
        records.select(col("kg2_id").as("key"),
                       explode(col(s"$f.ids")).as("id")))
      :+ records.select(col("kg2_id").as("key"),
                        explode(col("pathways.ids")).as("id")))
      .reduce(_ unionByName _)

  def run(stage1: DataFrame, align: IdentifierAlignment): DataFrame = {
    // Existing stage-1 NER entries (priority 0 — they win).
    val existing = stage1
      .select(col("kg2_id").as("drug_key"),
        explode(col("mechanistic_intermediate_nodes")).as(Seq("curie", "info")))
      .select(col("drug_key").as("key"), col("curie").as("preferred_curie"),
              col("info.name").as("name"), col("info.category").as("category"),
              lit(0).as("prio"))

    val aligned = align
      .mechanisticNodes(minedNames(stage1), minedIds(stage1))
      .withColumn("prio", lit(1))

    val merged = existing.unionByName(aligned)
      .groupBy("key", "preferred_curie")
      .agg(min_by(struct(col("name"), col("category")), col("prio"))
        .as("info"))
      .groupBy("key")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("preferred_curie"), col("info")))))
        .as("mechanistic_intermediate_nodes"))

    stage1.drop("mechanistic_intermediate_nodes")
      .join(merged, col("kg2_id") === merged("key"), "left")
      .drop("key")
      .withColumn("mechanistic_intermediate_nodes",
        coalesce(col("mechanistic_intermediate_nodes"),
          DrugBank.emptyMatchMap))
  }
}
