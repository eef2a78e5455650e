package graft.drugbank

import org.apache.spark.sql.DataFrame

/** S5/S6 sinks (perform_NER.py:136-142, look_for_identifiers.py:107-112):
  * JSON for interchange, parquet replacing pickle as the fast-reload
  * checkpoint between stages (SURVEY §2.1 S4/S6).
  *
  * The reference emits one keyed-by-curie JSON object; Spark writes
  * JSON-lines. `keyedJson` reproduces the reference's sink formatting at
  * the API edge (driver-side assembly — sink formatting, not query
  * semantics; SURVEY §7.4 note 6). Use only for golden-file comparison at
  * fixture scale.
  */
object Sinks {

  def writeJson(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode("overwrite").json(path)

  def writeCheckpoint(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readCheckpoint(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(path)

  /** In-memory stage boundary: persist + cut the logical lineage.
    *
    * A stage whose output feeds N downstream branches would otherwise
    * contribute N copies of its whole subtree to every downstream plan —
    * Catalyst re-analyzes each copy, so driver time (not just execution)
    * grows with the product of the branch counts (drugbank_e2e: 1,126
    * Exchanges, ~26 s of driver-side analysis). An eager localCheckpoint
    * materializes the frame once and wraps its InternalRow RDD as a
    * fresh leaf, so downstream plans see one shared scan — the in-memory
    * analogue of the reference's pickle checkpoint (perform_NER.py:141-142
    * → look_for_identifiers.py:65-66) — without the Row encode/decode a
    * persist + createDataFrame(df.rdd) round-trip pays, and with the RDD
    * dependency graph truncated too. For a restart-safe boundary across
    * jobs use writeCheckpoint/readCheckpoint.
    */
  def stageBoundary(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  /** Keyed JSON object string `{"<keyCol>": {record}, ...}` (driver-side,
    * fixture-scale only — `maxRows` guards the collect). The key comes
    * from the actual column and the record from `to_json(struct(*))`, so
    * values containing `"<key>":"`-shaped text can't corrupt the
    * extraction (the old indexOf surgery could).
    */
  def keyedJson(df: DataFrame, keyCol: String, maxRows: Int = 100000): String = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val pairs = df
      .select(col(keyCol).cast("string").as("_key"),
              to_json(struct(df.columns.map(col): _*)).as("_json"))
      .limit(maxRows + 1)
      .collect()
    require(pairs.length <= maxRows,
      s"keyedJson is a fixture-scale sink: > $maxRows rows (write " +
        "JSON-lines with writeJson instead)")
    pairs
      .map { r =>
        require(!r.isNullAt(0),
          s"keyedJson: null value in key column '$keyCol'")
        val key = r.getString(0).replace("\\", "\\\\").replace("\"", "\\\"")
        s""""$key": ${r.getString(1)}"""
      }
      .sorted.mkString("{", ", ", "}")
  }
}
