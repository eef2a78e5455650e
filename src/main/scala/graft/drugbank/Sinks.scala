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
