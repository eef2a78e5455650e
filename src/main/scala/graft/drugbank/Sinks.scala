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

  /** Keyed JSON object string `{"<keyCol>": {record}, ...}` (driver-side). */
  def keyedJson(df: DataFrame, keyCol: String): String = {
    val rows = df.toJSON.collect()
    val keyed = rows.map { json =>
      val key = ujsonKey(json, keyCol)
      s""""$key": $json"""
    }
    keyed.sorted.mkString("{", ", ", "}")
  }

  /** Minimal extraction of a top-level string field from a JSON object
    * (Spark's toJSON emits `"key":"value"` with no spaces).
    */
  private def ujsonKey(json: String, keyCol: String): String = {
    val marker = s""""$keyCol":""""
    val i = json.indexOf(marker)
    require(i >= 0, s"key column $keyCol missing in $json")
    val start = i + marker.length
    json.substring(start, json.indexOf('"', start))
  }
}
