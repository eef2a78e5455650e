package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 appears
  * here with a testdata demo and (where ANSI-SQL-expressible) a DuckDB
  * oracle with identical column names, deterministic ordering, and
  * engine-independent numerics.
  */
object SparkEntry {
  /** Flagship: A1 argmax-cluster-per-name semantics (the reference's most
    * distinctive operator, node_synonymizer.py:370-379) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("argmax_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextDemos.queries ++ RelationalDemos.queries ++ PipelineDemos.queries ++
      StreamingDemos.queries ++ SourceSinkDemos.queries ++
      DrugBankDemos.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (impl-specific sketches) get
    * the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    TextDemos.oracleSql ++ RelationalDemos.oracleSql ++
      PipelineDemos.oracleSql ++ StreamingDemos.oracleSql ++
      SourceSinkDemos.oracleSql ++ DrugBankDemos.oracleSql
}
