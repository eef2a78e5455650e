package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation helpers (SURVEY.md §2.5) shared by the demo queries and the
  * synonymizer/NER pipelines.
  *
  * `exactSum` exists for oracle parity at any scale: summing doubles is
  * association-order-dependent, so a Spark shuffle-order sum and a DuckDB
  * sequential sum can differ in the last ulp. Casting each value to a
  * decimal first makes the sum exact and engine-independent; the final
  * cast back to double is then deterministic on both sides. The testdata
  * money/quantity columns carry ≤2 decimal digits, so scale 4 never
  * rounds; derived products get scale 8.
  */
object AggOps {

  /** Exact, engine-independent sum of a double column. */
  def exactSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact sum for derived products (wider precision, scale 8). */
  def exactSumWide(c: Column): Column =
    sum(c.cast(DecimalType(28, 8))).cast("double")

  /** A1 — argmax-per-group with the engine's deterministic tie-break:
    * max count, then lexicographically largest value
    * (node_synonymizer.py:370-379; SURVEY §6.1 determinism note).
    * Returns a struct column {cnt, value} to select from after groupBy.
    */
  def argmax(value: Column, count: Column): Column =
    max(struct(count.as("cnt"), value.as("value")))

  /** A4 — longest-name-wins with deterministic tie-break (longest, then
    * lexicographically largest) (perform_NER.py:39-53; SURVEY §6.2).
    */
  def longestWins(name: Column): Column =
    max_by(name, struct(length(name), name))
}
