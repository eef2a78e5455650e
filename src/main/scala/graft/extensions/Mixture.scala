package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget mixture solving — the "fit the corpus to a training
  * budget" step of a data-curation pipeline: given per-domain token
  * counts and a global budget, compute the waterfilling cap C with
  *   Σ_g min(n_g, C)  ≤  budget   (C maximal)
  * so every domain at or under the cap survives whole and every larger
  * domain down-samples to ~C tokens — the standard way a mixture is
  * balanced without hand-tuned per-domain rates (small languages keep
  * everything, the dominant language absorbs the cut).
  *
  * EXACT integer arithmetic throughout, via a closed form that needs no
  * iteration: with groups sorted by n ascending, S_i = sum of the i
  * smallest and m groups total,
  *   C  =  max over i in 0..m-1 of (budget − S_i) div (m − i).
  * Every candidate is feasible — for any C_i, Σ min(n_g, C_i) ≤
  * S_i + (m−i)·C_i ≤ budget, because min(n_g, ·) ≤ n_g on the i
  * smallest groups and ≤ C_i on the rest — and the true cap C* with
  * k = #{g : n_g ≤ C*} satisfies C* ≤ (budget − S_k) div (m−k), its own
  * candidate; so the max IS the waterfill cap (when budget < Σn — the
  * keep-everything case is returned as a flag instead of a fake cap).
  * Integer `div` keeps the whole derivation engine-exact, so the
  * operator verifies against a DuckDB oracle like everything else.
  *
  * Scale shape: the input is the already-aggregated (group, n) frame —
  * one map-side-combinable sum per group upstream — and the
  * prefix-sum/suffix-count window here runs over those m rows only
  * (domains × languages: dozens, never corpus-sized). The 1-row result
  * broadcasts back and the keep decision is a map-side integer
  * comparison per document (md5-rate sampling, the mixture_sample
  * mechanism), so the bulk path has no shuffle beyond the upstream
  * per-group sum.
  */
object Mixture {

  /** The waterfilling cap for `budget` = (Σ n · num) div den.
    *
    * @param groups one row per group
    * @param ngCol  non-null, non-negative per-group total (long-castable)
    * @return a 1-row frame (budget, cap, keep_all): `keep_all` is true
    *         when the budget covers the whole corpus (cap is then the
    *         largest group size, unused); groups with n ≤ cap keep all
    *         their rows, larger groups sample at rate cap/n
    */
  def waterfillCap(groups: DataFrame, ngCol: String,
                   num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, s"budget fraction must be >=0 / >0")
    import org.apache.spark.sql.expressions.Window
    val g = groups.select(col(ngCol).cast("long").as("ng"))
    // deterministic total order: ng, then nothing else needed — equal
    // ng rows are interchangeable in both S_i and (m - i)
    val w = Window.orderBy(col("ng"))
    g.withColumn("s_excl", coalesce(sum(col("ng")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rest", count(lit(1)).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("tot", sum(col("ng")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("budget", expr(s"(tot * $num) div $den"))
      .agg(max(col("budget")).as("budget"), max(col("tot")).as("tot"),
        max(col("ng")).as("mx"),
        max(expr("(budget - s_excl) div rest")).as("rawcap"))
      .select(col("budget"),
        when(col("tot") <= col("budget"), col("mx"))
          .otherwise(col("rawcap")).as("cap"),
        (col("tot") <= col("budget")).as("keep_all"))
  }

  /** Map-side document keep predicate against the broadcast cap row and
    * per-group total: a group at or under the cap survives whole;
    * larger groups md5-sample docs at rate cap/n — 16-bit hash h vs
    * h·n < cap·65536, exact integer comparison, deterministic and
    * backfill-stable like every md5 gate in this engine. Bounds: h ≤
    * 65535 and n, cap ≤ Σ tokens, so both sides stay inside Long for
    * corpora under ~2^47 tokens per group (beyond that, widen to the
    * 8-nibble hash and DecimalType).
    */
  def keeps(docIdCol: Column, ngCol: Column, capCol: Column,
            keepAllCol: Column): Column = {
    val h16 = conv(substring(md5(docIdCol.cast("string")), 1, 4), 16, 10)
      .cast("long")
    keepAllCol || ngCol <= capCol || (h16 * ngCol) < (capCol * lit(65536L))
  }
}
