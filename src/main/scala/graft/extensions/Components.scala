package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that
  * turns near-dup candidate PAIRS (minhash/simhash/jaccard output) into
  * dedup CLUSTERS: transitive chains A~B~C collapse to one component,
  * and `min(id)` per component is the canonical survivor.
  *
  * Algorithm: iterative min-label propagation. Each round every vertex
  * takes the minimum label among itself and its neighbors (one shuffle
  * join + one aggregation per round); convergence needs O(graph
  * diameter) rounds. Near-dup graphs are unions of small
  * quasi-cliques — diameters of 2-4 — so the round count stays tiny at
  * any corpus size; the per-round work is a pair of key-partitioned
  * shuffles that AQE sizes. (For adversarial long-path graphs the
  * alternating large-star/small-star scheme halves the exponent, but
  * dedup graphs never look like that; documented here so the scale
  * trade-off is explicit.) Labels are persisted per round and the
  * previous round unpersisted, so lineage is read from cache, not
  * recomputed.
  *
  * No counterpart in the reference (it dedups nothing); this is part of
  * the training-data pipeline surface.
  */
object Components {

  /** @param edges  candidate pairs, undirected (each pair listed once in
    *               either direction)
    * @return (id, comp) — one row per vertex that appears in `edges`,
    *         comp = min vertex id in its connected component. Vertices
    *         with no edges don't appear (a doc with no near-dup is its
    *         own singleton; callers left-join and coalesce to id).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    // symmetrize once: propagation below only follows a->b. NO distinct
    // — every consumer is a min aggregation, which is idempotent to
    // duplicate edges, so deduping here would buy nothing for the cost
    // of a full shuffle of the edge list.
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init fused with the first propagation round: label = min of self
    // and direct neighbors. Star/clique-shaped dedup clusters converge
    // here, so the loop usually runs a single verification round.
    var labels = sym
      .groupBy(col("a").as("id"))
      .agg(min(least(col("a"), col("b"))).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prev = labels
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // change detection fused into the propagation round: the merged
      // frame carries old + new labels, so convergence is a filter-count
      // on the SAME persisted frame — no separate old-vs-new join.
      val nbrMin = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("comp"))
        .groupBy("id")
        .agg(min("comp").as("nbr"))
      val merged = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("__old"),
                least(col("comp"), coalesce(col("nbr"), col("comp")))
                  .as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = merged.filter(col("comp") < col("__old")).count()
      prev.unpersist()
      prev = merged
      labels = merged.select("id", "comp")
      iter += 1
    }
    if (changed > 0)
      // an unconverged exit means some component is still split across
      // labels — for dedup that silently UNDER-dedups. Loud, not fatal:
      // graphs this deep aren't dedup graphs, and the caller may be
      // running a deliberately capped approximation; raise maxIter
      // (rounds needed ~ graph diameter) to converge.
      System.err.println(
        s"[graft.Components] label propagation did NOT converge after " +
          s"$maxIter rounds ($changed labels still moving) — components " +
          "are split; raise maxIter (~ graph diameter) for exact clusters")
    sym.unpersist()
    labels
  }

  /** Dedup-cluster view over candidate pairs: every paired doc with its
    * component id and whether it is the component's survivor (the min
    * id). Downstream removal = anti-join the non-survivors.
    */
  def dedupClusters(pairs: DataFrame, idA: String = "id_a",
                    idB: String = "id_b"): DataFrame =
    connectedComponents(pairs, idA, idB)
      .select(col("id"), col("comp"),
              (col("id") === col("comp")).as("survivor"))
}
