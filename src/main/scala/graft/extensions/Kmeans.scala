package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic distributed Lloyd k-means — the clustering primitive
  * semantic data curation is built on (SemDeDup-style cluster-then-
  * prune, coarse-quantizer training, curriculum grouping). The engine
  * already USES k-means in two guises — MLlib's sampled fit for IVF
  * index quality ([[Ivf.train]]) and the md5-seeded no-iteration
  * quantizer ([[Ivf.trainDeterministic]]) — but neither exposes the
  * Lloyd iteration itself as an oracle-checkable operator. This one
  * does, the same way [[Bpe.mergeTable]] exposes tokenizer training:
  * every round is exact, engine-independent arithmetic, so an
  * independent SQL engine reproduces the full training trajectory
  * bit-for-bit.
  *
  * Determinism contract (the same three tricks the ANN/centroid
  * family already relies on):
  *  - init: centroids are the vectors of the k smallest ids — no RNG;
  *  - distances: squared L2 as a SEQUENTIAL left-to-right double fold
  *    over dims (matches DuckDB `list_reduce`; 0.0 + x ≡ x in IEEE),
  *    ties argmin to the smaller cluster id;
  *  - updates: per-dim means in fixed point — sum of floor(v·1e6)
  *    longs divided by (n·1e6) — so the distributed sum is
  *    order-independent and the new centroid is the same double on
  *    any cluster layout or engine.
  *
  * Scale shape per round: assignment is MAP-SIDE — the k·d centroid
  * matrix rides into the executors as literals (broadcast semantics,
  * ~4 KB at k=8, d=64; a production k in the thousands would move it
  * to an explicit broadcast join, same plan) and the argmin is one
  * pass over a k-element literal array per row, no shuffle, no
  * candidate explosion. The ONLY shuffle is the centroid update: a
  * posexplode to (cluster, pos, q) rows map-side-combined onto k·d
  * keys (512 at the demo shape) — the exchange carries k·d rows per
  * partition regardless of corpus size. Driver state per round is the
  * k·d quantized-sum table (bounded by construction, the same
  * index-build stance as [[Ivf.trainDeterministic]]'s k-row collect).
  * The corpus is re-read once per round — inherent to Lloyd — so the
  * prepped frame persists for the duration and unpersists in finally.
  *
  * Empty clusters (possible once centroids migrate) drop out of the
  * update groupBy on both engines identically; later rounds simply
  * carry fewer centroids.
  */
object Kmeans {

  /** One trained model: per-round centroids (exact doubles), the
    * per-round quantized inertia, and the FINAL round's exact
    * fixed-point sums. `centroids(r)` is the table AFTER update round
    * r+1, sorted by cluster id; `inertiaQ(r)` is Σ floor(min-dist·1e6)
    * under the round-r assignment (i.e. against the PREVIOUS round's
    * centroids) — the convergence curve. `sums` is (cluster, per-dim
    * quantized-long sums, n) behind `last` — the rational the doubles
    * were divided from, carried so [[incrementalUpdate]] can fold a
    * new batch in EXACTLY without re-reading history.
    *
    * Alignment contract: after [[lloyd]], `centroids.length ==
    * inertiaQ.length` and index r of each pairs up. An online merge
    * ([[incrementalUpdate]]) appends a centroid generation WITHOUT an
    * inertiaQ entry — no assignment sweep over history happens, so
    * there is no inertia to report; consumers pairing the two
    * trajectories must zip up to `inertiaQ.length` (the training
    * prefix) and treat later generations as online state.
    */
  final case class KmeansModel(centroids: Vector[Array[(Int, Array[Double])]],
                               inertiaQ: Vector[Long],
                               sums: Array[(Int, Array[Long], Long)]) {
    def last: Array[(Int, Array[Double])] = centroids.last
  }

  /** centroid doubles from the exact (sq, n) rationals */
  private def centsOf(sums: Array[(Int, Array[Long], Long)])
      : Array[(Int, Array[Double])] =
    sums.map { case (cid, sq, n) =>
      cid -> sq.map(_.toDouble / (n.toDouble * Q))
    }

  private val Q = 1e6

  /** (best-cluster, best-dist) against the centroid table: the native
    * codegen'd kernel (graft.functions.NearestCentroid) — one generated
    * static call regardless of k. Semantics are exactly the composed
    * `array_min(array(k × struct(aggregate(zip_with((x−c)²)), id)))`:
    * the same sequential left-to-right double fold per centroid (the
    * bit-for-bit mirror of the oracle's list_reduce) and the same
    * (d, cluster) argmin order with ties to the smaller cluster id
    * (QuantSpec pins the equivalence). The composed form's generated
    * code grew with k — fine at the demo k=8, fatal at the
    * thousands-of-cells a production SemDeDup k needs.
    */
  private def argminStruct(vec: Column,
                           cents: Array[(Int, Array[Double])]): Column = {
    // Loud-failure guard (the Mixture null-cell stance): NearestCentroid
    // returns null for a vector whose length differs from the centroid
    // dimension, and a null best-struct would otherwise flow silently —
    // into the update agg as an unboxed cluster 0 (corrupting that
    // centroid and, via the dim probe, the whole next round), or out of
    // nearDupPairs as a null cell that just joins nothing. Raise
    // instead; map-side cost is one null check per row.
    val b = graft.functions.NearestCentroid(vec, cents)
    when(b.isNull, raise_error(lit(
      "Kmeans: vector length != centroid dimension — ragged vectors " +
      "would silently corrupt centroid sums; filter or fix them first")))
      .otherwise(b)
  }

  /** Train `rounds` Lloyd iterations over `vecs(idCol, vecCol)` with
    * k = the vectors of the k smallest ids as initial centroids.
    * Returns the full trajectory (see [[KmeansModel]]). Each round is
    * one Spark job: map-side assign + k·d-key update + bounded
    * (k·d + 1)-row collect.
    */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String,
            k: Int, rounds: Int): KmeansModel = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val prepped = vecs
      .select(col(idCol).as("id"),
              col(vecCol).cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // init: k smallest ids, k bounded rows to the driver (the
      // Ivf.trainDeterministic index-build stance)
      var cents: Array[(Int, Array[Double])] =
        prepped.orderBy("id").limit(k).collect().zipWithIndex.map {
          case (r, i) => i -> r.getSeq[Double](1).toArray
        }
      var centTrail = Vector.empty[Array[(Int, Array[Double])]]
      var inertiaTrail = Vector.empty[Long]
      var lastSums = Array.empty[(Int, Array[Long], Long)]
      for (_ <- 1 to rounds) {
        val assigned = prepped
          .select(col("id"), col("v"),
                  argminStruct(col("v"), cents).as("best"))
          .select(col("id"), col("v"),
                  col("best.cluster").as("cluster"),
                  floor(col("best.d") * Q).cast("long").as("dq"))
        // ONE aggregation computes both the k·d quantized dim sums and
        // the inertia (grouping-key trick: pos = -1 carries the
        // per-row min-dist mass so the round stays a single job)
        val upd = assigned
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")),
                  col("dq"))
          .select(col("cluster"), col("pos"),
                  floor(col("x") * Q).cast("long").as("q"),
                  when(col("pos") === 0, col("dq")).otherwise(lit(0L))
                    .as("dq0"))
          .groupBy("cluster", "pos")
          .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"),
               sum(col("dq0")).as("sdq"))
          .collect()
        inertiaTrail :+= upd.filter(_.getInt(1) == 0).map(_.getLong(4)).sum
        lastSums = upd.groupBy(_.getInt(0)).toArray.sortBy(_._1).map {
          case (cid, rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val sq = new Array[Long](dim)
            rows.foreach(r => sq(r.getInt(1)) = r.getLong(2))
            (cid, sq, rows.head.getLong(3))
        }
        cents = centsOf(lastSums)
        centTrail :+= cents
      }
      KmeansModel(centTrail, inertiaTrail, lastSums)
    } finally prepped.unpersist(false)
  }

  /** Online (mini-batch) k-means update — the incremental-family
    * contract ([[lloyd]] trains offline; this folds a NEW batch into a
    * trained model without re-reading history). Semantics, stated
    * exactly: history rows keep the assignment they had when last
    * summed (the final training round's), batch rows assign under the
    * CURRENT centroids, and the new centroid is the exact rational
    * mean over both — the model's carried fixed-point sums make the
    * merge bit-reproducible on any engine. This is the standard online
    * k-means estimator (each point contributes where it stood when
    * last seen), NOT a fresh Lloyd round over the union — a full refit
    * is a retrain, the same stance as Ivf.appendAssign vs refit.
    *
    * Cost: one map-side batch assignment + one k·d-key shuffle +
    * one bounded k·d collect; history is untouched. An empty batch
    * returns the model's centroids bit-for-bit. Appends a centroid
    * generation WITHOUT an inertiaQ entry (see the [[KmeansModel]]
    * alignment contract).
    *
    * Exactness at scale: the batch's quantized dim sums aggregate in
    * DECIMAL(38,0) (no silent long wraparound — the AggOps.exactSum
    * stance) and downcast with `longValueExact`; the history merge
    * adds with `Math.addExact`. A corpus big enough to overflow the
    * carried longs (~9.2e18 quanta per (cluster, dim)) fails LOUDLY on
    * both paths instead of wrapping to a garbage centroid while the
    * SQL oracle's HUGEINT arithmetic silently stays exact.
    */
  def incrementalUpdate(model: KmeansModel, batch: DataFrame,
                        vecCol: String): KmeansModel = {
    val upd = batch
      .select(col(vecCol).cast("array<double>").as("v"))
      .select(col("v"),
              argminStruct(col("v"), model.last)
                .getField("cluster").as("cluster"))
      .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("cluster"), col("pos"),
              floor(col("x") * Q).cast("long").as("q"))
      .groupBy("cluster", "pos")
      .agg(sum(col("q").cast("decimal(38,0)")).as("sq"),
           count(lit(1)).as("n"))
      .collect()
    val bsums: Map[Int, (Array[Long], Long)] =
      upd.groupBy(_.getInt(0)).map { case (cid, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val sq = new Array[Long](dim)
        rows.foreach(r => sq(r.getInt(1)) =
          r.getDecimal(2).toBigInteger.longValueExact())
        cid -> (sq, rows.head.getLong(3))
      }
    // batch clusters are a subset of the model's (assignment can only
    // pick existing centroids), so the merged key set is the model's
    val merged = model.sums.map { case (cid, sq, n) =>
      bsums.get(cid) match {
        case Some((bsq, bn)) =>
          require(bsq.length == sq.length,
            s"Kmeans.incrementalUpdate: dim mismatch on cluster $cid")
          (cid, sq.zip(bsq).map { case (a, b) => Math.addExact(a, b) },
           Math.addExact(n, bn))
        case None => (cid, sq, n)
      }
    }
    KmeansModel(model.centroids :+ centsOf(merged),
                model.inertiaQ, merged)
  }

  /** The model's exact fixed-point state as a frame — (cluster, pos,
    * c, n): the centroid value and the member count it averages. The
    * incremental demo's comparable output. */
  def sumsFrame(spark: org.apache.spark.sql.SparkSession,
                model: KmeansModel): DataFrame =
    stateFrame(spark, model).select("cluster", "pos", "c", "n")

  /** The model's FULL restorable state — (cluster, pos, sq, n, c):
    * the exact quantized-long sums (not just their double quotient),
    * so a landed artifact round-trips through [[modelFromSums]] with
    * zero loss. The streaming ingest's per-batch state sink. */
  def stateFrame(spark: org.apache.spark.sql.SparkSession,
                 model: KmeansModel): DataFrame = {
    import spark.implicits._
    model.sums.toSeq.flatMap { case (cid, sq, n) =>
      sq.toSeq.zipWithIndex.map { case (s, pos) =>
        (cid, pos.toLong, s, n, s.toDouble / (n.toDouble * Q))
      }
    }.toDF("cluster", "pos", "sq", "n", "c")
  }

  /** Rebuild a (single-generation) model from carried sums — the
    * read-back path for landed state artifacts. */
  def modelFromSums(sums: Array[(Int, Array[Long], Long)]): KmeansModel =
    KmeansModel(Vector(centsOf(sums)), Vector.empty, sums)

  /** Parse a [[stateFrame]] read-back into carried sums. Bounded by
    * k·d rows by construction. */
  def sumsFromStateRows(rows: Array[org.apache.spark.sql.Row])
      : Array[(Int, Array[Long], Long)] =
    rows.groupBy(_.getInt(0)).toArray.sortBy(_._1).map {
      case (cid, rs) =>
        val dim = rs.map(_.getLong(1).toInt).max + 1
        val sq = new Array[Long](dim)
        rs.foreach(r => sq(r.getLong(1).toInt) = r.getLong(2))
        (cid, sq, rs.head.getLong(3))
    }

  /** The per-round centroid trajectory as a long-format frame —
    * (round, cluster, pos, c) — the training artifact, directly
    * comparable to the oracle's chained-CTE reproduction. */
  def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                    model: KmeansModel): DataFrame = {
    import spark.implicits._
    model.centroids.zipWithIndex.flatMap { case (cents, r) =>
      cents.toSeq.flatMap { case (cid, cv) =>
        cv.toSeq.zipWithIndex.map { case (c, pos) =>
          (r + 1, cid, pos.toLong, c)
        }
      }
    }.toDF("round", "cluster", "pos", "c")
  }

  /** The per-round quantized inertia curve (round, inertia_q) —
    * Σ floor(min-dist·1e6) under each round's assignment. Exact longs,
    * so the convergence curve is engine-comparable. */
  def inertiaFrame(spark: org.apache.spark.sql.SparkSession,
                   model: KmeansModel): DataFrame = {
    import spark.implicits._
    model.inertiaQ.zipWithIndex
      .map { case (iq, r) => (r + 1, iq) }
      .toDF("round", "inertia_q")
  }

  /** Final assignment under the trained model: (id, cluster, dq) per
    * vector — one map-side pass, the plan a 100 TB cluster-assignment
    * job wants (quantized distance keeps the output engine-exact). */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             model: KmeansModel): DataFrame =
    vecs.select(col(idCol).as("id"),
        argminStruct(col(vecCol).cast("array<double>"), model.last)
          .as("best"))
      .select(col("id"), col("best.cluster").as("cluster"),
              floor(col("best.d") * lit(Q)).cast("long").as("dq"))

  /** Two-level ROUTED assignment — the large-k scale path. Exact
    * assignment costs n·k·d flops; at the SemDeDup regime (k ∝ n for
    * constant cell size) that grows quadratically. Routing groups the
    * k centroids into `nSupers` super-cells (one Lloyd round over the
    * k CENTROID rows — a k-row job, the index-build stance), then each
    * vector pays one argmin over the supers plus one argmin within its
    * routed super's members: ~n·(nSupers + k/nSupers)·d flops,
    * minimized at nSupers ≈ √k. The IVF coarse-quantizer idea applied
    * to the centroid table itself.
    *
    * Approximation contract, stated exactly: the result is the argmin
    * within the routed super only — it differs from [[assign]]
    * precisely when a vector's true nearest centroid lives in a
    * non-routed super (the IVF nProbe=1 trade). Every step is
    * deterministic and engine-reproducible: the super table derives
    * from the model by the same fixed-point Lloyd arithmetic, routing
    * and member argmins are the same sequential folds with the same
    * (d, id) tie order, so an independent SQL engine replays the whole
    * two-level decision bit-for-bit. Supers that end up with no member
    * centroids are excluded from routing on both engines (a vector can
    * only route where an answer exists).
    *
    * @return (id, cluster, dq, super) per vector
    */
  def routedAssign(vecs: DataFrame, idCol: String, vecCol: String,
                   model: KmeansModel, nSupers: Int): DataFrame =
    routedAssign(vecs, idCol, vecCol,
      routingFor(vecs.sparkSession, model, nSupers))

  /** Precomputed two-level routing structures: the populated super
    * centroids and, per super, its member centroid table (both sorted
    * by id — the NearestCentroid position-tie contract). A pure
    * function of the model: build ONCE per model ([[routingFor]]),
    * assign many — the convenience overload above rebuilds it per
    * call, which repeated callers should avoid.
    */
  final case class RoutingTable(
      routeCents: Array[(Int, Array[Double])],
      members: Seq[(Int, Array[(Int, Array[Double])])])

  /** Derive the routing structures: one Lloyd round over the k
    * CENTROID rows (a k-row job — the index-build stance), membership
    * under the updated supers, empty supers dropped. */
  def routingFor(spark: org.apache.spark.sql.SparkSession,
                 model: KmeansModel, nSupers: Int): RoutingTable = {
    require(nSupers >= 1 && nSupers <= model.last.length,
      "nSupers must be in [1, k]")
    import spark.implicits._
    // the k centroid rows as a tiny frame: (cluster id, centroid)
    val centDf = model.last.toSeq
      .map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cluster", "cv")
    // one Lloyd round over the centroids; membership under the UPDATED
    // super centroids — the same (train, assign) pair the corpus-level
    // API exposes
    val superModel = lloyd(centDf, "cluster", "cv",
      k = nSupers, rounds = 1)
    val membership: Map[Int, Int] =
      assign(centDf, "cluster", "cv", superModel)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val superCent = superModel.last.toMap
    val bySuper: Seq[(Int, Array[(Int, Array[Double])])] =
      model.last.groupBy(m => membership(m._1)).toSeq.sortBy(_._1)
        .map { case (s, members) => s -> members.sortBy(_._1) }
    RoutingTable(
      bySuper.map { case (s, _) => s -> superCent(s) }.toArray,
      bySuper)
  }

  /** Routed assignment under a prebuilt [[RoutingTable]] — pure
    * map-side work: one kernel call over the supers, then an
    * nSupers-way branch of ONE kernel call each over that super's
    * member centroids (generated code grows with √k, not k). */
  def routedAssign(vecs: DataFrame, idCol: String, vecCol: String,
                   routing: RoutingTable): DataFrame = {
    val routed = vecs
      .select(col(idCol).as("id"),
              col(vecCol).cast("array<double>").as("v"))
      .select(col("id"), col("v"),
              argminStruct(col("v"), routing.routeCents)
                .getField("cluster").as("super"))
    val best = routing.members.tail.foldLeft(
      when(col("super") === routing.members.head._1,
        graft.functions.NearestCentroid(col("v"),
          routing.members.head._2))) {
      case (acc, (s, members)) =>
        acc.when(col("super") === s,
          graft.functions.NearestCentroid(col("v"), members))
    }
    routed.select(col("id"), best.as("best"), col("super"))
      .select(col("id"), col("best.cluster").as("cluster"),
              floor(col("best.d") * lit(Q)).cast("long").as("dq"),
              col("super"))
  }

  /** Within-cluster exact-cosine near-dup pairs over the trained Lloyd
    * cells — the candidate generator of SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540): duplicates are only searched INSIDE a semantic
    * cluster, so candidate volume is Σ|cell|² instead of n² (with k
    * grown ∝ n, cell sizes — and the per-cell quadratic — stay
    * bounded; the paper uses the same argument). Plan shape mirrors
    * [[Ivf.nearDupPairs]]: one map-side assignment, the shared frame
    * repartitioned by cluster BEFORE the per-side renames so the
    * self-join's two exchange subtrees canonicalize identically and
    * ReusedExchange ships the vectors once. Single-cell assignment
    * (unlike IVF's multi-probe) means no pair can appear twice — no
    * dedup aggregation needed.
    *
    * Cache ownership: the staged frame persists for the session (same
    * stance as Ivf.nearDupPairs — CacheManager dedups repeat calls,
    * clearCache() reclaims between corpora).
    */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   model: KmeansModel, threshold: Double): DataFrame = {
    val staged = vecs
      .select(col(idCol).as("id"),
              col(vecCol).cast("array<double>").as("v"))
      .select(col("id"), col("v"),
              Similarity.norm(col("v")).as("nrm"),
              argminStruct(col("v"), model.last)
                .getField("cluster").as("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val colocated = staged.repartition(col("cluster"))
    val a = colocated.select(col("cluster"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = colocated.select(col("cluster"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("nrm_a") > 0 && col("nrm_b") > 0,
          Similarity.dot(col("v_a"), col("v_b"))
            / (col("nrm_a") * col("nrm_b")))
          .otherwise(lit(0.0)).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
