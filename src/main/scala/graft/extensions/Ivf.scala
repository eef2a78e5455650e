package graft.extensions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus
  * into `k` Voronoi cells around KMeans centroids; a query scans only the
  * `nProbe` nearest cells instead of the whole corpus.
  *
  * Scale design: training samples the corpus (KMeans on a bounded
  * sample); assignment is one map-side pass (distance to k centroid
  * literals, codegen'd SeqDot); the inverted lists are just the corpus
  * partitioned by `cell` — at 100 TB that column is the partition/bucket
  * key, so a probe touches nProbe/k of the data. Search = equi-join on
  * the probed cell ids, then exact cosine rank within candidates.
  *
  * Per-row staging matters: the norm and the normalized vector are
  * materialized as their own projections BEFORE any lambda references
  * them — a norm expression inlined inside a `transform` lambda would be
  * re-evaluated once per vector ELEMENT (O(d²) per row; measured 8s vs
  * sub-second on 2k×64 vectors).
  *
  * Deterministic: fixed seed, fixed sample, centroids materialized as
  * literals (no RNG at query time). No SQL oracle (the index is
  * model-derived); full-probe search == brute force is asserted in tests.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** (id, vec, nrm, nvec) with norm and normalized vector staged as
    * attribute columns (computed once per row each); conditionally
    * repartitioned off a possibly-single-split scan (no-op when the scan
    * is already well split).
    */
  private[extensions] def prepped(vecs: DataFrame, idCol: String,
                                  vecCol: String): DataFrame =
    graft.ops.Partitioning.ensureParallelism(
        vecs.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(col("id"), col("vec"), Similarity.norm(col("vec")).as("nrm"))
      .select(col("id"), col("vec"), col("nrm"),
        transform(col("vec").cast("array<double>"),
          x => when(col("nrm") > 0, x / col("nrm")).otherwise(lit(0.0)))
          .as("nvec"))

  /** Train centroids with MLlib KMeans (cosine-friendly: vectors are
    * L2-normalized first so Euclidean cells ≈ angular cells).
    *
    * The fit is a BOUNDED, UNIFORM, DETERMINISTIC sample: the
    * `maxSampleRows` vectors with the smallest seed-keyed md5 — a
    * TakeOrdered (per-partition top-k + merge, no full sort shuffle), so
    * a 100 TB corpus contributes a layout-independent sample in one
    * bounded pass. A bare `limit(maxSampleRows)` is NOT that: it takes
    * whatever splits come first, and on a corpus whose layout correlates
    * with content (time-partitioned, cluster-sorted) the fit only ever
    * sees the first stratum (ExtensionsSpec plants exactly that layout
    * and checks recall parity with a full fit).
    */
  def train(vecs: DataFrame, vecCol: String, k: Int,
            seed: Long = 42L, maxSampleRows: Int = 100000): IvfIndex = {
    val normalized = prepped(vecs.withColumn("__id", lit(0L)), "__id", vecCol)
      .select(col("nvec"),
              md5(concat(lit(seed.toString), lit("|"),
                         col("nvec").cast("string"))).as("__h"))
      .orderBy("__h")
      .limit(maxSampleRows)
      .select(array_to_vector(col("nvec")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20).setFeaturesCol("features")
      .fit(normalized)
    IvfIndex(model.clusterCenters.map(_.toArray))
  }

  /** Deterministic sampled coarse quantizer (the FAISS-style alternative
    * to KMeans training): centroids are the normalized vectors of the k
    * corpus ids with the smallest md5(id) — a seedless uniform sample,
    * reproducible by ANY engine, so the full IVF search admits a SQL
    * oracle. Collect is k rows (index build, bounded by k). KMeans
    * [[train]] stays the quality path when reproducibility across
    * engines isn't required.
    */
  def trainDeterministic(vecs: DataFrame, idCol: String, vecCol: String,
                         k: Int): IvfIndex = {
    val seeds = prepped(vecs, idCol, vecCol)
      .select(col("id"), col("nvec"),
              md5(col("id").cast("string")).as("h"))
      .orderBy("h", "id")
      .limit(k)
      .collect()
    IvfIndex(seeds.map(_.getSeq[Double](1).toArray))
  }

  /** Top-`take` cell ids for a PRE-NORMALIZED vector column, ordered by
    * descending dot (ascending angle), ties to the larger cell id — one
    * native codegen'd kernel (graft.functions.TopCells). The composed
    * form this replaced (`reverse(array_sort(array(k × struct(SeqDot,
    * lit))))`) carried k expression subtrees and an O(k log k)
    * struct-array sort per corpus row, and its generated code grew with
    * k — at the sqrt(n) cell counts real corpora need (SCALECURVE.md ran
    * k=223), that meant 16 MiB task binaries and the sort rivaling the
    * distance arithmetic itself.
    */
  private[extensions] def topCells(nvec: Column, index: IvfIndex,
                                   take: Int): Column =
    graft.functions.TopCells(nvec, index.centroids, take)

  /** Cell assignment (the inverted-list / bucket key): nearest centroid.
    * Output: (id, vec, nrm, cell). Argmin scan — no per-row sort.
    */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
             index: IvfIndex): DataFrame =
    prepped(vecs, idCol, vecCol)
      .select(col("id"), col("vec"), col("nrm"),
        topCells(col("nvec"), index, 1).getItem(0).as("cell"))

  /** IVF top-k search: probe the `nProbe` nearest cells per query, rank
    * candidates by exact cosine (desc, id tie-break).
    */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, index: IvfIndex, nProbe: Int = 2,
             topK: Int = 3): DataFrame = {
    // Persisted: the assigned inverted lists ARE the index — materialize
    // them once (CacheManager dedups across searches over the same
    // corpus). Also a correctness-of-plan guard: the probe join infers
    // isnotnull(cell) and would push it BELOW the staged projections,
    // re-substituting the ranked-cells expression with the norm inlined
    // per vector element — the O(d²)-per-row pathology the staging
    // exists to prevent (measured 4.6s -> sub-second on 2k x 64).
    val lists = assign(corpus, idCol, vecCol, index)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    searchLists(lists, queries, idCol, vecCol, index, nProbe, topK)
  }

  /** Search PRE-ASSIGNED inverted lists ((id, vec, nrm, cell) from
    * [[assign]] / [[appendAssign]]) — the maintenance-path entry point:
    * at scale the lists are a cell-partitioned table that ingest jobs
    * append to, and queries must not re-derive them from raw vectors.
    */
  def searchLists(lists: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, index: IvfIndex, nProbe: Int = 2,
                  topK: Int = 3): DataFrame = {
    val probes = broadcast(
      prepped(queries, idCol, vecCol)
        .select(col("id").as("query_id"), col("vec").as("query_vec"),
                col("nrm").as("query_nrm"),
                explode(topCells(col("nvec"), index, nProbe)).as("cell")))
    val scored = lists.join(probes, "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
              when(col("query_nrm") > 0 && col("nrm") > 0,
                Similarity.dot(col("query_vec"), col("vec"))
                  / (col("query_nrm") * col("nrm")))
                .otherwise(lit(0.0)).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** [[searchLists]] with the probed cells additionally pushed as a
    * STATIC `cell IN (...)` predicate — the entry point for lists
    * stored as a `partitionBy("cell")` table (SCALE.md's "the cell is
    * the partition/bucket key at 100 TB" claim, made literal): the
    * IN-list lands in the scan's `PartitionFilters`, so file listing
    * itself skips every unprobed cell directory and the probe touches
    * ~nProbe/k of the data AT THE SOURCE, before any reading happens
    * (PlanShapeSpec pins this). Results are identical to
    * [[searchLists]]: the static filter is the UNION of all queries'
    * probed cells — a superset of each query's own — and the per-query
    * cell equi-join still restricts candidates exactly as before.
    *
    * The driver-side collect is the distinct probed cells of the query
    * BATCH — bounded by min(k, queries·nProbe) rows, the same
    * bounded-index-build stance as [[trainDeterministic]]; at serving
    * time this is the planner computing which partitions a query batch
    * needs, which is exactly a driver's job.
    */
  def searchListsPruned(lists: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, index: IvfIndex,
                        nProbe: Int = 2, topK: Int = 3): DataFrame = {
    val cells = prepped(queries, idCol, vecCol)
      .select(explode(topCells(col("nvec"), index, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    searchLists(lists.filter(col("cell").isInCollection(cells)),
      queries, idCol, vecCol, index, nProbe, topK)
  }

  /** Embedding near-duplicate PAIRS via the IVF partition — the scale
    * path for embedding-cosine dedup (the brute-force
    * `Similarity.pairwiseCosine` is the capped baseline): candidate
    * pairs are vectors sharing at least one of their `nProbe` nearest
    * cells (multi-probe assignment recovers boundary-straddling
    * near-dups that single-cell bucketing would split), verified by
    * exact cosine ≥ `threshold`.
    *
    * Scale shape: the ONLY join key is the cell id — there is no
    * all-pairs stage anywhere, and per-cell candidate volume is bounded
    * by inverted-list size (cells track sqrt(n) like the search path).
    * Vector payloads move AT MOST ONCE: when the cell join shuffles
    * (neither side broadcastable — the real corpus case), both join
    * sides are the SAME persisted staged frame, so Spark plans one
    * vector-carrying exchange and reuses it (ReusedExchange;
    * PlanShapeSpec pins this with broadcast disabled) — exactly the
    * co-location shuffle that a cell-bucketed lists table amortizes to
    * zero at 100 TB. Past that point vectors never move again: the
    * exact cosine is computed on the joined row, sub-threshold
    * candidates are filtered immediately, and the multi-probe pair
    * dedup aggregates (id_a, id_b, cos) only.
    */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   index: IvfIndex, threshold: Double,
                   nProbe: Int = 2): DataFrame = {
    // persisted for the same reason search() persists its lists: the
    // self-join infers isnotnull(cell) and would push it below the
    // staged norm/nvec projections, re-inlining the O(d²)-per-row norm
    // the staging exists to prevent — and the multi-probe assignment is
    // computed once, not once per join side. Cache ownership: this
    // entry is nProbe× the corpus (vectors included — each vector
    // appears once per probed cell) and lives for the session;
    // CacheManager dedups repeat calls over the same corpus, and
    // spark.catalog.clearCache() reclaims it between corpora — the
    // same stance as search(), at nProbe× the footprint
    val staged = prepped(vecs, idCol, vecCol)
      .select(col("id"), col("vec"), col("nrm"),
        explode(topCells(col("nvec"), index, nProbe)).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // co-locate by cell BEFORE the per-side renames: renamed sides
    // canonicalize differently, so leaving the shuffle to the join
    // plans one vector-carrying exchange PER SIDE; repartitioning the
    // shared frame first gives two identical exchange subtrees that
    // ReusedExchange collapses — vectors physically move once
    // (PlanShapeSpec pins this with broadcast disabled)
    val colocated = staged.repartition(col("cell"))
    val a = colocated.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = colocated.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(col("nrm_a") > 0 && col("nrm_b") > 0,
          Similarity.dot(col("vec_a"), col("vec_b"))
            / (col("nrm_a") * col("nrm_b")))
          .otherwise(lit(0.0)).as("cos"))
      .filter(col("cos") >= threshold)
      // a pair sharing both probed cells appears twice with an
      // identical exact cos — keep one
      .groupBy("id_a", "id_b")
      .agg(first(col("cos")).as("cos"))
  }

  // -------- incremental maintenance (append without refit) ------------

  /** Append a new vector batch to existing inverted lists WITHOUT
    * refitting: assignment is a per-row argmin over the frozen
    * centroids, so the append is one map-side pass over the batch and
    * the merged lists are bit-identical to a from-scratch [[assign]] of
    * the full corpus with the same index (asserted in ExtensionsSpec).
    * This is the 100 TB ingest shape: the nightly batch lands in the
    * cell-partitioned lists table with zero history reads; whether the
    * FROZEN centroids still fit the data is what [[refitAdvisory]]
    * measures.
    */
  def appendAssign(lists: DataFrame, newVecs: DataFrame, idCol: String,
                   vecCol: String, index: IvfIndex): DataFrame =
    lists.unionByName(assign(newVecs, idCol, vecCol, index))

  /** Persist the frozen coarse quantizer as a k-row parquet artifact
    * (cell, cvec): the index is state the engine must own across
    * restarts — append-without-refit ([[appendAssign]]) only composes
    * with yesterday's lists if today's job loads EXACTLY yesterday's
    * centroids (assignment is argmin over them; a refit would silently
    * orphan every existing cell id). Same artifact pattern as the Stage2
    * parquet checkpoint and the Bloom decontamination index.
    */
  def saveIndex(spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
                dir: String): Unit =
    centroidFrame(spark, index).select("cell", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a [[saveIndex]] artifact. Fails fast on a damaged artifact
    * (missing/duplicated cell ids) rather than silently mis-assigning.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                dir: String): IvfIndex = {
    val rows = spark.read.parquet(dir).select("cell", "cvec")
      .orderBy("cell").collect()
    require(rows.nonEmpty, s"empty IVF index artifact at $dir")
    val cells = rows.map(_.getInt(0)).toSeq
    require(cells == (0 until rows.length),
      s"IVF index artifact at $dir has non-contiguous cells: $cells")
    IvfIndex(rows.map(_.getSeq[Double](1).toArray))
  }

  /** The index's centroids as a k-row frame (cell, cvec, cnrm) — always
    * the broadcast side of stats joins.
    */
  def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                    index: IvfIndex): DataFrame = {
    import spark.implicits._
    spark.createDataset(index.centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "cvec")
      .select(col("cell"), col("cvec"), Similarity.norm(col("cvec")).as("cnrm"))
  }

  /** Per-cell occupancy and quantization error over assigned lists:
    * (cell, n, sum_qerr_q) where qerr = 1 − cos(vec, centroid) scaled to
    * fixed-point micro-units (floor(qerr·1e6) longs) so the distributed
    * sum is order-independent and engine-exact (the `embed_centroid`
    * trick). One broadcast join against the k-row centroid frame + one
    * k-row aggregate — index health at 100 TB costs a single scan of the
    * lists' (vec, nrm, cell) columns.
    */
  def cellStats(lists: DataFrame, index: IvfIndex): DataFrame = {
    val cents = broadcast(centroidFrame(lists.sparkSession, index))
    lists.join(cents, "cell")
      .select(col("cell"),
        floor((lit(1.0) -
          when(col("nrm") > 0 && col("cnrm") > 0,
            Similarity.dot(col("vec"), col("cvec"))
              / (col("nrm") * col("cnrm")))
            .otherwise(lit(0.0))) * 1e6).cast("long").as("qerr_q"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("qerr_q")).as("sum_qerr_q"))
  }

  /** Mode split of EVERY drifted cell in ONE distributed pass — the
    * fit engine behind [[refit]]. A drifted cell is, by the advisory's
    * definition, one centroid covering TWO error populations: members
    * the old centroid still fits (quantization error near the
    * historical mean) and members it doesn't (error near the flagged
    * batch mean). So the split the advisory calls for is not a generic
    * 2-means — it is a cut along the advisory's OWN criterion: members
    * with qerr above the midpoint of (hist_err, batch_err) form the
    * new mode, the rest the history mode, and each child is its mode's
    * mean. An empty side keeps the old centroid (a cell with no
    * history — `hist_n = 0` — plants its one child on the batch mode).
    *
    * Why this beats 2-means here, besides costing one pass instead of
    * a Lloyd loop: a well-known 2-means failure on drifted cells whose
    * HISTORY itself spans two populations is to split the history and
    * attach the new mode whole to one child — or, across several
    * drifted cells sharing one new mode, to plant several
    * near-identical new-mode children that then split that mode's
    * inverted list (measured as a single-probe recall regression in
    * ExtensionsSpec's planted-drift fixture). The qerr cut is anchored
    * to the old centroid, so the new mode separates exactly where the
    * advisory measured it.
    *
    * Scale shape: the naive alternative (a driver loop of per-cell
    * KMeans fits) serializes |D| full Spark jobs — sample plus 20
    * Lloyd iterations EACH — so a mass-drift event (hundreds of
    * flagged cells) pays |D| × per-job latency, driver-bound. Here ALL
    * cells split together: one broadcast join against the k-row
    * centroid frame + the |D|-row thresholds, one per-(cell, side,
    * dim) mean aggregate, one ≤2·|D|-row collect — wall flat in |D|
    * from 1 to k (ProfileRefit measures it). No RNG, no sample, no
    * iteration: the CUT is exactly reproducible given the lists and
    * the advisory; the mode means are distributed double sums, so they
    * carry the usual last-ulp summation-order sensitivity (the same
    * stance as any distributed KMeans fit — and immaterial to the
    * refit contract, which is proven for whatever centroids the fit
    * returns).
    *
    * @param evidence drifted cells' list rows: (id, vec, nrm, cell)
    * @param thresholds advisory rows for the drifted cells:
    *                   (cell, hist_err, batch_err)
    * @return cell -> (historyChild, newModeChild), one entry per cell
    *         present in `evidence`
    */
  private[extensions] def modeSplitFit(evidence: DataFrame,
      thresholds: DataFrame, index: IvfIndex)
      : Map[Int, (Seq[Double], Seq[Double])] = {
    val cents = broadcast(centroidFrame(evidence.sparkSession, index))
    val cut = broadcast(thresholds.select(col("cell"),
      ((col("hist_err") + col("batch_err")) / 2.0).as("cut")))
    evidence.join(cents, "cell").join(cut, "cell")
      .select(col("cell"),
        transform(col("vec").cast("array<double>"),
          x => when(col("nrm") > 0, x / col("nrm")).otherwise(lit(0.0)))
          .as("nvec"),
        // qerr vs the OLD centroid — the advisory's measure, plain
        // double (no cross-engine oracle consumes the fit)
        (lit(1.0) - when(col("nrm") > 0 && col("cnrm") > 0,
            Similarity.dot(col("vec"), col("cvec"))
              / (col("nrm") * col("cnrm")))
          .otherwise(lit(0.0))).as("qerr"),
        col("cut"))
      .select(col("cell"), (col("qerr") > col("cut")).as("hi"),
        posexplode(col("nvec")).as(Seq("pos", "x")))
      .groupBy("cell", "hi", "pos")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .groupBy("cell", "hi")
      .agg(sort_array(collect_list(struct(col("pos"),
        (col("sx") / col("n")).as("m")))).as("pm"))
      .select(col("cell"), col("hi"),
        transform(col("pm"), p => p.getField("m")).as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getBoolean(1)) -> r.getSeq[Double](2))
      .toMap
      .groupBy(_._1._1)
      .map { case (c, sides) =>
        val old = index.centroids(c).toSeq
        c -> (sides.getOrElse((c, false), old),
              sides.getOrElse((c, true), old))
      }
  }

  /** A completed [[refit]]: the new index (version to [[saveIndex]]
    * under a new path), the migrated lists, and which cells were
    * re-trained. */
  final case class Refit(index: IvfIndex, lists: DataFrame,
                         driftedCells: Seq[Int])

  /** Close the refit loop: consume a [[refitAdvisory]] frame, SPLIT
    * each drifted cell along the advisory's own error criterion —
    * every drifted cell cut TOGETHER in one distributed pass
    * ([[modeSplitFit]]), the history-mode child keeping the old cell
    * id and the new-mode child appended past `k` — and migrate the
    * lists. A drifted cell is, by the advisory's definition, one whose
    * single centroid now covers two populations (its history mode plus
    * the newly ingested one), so the split plants a centroid on EACH
    * mode; a re-pick of one centroid from the mixed membership could
    * not recover recall for either. Undrifted centroids keep their
    * cell ids untouched — their on-disk partitions stay addressable —
    * and the migration reads every list row at most once:
    *
    *   - rows in a drifted cell re-assign by full argmin over the new
    *     index (they must move — their centroid is gone);
    *   - rows in an undrifted cell compare their CURRENT centroid
    *     against only the 2·|D| NEW centroids (O(|D|) per row, not
    *     O(k)): the original assignment already proved the current
    *     cell beats every other undrifted centroid, so the global
    *     argmin under the new index is exactly max(current, best-new)
    *     under the same (dot desc, cell desc) order [[topCells]] uses.
    *
    * That case split makes the migrated lists EQUAL a from-scratch
    * [[assign]] of all vectors under the new index — not approximately,
    * row for row (asserted in ExtensionsSpec) — while the bulk of a
    * 100 TB corpus (the undrifted cells) pays O(|D|) dot products per
    * row and never shuffles: both branches are map-side against
    * centroid literals, and on a cell-partitioned lists table the
    * drifted branch is a partition-pruned scan.
    *
    * The advisory collect is ≤ k rows (bounded, like every index-build
    * step here). A refit ORPHANS the drifted cell ids' history — codes
    * and stats keyed to them must be rebuilt — which is why the result
    * is an explicit new index version, not an in-place mutation.
    */
  def refit(lists: DataFrame, advisory: DataFrame,
            index: IvfIndex): Refit = {
    val advRows = advisory.filter(col("drifted"))
      .select("cell", "hist_err", "batch_err")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drifted = advRows.select("cell").collect().map(_.getInt(0)).toSet
    if (drifted.isEmpty) {
      advRows.unpersist(false)
      return Refit(index, lists, Seq.empty)
    }
    val driftedSorted = drifted.toSeq.sorted
    val k = index.k
    val evidence = lists.filter(col("cell").isInCollection(drifted))
    // split fit: 2 children per drifted cell from that cell's members,
    // ALL cells cut together in one distributed pass (modeSplitFit —
    // wall flat in |D|, not |D| sequential KMeans jobs). A cell whose
    // members all land on one side of the error cut keeps its old
    // centroid as the other child; identical children are harmless —
    // ties go to the larger id on BOTH the migration and the
    // from-scratch side, so equality still holds.
    val merged = Array.ofDim[Array[Double]](k + driftedSorted.size)
    index.centroids.copyToArray(merged)
    val fits = modeSplitFit(evidence, advRows, index)
    advRows.unpersist(false)
    driftedSorted.zipWithIndex.foreach { case (cell, i) =>
      // a flagged cell with zero list rows (advisory built from stats
      // the lists don't carry yet) keeps its old centroid duplicated —
      // an explicit no-op split instead of a crash
      val (a, b) = fits.getOrElse(cell,
        (index.centroids(cell).toSeq, index.centroids(cell).toSeq))
      merged(cell) = a.toArray
      merged(k + i) = b.toArray
    }
    val newIndex = IvfIndex(merged)
    // mini-index of ONLY the new centroids: undrifted rows probe 2·|D|
    // candidates, not k; position order == real cell id order
    // (driftedSorted ascending, then k, k+1, …), so the kernel's
    // larger-position tie-break maps to the larger cell id
    val realIds = driftedSorted ++ (k until k + driftedSorted.size)
    val mini = IvfIndex(realIds.map(c => merged(c)).toArray)
    val realId = array(realIds.map(lit): _*)
    val moved = assign(evidence, "id", "vec", newIndex)
    // SeqDot and the TopCells kernel share the same left-to-right fold,
    // so d_cur/d_new here equal the dots a from-scratch assign would
    // compare — the case split below reproduces its (dot desc, cell
    // desc) pick bit-for-bit
    val miniLit = typedlit(mini.centroids.map(_.toSeq).toSeq)
    val cents = broadcast(centroidFrame(lists.sparkSession, index)
      .select(col("cell"), col("cvec")))
    val kept = lists.filter(!col("cell").isInCollection(drifted))
      .join(cents, "cell")
      .select(col("id"), col("vec"), col("nrm"), col("cell"), col("cvec"),
        transform(col("vec").cast("array<double>"),
          x => when(col("nrm") > 0, x / col("nrm")).otherwise(lit(0.0)))
          .as("nvec"))
      .select(col("id"), col("vec"), col("nrm"), col("cell"), col("nvec"),
        Similarity.dot(col("nvec"), col("cvec")).as("d_cur"),
        topCells(col("nvec"), mini, 1).getItem(0).as("pos"))
      .select(col("id"), col("vec"), col("nrm"), col("cell"),
        col("d_cur"),
        element_at(realId, col("pos") + 1).as("best_new"),
        Similarity.dot(col("nvec"), element_at(miniLit, col("pos") + 1))
          .as("d_new"))
      .select(col("id"), col("vec"), col("nrm"),
        when(col("d_new") > col("d_cur") ||
             (col("d_new") === col("d_cur") &&
              col("best_new") > col("cell")),
          col("best_new")).otherwise(col("cell")).as("cell"))
    Refit(newIndex, moved.unionByName(kept), driftedSorted)
  }

  /** Refit advisory: does a frozen index still fit newly ingested data?
    * Joins history vs batch [[cellStats]] per cell and flags cells whose
    * batch mean quantization error exceeds `ratio` × the history's —
    * sustained drift there means the Voronoi partition no longer matches
    * the data distribution and recall is silently decaying; the flag is
    * the trigger for an offline re-[[train]], exactly the health check a
    * production vector store runs at ingest. Pure fixed-point arithmetic
    * end-to-end → recomputable by a SQL oracle. Cells the batch never
    * touches are omitted (no evidence); cells with an empty history but
    * batch mass are flagged (the index has never seen that region).
    */
  def refitAdvisory(histStats: DataFrame, batchStats: DataFrame,
                    ratio: Double = 1.5): DataFrame = {
    val h = histStats.select(col("cell"), col("n").as("hist_n"),
      col("sum_qerr_q").as("hist_sum_q"))
    val b = batchStats.select(col("cell"), col("n").as("batch_n"),
      col("sum_qerr_q").as("batch_sum_q"))
    b.join(h, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("hist_n"), lit(0L)).as("hist_n"),
        (coalesce(col("hist_sum_q"), lit(0L)).cast("double") /
          (greatest(coalesce(col("hist_n"), lit(0L)), lit(1L))
            .cast("double") * 1e6)).as("hist_err"),
        col("batch_n"),
        (col("batch_sum_q").cast("double") /
          (col("batch_n").cast("double") * 1e6)).as("batch_err"))
      .withColumn("drifted",
        col("hist_n") === 0L ||
          col("batch_err") > col("hist_err") * ratio)
  }
}
