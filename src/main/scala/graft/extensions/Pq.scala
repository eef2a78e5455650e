package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding compression + approximate
  * nearest-neighbor search (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector space is split into `m` contiguous subspaces of `d/m`
  * dims; each subspace gets its own `nCodes`-entry codebook, and a
  * vector is stored as `m` small codes (one nearest-centroid id per
  * subspace). Search is asymmetric distance computation (ADC): the
  * query precomputes a distance table per subspace (query-subvector →
  * each centroid), and a candidate's approximate distance is just `m`
  * table lookups summed — no corpus vector is ever touched.
  *
  * Scale design (100 TB): the corpus side carries ONLY (id, codes[m]) —
  * a 64-dim float vector compresses 64×4 bytes → m bytes-ish of codes,
  * so the scan that search touches is ~64× smaller than the raw
  * embeddings; codes are computed in one map-side pass against centroid
  * literals (codegen'd arithmetic, no shuffle, no UDF). The query side
  * stages its `m` distance tables as array columns and broadcasts;
  * candidate scoring is `element_at` lookups — O(m) per pair instead
  * of O(d). Combine with [[Ivf]] cells for the classic IVF-PQ layout
  * (cell = partition key, codes = payload).
  *
  * Deterministic ("trainDeterministic", same contract as
  * [[Ivf.trainDeterministic]]): codebook entries are the subvectors of
  * the `nCodes` corpus ids with the smallest md5(id) — a seedless
  * uniform sample any engine can rebuild, which is what makes the full
  * encode+search pipeline SQL-oracle-checkable. KMeans-per-subspace
  * would give tighter cells but is impl-specific; the recall-vs-exact
  * property is pinned in tests instead.
  */
object Pq {

  /** centroids(j)(c) = codebook entry c of subspace j (dsub doubles). */
  final case class PqIndex(centroids: Array[Array[Array[Double]]],
                           dim: Int) {
    def m: Int = centroids.length
    def nCodes: Int = centroids.head.length
    def dsub: Int = dim / m
  }

  /** Persist the frozen codebooks as an (m·nCodes)-row parquet artifact
    * (j, code, sv, dim): encoded corpora only stay decodable/searchable
    * against EXACTLY the codebooks that encoded them — a refit orphans
    * every stored code — so the index is durable engine state, same
    * stance as [[Ivf.saveIndex]].
    */
  def saveIndex(spark: org.apache.spark.sql.SparkSession, index: PqIndex,
                dir: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- index.centroids.indices
      c <- index.centroids(j).indices
    } yield (j, c, index.centroids(j)(c).toSeq, index.dim)
    spark.createDataset(rows).toDF("j", "code", "sv", "dim")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[saveIndex]] artifact; fails fast on a damaged one (a
    * missing (subspace, code) pair) rather than silently mis-encoding.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                dir: String): PqIndex = {
    val rows = spark.read.parquet(dir).select("j", "code", "sv", "dim")
      .collect()
    require(rows.nonEmpty, s"empty PQ index artifact at $dir")
    val dim = rows.head.getInt(3)
    val m = rows.map(_.getInt(0)).max + 1
    val n = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * n,
      s"PQ index artifact at $dir has ${rows.length} rows, expected ${m * n}")
    val byKey = rows.map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    PqIndex(Array.tabulate(m)(j => Array.tabulate(n)(c => byKey((j, c)))),
      dim)
  }

  /** KMeans codebooks per subspace — the quality path (tighter cells
    * than the deterministic sample) when cross-engine reproducibility
    * isn't required; same dual-path stance as [[Ivf.train]] vs
    * [[Ivf.trainDeterministic]].
    *
    * The fit is the same BOUNDED, UNIFORM, DETERMINISTIC sample as
    * [[Ivf.train]]: the `maxSampleRows` vectors with the smallest
    * seed-keyed md5 — a TakeOrdered (per-partition top-k + merge, no
    * full sort shuffle). A bare `limit(maxSampleRows)` takes whatever
    * splits come first, and on a layout-correlated corpus
    * (time-partitioned, cluster-sorted — the normal 100 TB case) the
    * codebooks would only ever see the first stratum and quantization
    * error silently balloons for the rest (ExtensionsSpec plants
    * exactly that layout). The sample is taken ONCE and persisted; the
    * m subspace fits slice it — one corpus scan, not m.
    */
  def train(vecs: DataFrame, vecCol: String, m: Int = 4, nCodes: Int = 16,
            seed: Long = 42L, maxSampleRows: Int = 100000): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = vecs.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val sample = vecs
      .select(col(vecCol).cast("array<double>").as("v"),
              md5(concat(lit(seed.toString), lit("|"),
                         col(vecCol).cast("string"))).as("__h"))
      .orderBy("__h")
      .limit(maxSampleRows)
      .select("v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centroids = Array.tabulate(m) { j =>
        val sub = sample
          .select(array_to_vector(slice(col("v"), j * dsub + 1, dsub))
            .as("features"))
        new KMeans()
          .setK(nCodes).setSeed(seed + j).setMaxIter(20)
          .setFeaturesCol("features")
          .fit(sub).clusterCenters.map(_.toArray)
      }
      PqIndex(centroids, dim)
    } finally sample.unpersist()
  }

  /** Deterministic codebooks: the subvectors of the `nCodes` md5-smallest
    * ids. Collect is nCodes rows (index build — an offline step, bounded
    * and memoizable, same stance as the IVF index).
    */
  def trainDeterministic(vecs: DataFrame, idCol: String, vecCol: String,
                         m: Int = 4, nCodes: Int = 16): PqIndex = {
    val seeds = vecs
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"),
              md5(col(idCol).cast("string")).as("h"))
      .orderBy("h", "id")
      .limit(nCodes)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val centroids = Array.tabulate(m) { j =>
      seeds.map(v => v.slice(j * dsub, j * dsub + dsub))
    }
    PqIndex(centroids, dim)
  }

  /** One map-side pass: (id, codes[m]) where codes(j) = argmin centroid
    * of subspace j (ties → smaller code id). No shuffle — ONE native
    * codegen'd kernel per row (graft.functions.PqCodes). The composed
    * form this replaced (m × nCodes `array_sort(struct(aggregate(
    * zip_with(...))))` trees) was ~4k expression subtrees at m=8,
    * nCodes=256: 16 MiB task binaries and multi-second plan compiles.
    * Same FP fold order, same tie-break (smaller code) — bit-identical
    * results, verified by the unchanged ann_pq/ann_ivfpq oracles.
    */
  def encode(vecs: DataFrame, idCol: String, vecCol: String,
             index: PqIndex): DataFrame =
    vecs.select(col(idCol).as("id"), codesCol(col(vecCol), index))

  /** The codes array column [[encode]] and the IVF-PQ composition both
    * build on. */
  private[extensions] def codesCol(vec: Column, index: PqIndex): Column =
    graft.functions.PqCodes(vec, index.centroids).as("codes")

  /** Query-side flat ADC distance table (m·nCodes doubles, entry
    * j·nCodes+c = l2²(subvec_j, centroid_c)) — one native kernel. */
  private[extensions] def dtCol(vec: Column, index: PqIndex): Column =
    graft.functions.PqDistTable(vec, index.centroids).as("dt")

  /** Σ_j dtable[j·nCodes + codes_j] — left-associative over j, the same
    * add order as the per-subspace tables it replaced. */
  private[extensions] def adcDistance(index: PqIndex): Column =
    (0 until index.m)
      .map(j => element_at(col("dt"),
        lit(j * index.nCodes) + col("codes").getItem(j) + 1))
      .reduce(_ + _)

  /** ADC top-k: per query, approx dist = Σ_j dtable_j[codes_j]. The
    * encoded corpus is the probe side (ids+codes only); queries with
    * their staged distance tables broadcast.
    */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, index: PqIndex, topK: Int = 3): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, index)
    val probes = broadcast(
      queries.select(col(idCol).as("query_id"), dtCol(col(vecCol), index)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist"), col("neighbor_id"))
    codes.crossJoin(probes)
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
              adcDistance(index).as("approx_dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** IVF-PQ: the FAISS-style combined layout. The corpus index is
    * (id, cell, codes) — cell from the coarse quantizer (the
    * partition/bucket key at scale), codes the PQ payload; a query
    * probes its `nProbe` nearest cells and ranks ONLY those inverted
    * lists by ADC lookups. Against plain [[search]] this cuts the
    * scanned fraction to ~nProbe/k on top of PQ's per-pair O(m) cost;
    * against [[Ivf.search]] it never touches a raw corpus vector after
    * index build. Both quantizers deterministic → fully SQL-oracled.
    */
  def searchIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, ivf: Ivf.IvfIndex, pq: PqIndex,
                  nProbe: Int = 2, topK: Int = 3): DataFrame = {
    // one pass builds the combined index rows: coarse cell + PQ codes.
    // Cache ownership: the coded inverted lists ARE the index —
    // persisted once per corpus for the probe join; CacheManager
    // dedups repeat searches over the same corpus/plan, and the
    // entry lives for the session (spark.catalog.clearCache() to
    // reclaim between corpora — same stance as Ivf.search).
    val lists = codedLists(corpus, idCol, vecCol, ivf, pq)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    searchIvfPqLists(lists, queries, idCol, vecCol, ivf, pq, nProbe, topK)
  }

  /** The combined IVF-PQ corpus index rows (id, cell, codes): one
    * map-side pass — coarse-cell argmin + PQ encoding, both against
    * frozen quantizers, no shuffle. At scale this is the table that
    * ingest jobs append to, partitioned/bucketed by `cell`.
    */
  def codedLists(corpus: DataFrame, idCol: String, vecCol: String,
                 ivf: Ivf.IvfIndex, pq: PqIndex): DataFrame =
    Ivf.assign(corpus, idCol, vecCol, ivf)
      .select(col("id"), col("cell"), codesCol(col("vec"), pq))

  /** Append a new vector batch to existing coded lists WITHOUT
    * refitting either quantizer — the IVF-PQ face of
    * [[Ivf.appendAssign]]: assignment and encoding are per-row against
    * the frozen centroids/codebooks, so the merged lists are
    * bit-identical to a from-scratch [[codedLists]] of the full corpus
    * under the same indexes (asserted in ExtensionsSpec), and the
    * append is one map-side pass over the batch with zero history
    * reads. Whether the frozen quantizers still fit the data is
    * [[Ivf.refitAdvisory]]'s job — the advisory reads the same
    * assignment this append produces.
    */
  def appendCoded(lists: DataFrame, newVecs: DataFrame, idCol: String,
                  vecCol: String, ivf: Ivf.IvfIndex,
                  pq: PqIndex): DataFrame =
    lists.unionByName(codedLists(newVecs, idCol, vecCol, ivf, pq))

  /** Deterministic codebooks over NORMALIZED vectors — the
    * cosine-metric PQ (FAISS's normalize-then-L2 handling of inner
    * product/cosine): on unit vectors l2²(x̂, ŷ) = 2 − 2·cos(x, y), so
    * ADC distances ORDER BY approximate cosine instead of raw L2,
    * which is what every other ANN operator here ranks by. Pair with
    * [[codedListsCosine]] / [[searchIvfPqRerank]].
    */
  def trainDeterministicCosine(vecs: DataFrame, idCol: String,
                               vecCol: String, m: Int = 4,
                               nCodes: Int = 16): PqIndex =
    trainDeterministic(
      Ivf.prepped(vecs, idCol, vecCol).select(col("id"),
        col("nvec").as("vec")),
      "id", "vec", m, nCodes)

  /** The cosine-metric combined index rows (id, cell, codes): coarse
    * cell + PQ codes of the NORMALIZED vector, one map-side pass —
    * same cells as [[codedLists]] (the coarse quantizer always probes
    * normalized), but codes that make ADC rank by approximate cosine.
    */
  def codedListsCosine(corpus: DataFrame, idCol: String, vecCol: String,
                       ivf: Ivf.IvfIndex, pq: PqIndex): DataFrame =
    Ivf.prepped(corpus, idCol, vecCol)
      .select(col("id"),
        Ivf.topCells(col("nvec"), ivf, 1).getItem(0).as("cell"),
        codesCol(col("nvec"), pq))

  /** Two-phase IVF-PQ search (ADC shortlist → exact re-rank) — the
    * production retrieval pattern (FAISS "refine"): phase 1 probes
    * `nProbe` cells of cosine-metric coded lists (from
    * [[codedListsCosine]] — ADC on normalized vectors orders by
    * approximate cosine) and keeps the best `shortlist` rows per
    * query, never touching a raw corpus vector; phase 2 fetches exact
    * vectors for ONLY those survivors via an id equi-join against the
    * vector store and re-ranks them by exact cosine. PQ quantization
    * error then decides NOTHING beyond shortlist membership — the
    * returned order is exact, and because phase 1 approximates the
    * SAME metric phase 2 ranks by, recall loss is confined to
    * neighbors whose quantized cosine fell below R (tunable, monotone
    * in R).
    *
    * Scale shape: the shortlist (queries × R rows, ids only) is
    * BROADCAST into the vector-store scan, so the corpus is never
    * shuffled for the fetch and the exchange after it carries R rows
    * per query, not inverted lists; on an id-bucketed store the fetch
    * is a point lookup. Query vectors ride the same broadcast stance
    * as every probe side here.
    */
  def searchIvfPqRerank(lists: DataFrame, vecs: DataFrame,
                        queries: DataFrame, idCol: String, vecCol: String,
                        ivf: Ivf.IvfIndex, pq: PqIndex, nProbe: Int = 2,
                        shortlist: Int = 10, topK: Int = 3): DataFrame = {
    // phase 1: the searchIvfPqLists join shape with the distance table
    // built from the NORMALIZED query (matching the normalized codes)
    val probes = broadcast(
      Ivf.prepped(queries, idCol, vecCol)
        .select(col("id").as("query_id"),
          explode(Ivf.topCells(col("nvec"), ivf, nProbe)).as("cell"),
          dtCol(col("nvec"), pq)))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("approx_dist"), col("neighbor_id"))
    val short = lists.join(probes, "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
              adcDistance(pq).as("approx_dist"))
      .withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // phase 2: exact-vector fetch for the R survivors + exact re-rank
    val store = Ivf.prepped(vecs, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("vec").as("n_vec"),
              col("nrm").as("n_nrm"))
    val qs = broadcast(Ivf.prepped(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("vec").as("q_vec"),
              col("nrm").as("q_nrm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(short).join(store, "neighbor_id")
      .join(qs, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        when(col("q_nrm") > 0 && col("n_nrm") > 0,
          Similarity.dot(col("q_vec"), col("n_vec"))
            / (col("q_nrm") * col("n_nrm")))
          .otherwise(lit(0.0)).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Search PRE-BUILT coded lists ((id, cell, codes) from
    * [[codedLists]] / [[appendCoded]]) — the maintenance-path entry
    * point: at scale the coded lists are a persistent cell-partitioned
    * table that nightly appends extend, and queries must not re-encode
    * the corpus to probe it.
    */
  def searchIvfPqLists(lists: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String, ivf: Ivf.IvfIndex,
                       pq: PqIndex, nProbe: Int = 2,
                       topK: Int = 3): DataFrame = {
    // Ivf.prepped stages (id, vec, nrm, nvec) — reusing it keeps the
    // normalize-with-zero-guard (and its O(d²) staging invariant)
    // defined in exactly one place
    val probes = broadcast(
      Ivf.prepped(queries, idCol, vecCol)
        .select(col("id").as("query_id"), col("vec"),
          explode(Ivf.topCells(col("nvec"), ivf, nProbe)).as("cell"))
        .select(col("query_id"), col("cell"), dtCol(col("vec"), pq)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist"), col("neighbor_id"))
    lists.join(probes, "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
              adcDistance(pq).as("approx_dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
