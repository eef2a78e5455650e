package graft

import org.apache.spark.sql.functions._

import graft.extensions.Graph

/** Fixed-point PageRank must be bit-exact against a sequential
  * reference of the same integer recurrence — the whole point of the
  * fixed-point design is that cluster layout cannot change the bits.
  */
class GraphSpec extends SparkTestBase {

  /** Sequential reference: identical integer recurrence, no Spark. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          dampNum: Long = 85L, dampDen: Long = 100L)
      : Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val base = Graph.Scale / verts.size.toLong
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = verts.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += rank(s) / outdeg(s)
      rank = verts.map(id =>
        id -> (teleport + (dampNum * contrib(id)) / dampDen)).toMap
    }
    rank
  }

  // hub (0), multi-edge (0->1 twice), self-loop (2->2), dangling sink
  // (3 has no out-edges), pure source (4 has no in-edges)
  private val fixture: Seq[(Long, Long)] = Seq(
    (0L, 1L), (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L),
    (2L, 0L), (2L, 2L), (4L, 0L), (4L, 2L))

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.pageRankFixedPoint(e, "src", "dst", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the sequential integer reference bit-for-bit " +
       "(hub, multi-edge, self-loop, dangling sink, pure source)") {
    assert(run(fixture, 1) == refPageRank(fixture, 1))
    assert(run(fixture, 4) == refPageRank(fixture, 4))
  }

  test("partitioning cannot change the bits") {
    assert(run(fixture, 3, parts = 7) == refPageRank(fixture, 3))
  }

  test("rank semantics: the hub out-ranks the pure source, the sink " +
       "keeps only teleport+inflow, total mass is conserved up to " +
       "truncation") {
    val r = run(fixture, 4)
    val base = Graph.Scale / 5L
    // vertex 4 has no in-edges: settles at exactly the teleport term
    assert(r(4L) == (15L * base) / 100L)
    // 2 has three in-edges incl. a hub — must out-rank the source
    assert(r(2L) > r(4L))
    // truncation only ever loses mass (≤ 1 unit per vertex per step,
    // plus the dangling sink's damped outflow each round)
    val total = r.values.sum
    assert(total <= Graph.Scale)
    // the sink leaks its damped mass each round; with ~20% of mass at
    // the sink the fixed point is ≈0.47·Scale — assert a safe floor
    assert(total > Graph.Scale / 3)
  }

  /** Sequential reference for the seeded variant. */
  private def refPersonalized(edges: Seq[(Long, Long)], seeds: Set[Long],
                              iters: Int, dampNum: Long = 85L,
                              dampDen: Long = 100L): Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val inGraph = seeds.intersect(verts.toSet)
    val share = Graph.Scale / inGraph.size.toLong
    val tpSeed = ((dampDen - dampNum) * share) / dampDen
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = verts.map(id =>
      id -> (if (inGraph(id)) share else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += rank(s) / outdeg(s)
      rank = verts.map(id =>
        id -> ((if (inGraph(id)) tpSeed else 0L) +
          (dampNum * contrib(id)) / dampDen)).toMap
    }
    rank
  }

  private def runSeeded(edges: Seq[(Long, Long)], seeds: Seq[Long],
                        iters: Int, parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.personalizedPageRank(e, "src", "dst",
        seeds.toDF("doc_id"), "doc_id", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("personalized: matches the sequential reference bit-for-bit; " +
       "duplicate and off-graph seed ids are ignored") {
    // seeds {0, 4} listed with a duplicate and a vertex (99) that is
    // not in the graph — both must not change the mass distribution
    val got = runSeeded(fixture, Seq(0L, 4L, 4L, 99L), 4, parts = 5)
    assert(got == refPersonalized(fixture, Set(0L, 4L), 4))
  }

  test("personalized: vertices unreachable from the seeds settle at " +
       "exactly zero — trust does not leak backwards over links") {
    // seed only the dangling sink (3): nothing is reachable FROM it,
    // so every other vertex must score exactly 0 (integral — not eps)
    val got = runSeeded(fixture, Seq(3L), 3)
    assert(got(3L) > 0L)
    assert(got.filter(_._1 != 3L).values.forall(_ == 0L))
    // and the seed keeps exactly the teleport term (no in-flow from
    // the zeroed rest of the graph)
    val share = Graph.Scale / 1L
    assert(got(3L) == (15L * share) / 100L)
  }

  /** Sequential reference for a warm-started run: the same recurrence
    * from an ARBITRARY init vector (absent ids start at base).
    */
  private def refPageRankFrom(edges: Seq[(Long, Long)],
                              init: Map[Long, Long], iters: Int,
                              dampNum: Long = 85L, dampDen: Long = 100L)
      : Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val base = Graph.Scale / verts.size.toLong
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = verts.map(id => id -> init.getOrElse(id, base)).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += rank(s) / outdeg(s)
      rank = verts.map(id =>
        id -> (teleport + (dampNum * contrib(id)) / dampDen)).toMap
    }
    rank
  }

  test("resume split equality: resume(fromScratch(2), 2) == " +
       "fromScratch(4) bit-for-bit, under a different partitioning") {
    import spark.implicits._
    val e = fixture.toDF("src", "dst")
    val first = Graph.pageRankFixedPoint(e, "src", "dst", iterations = 2)
    val resumed = Graph.pageRankResume(e.repartition(7), "src", "dst",
        first, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == refPageRank(fixture, 4))
  }

  test("resume after an edge-batch append: saved vertices warm-start " +
       "at their rank, new vertices at the NEW uniform base — " +
       "bit-equal to the sequential warm-start reference") {
    import spark.implicits._
    val e = fixture.toDF("src", "dst")
    val saved = Graph.pageRankFixedPoint(e, "src", "dst", iterations = 3)
    val savedMap =
      saved.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the append introduces vertex 5 (new) and re-links the sink
    val appended = fixture ++ Seq((5L, 0L), (3L, 5L))
    val got = Graph.pageRankResume(appended.toDF("src", "dst"),
        "src", "dst", saved, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRankFrom(appended, savedMap, 2))
    assert(got.contains(5L), "appended vertex must be ranked")
  }

  /** Sequential reference for HITS: same integer recurrence with the
    * common-divisor renormalization (x div max(1, total div Scale)).
    */
  private def refHits(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def renorm(raw: Map[Long, Long]): Map[Long, Long] = {
      val div = math.max(1L, raw.values.sum / Graph.Scale)
      verts.map(id => id -> raw.getOrElse(id, 0L) / div).toMap
    }
    var hub = verts.map(_ -> Graph.Scale / verts.size.toLong).toMap
    var auth = verts.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val araw =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) araw(d) += hub(s)
      auth = renorm(araw.toMap)
      val hraw =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) hraw(s) += auth(d)
      hub = renorm(hraw.toMap)
    }
    verts.map(id => id -> (hub(id), auth(id))).toMap
  }

  test("HITS matches the sequential integer reference bit-for-bit " +
       "under re-partitioning; pure sources have zero authority and " +
       "sinks zero hub score") {
    import spark.implicits._
    val got = Graph.hitsFixedPoint(fixture.toDF("src", "dst")
        .repartition(7), "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == refHits(fixture, 4))
    // 4 has no in-edges: nothing confers authority on it
    assert(got(4L)._2 == 0L)
    // 3 has no out-edges: it endorses nothing, hub score exactly 0
    assert(got(3L)._1 == 0L)
    // 2 is the most-cited vertex (3 in-edges incl. the hub) — top auth
    assert(got.maxBy(_._2._2)._1 == 2L)
  }

  /** refHits from an arbitrary hub start (absent ids at the uniform
    * hub base) — the warm-start reference.
    */
  private def refHitsFrom(edges: Seq[(Long, Long)],
                          hubInit: Map[Long, Long], iters: Int)
      : Map[Long, (Long, Long)] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def renorm(raw: Map[Long, Long]): Map[Long, Long] = {
      val div = math.max(1L, raw.values.sum / Graph.Scale)
      verts.map(id => id -> raw.getOrElse(id, 0L) / div).toMap
    }
    val base = Graph.Scale / verts.size.toLong
    var hub = verts.map(id => id -> hubInit.getOrElse(id, base)).toMap
    var auth = verts.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val araw =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) araw(d) += hub(s)
      auth = renorm(araw.toMap)
      val hraw =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) hraw(s) += auth(d)
      hub = renorm(hraw.toMap)
    }
    verts.map(id => id -> (hub(id), auth(id))).toMap
  }

  test("HITS resume split equality: resume(fromScratch(2), 2) == " +
       "fromScratch(4) bit-for-bit, under a different partitioning") {
    import spark.implicits._
    val e = fixture.toDF("src", "dst")
    val saved = Graph.hitsFixedPoint(e, "src", "dst", iterations = 2)
    val got = Graph.hitsResume(e.repartition(7), "src", "dst", saved,
        iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == refHits(fixture, 4))
  }

  test("HITS resume after an edge-batch append: saved vertices keep " +
       "their hub vector, new vertices start at the NEW uniform hub " +
       "base — bit-equal to the warm-start reference") {
    import spark.implicits._
    val saved = Graph.hitsFixedPoint(fixture.toDF("src", "dst"),
      "src", "dst", iterations = 3)
    val savedHub =
      saved.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val appended = fixture ++ Seq((5L, 2L), (3L, 5L))
    val got = Graph.hitsResume(appended.toDF("src", "dst"), "src", "dst",
        saved, iterations = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == refHitsFrom(appended, savedHub, 2))
    assert(got.contains(5L), "appended vertex must be scored")
  }

  /** Sequential reference for the weighted recurrence: contribution
    * (w · rank) div W per edge, W = total out-weight.
    */
  private def refWeighted(edges: Seq[(Long, Long, Long)], iters: Int,
                          dampNum: Long = 85L, dampDen: Long = 100L)
      : Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val base = Graph.Scale / verts.size.toLong
    val teleport = ((dampDen - dampNum) * base) / dampDen
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = verts.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d, w) <- edges) contrib(d) += (w * rank(s)) / outW(s)
      rank = verts.map(id =>
        id -> (teleport + (dampNum * contrib(id)) / dampDen)).toMap
    }
    rank
  }

  private def runWeighted(edges: Seq[(Long, Long, Long)], iters: Int,
                          parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst", "wt")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.pageRankWeighted(e, "src", "dst", "wt", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted pagerank matches the sequential reference bit-for-bit " +
       "and a heavily weighted edge moves real mass") {
    // same topology as the fixture but 0->2 carries weight 40
    val weighted = fixture.map { case (s, d) =>
      (s, d, if ((s, d) == (0L, 2L)) 40L else 1L) }
    val got = runWeighted(weighted, 4, parts = 5)
    assert(got == refWeighted(weighted, 4))
    // vs uniform: 0's mass now flows overwhelmingly to 2, not 1
    val uniform = refPageRank(fixture, 4)
    assert(got(2L) > uniform(2L) && got(1L) < uniform(1L),
      s"weight must redirect mass: got=$got uniform=$uniform")
  }

  test("all-1 weights reduce bit-for-bit to the uniform engine") {
    val w1 = fixture.map { case (s, d) => (s, d, 1L) }
    assert(runWeighted(w1, 4) == refPageRank(fixture, 4))
  }

  test("non-positive and over-cap weights are rejected before any " +
       "iteration runs") {
    intercept[IllegalArgumentException] {
      runWeighted(Seq((0L, 1L, 0L), (1L, 0L, 1L)), 1)
    }
    intercept[IllegalArgumentException] {
      runWeighted(Seq((0L, 1L, 2000000L), (1L, 0L, 1L)), 1)
    }
  }

  test("a NULL weight among valid ones is rejected (min/max alone " +
       "would pass it and silently drop rank mass)") {
    import spark.implicits._
    val e = Seq((0L, 1L, Some(3L)), (1L, 2L, None: Option[Long]),
                (2L, 0L, Some(1L))).toDF("src", "dst", "wt")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankWeighted(e, "src", "dst", "wt", iterations = 1)
    }
    assert(ex.getMessage.contains("null"), ex.getMessage)
  }

  /** Sequential reference for weighted + personalized: seeded teleport
    * and init, (w·rank) div W flow.
    */
  private def refSeededWeighted(edges: Seq[(Long, Long, Long)],
                                seeds: Set[Long], iters: Int)
      : Map[Long, Long] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val s = verts.count(seeds)
    val share = Graph.Scale / s
    val tp = (15L * share) / 100L
    val outW = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var rank = verts.map(id => id -> (if (seeds(id)) share else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib =
        scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, d, w) <- edges) contrib(d) += (w * rank(u)) / outW(u)
      rank = verts.map(id =>
        id -> ((if (seeds(id)) tp else 0L) + (85L * contrib(id)) / 100L)).toMap
    }
    rank
  }

  private def runSeededWeighted(edges: Seq[(Long, Long, Long)],
                                seeds: Seq[Long], iters: Int,
                                parts: Int = 1): Map[Long, Long] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst", "wt")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.personalizedPageRankWeighted(e, "src", "dst",
        seeds.toDF("doc_id"), "doc_id", "wt", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted + personalized (TrustRank): matches the sequential " +
       "reference bit-for-bit under a different partitioning") {
    val weighted = fixture.map { case (s, d) =>
      (s, d, if ((s, d) == (0L, 2L)) 40L else 2L) }
    val got = runSeededWeighted(weighted, Seq(0L, 4L), 4, parts = 5)
    assert(got == refSeededWeighted(weighted, Set(0L, 4L), 4))
  }

  test("weighted + personalized with all-1 weights reduces bit-for-bit " +
       "to the uniform seeded engine") {
    val w1 = fixture.map { case (s, d) => (s, d, 1L) }
    assert(runSeededWeighted(w1, Seq(0L, 4L), 4) ==
      runSeeded(fixture, Seq(0L, 4L), 4))
  }

  /** First 8 hex digits of md5 as a long — mirrors Graph.pickHash
    * (32-bit walk-pick entropy; the edge-stride generator below stays
    * at 4 nibbles to match docLinkEdges).
    */
  private def pickHash(s: String): Long =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))

  /** Sequential reference for deterministicWalks. */
  private def refWalks(edges: Seq[(Long, Long)], steps: Int,
                       walks: Int = 1): Set[(Long, Int, Int, Long)] = {
    val bySrc = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).sorted }
    val out = scala.collection.mutable.Set.empty[(Long, Int, Int, Long)]
    for (st <- edges.map(_._1).distinct; wk <- 0 until walks) {
      var cur = st
      out += ((st, wk, 0, st))
      var alive = true
      for (t <- 1 to steps if alive) {
        bySrc.get(cur) match {
          case Some(ds) =>
            cur = ds((pickHash(s"$cur#$wk#$t") % ds.size).toInt)
            out += ((st, wk, t, cur))
          case None => alive = false
        }
      }
    }
    out.toSet
  }

  private def runWalks(edges: Seq[(Long, Long)], steps: Int,
                       walks: Int = 1, parts: Int = 1)
      : Set[(Long, Int, Int, Long)] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.deterministicWalks(e, "src", "dst", steps = steps,
        walksPerStart = walks)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
  }

  test("deterministic walks match the sequential md5-pick reference " +
       "and are partitioning-independent") {
    val expected = refWalks(fixture, 3)
    assert(runWalks(fixture, 3) == expected)
    assert(runWalks(fixture, 3, parts = 7) == expected)
  }

  test("multiple walks per start explore independently and still " +
       "match the reference") {
    val expected = refWalks(fixture, 3, walks = 3)
    assert(runWalks(fixture, 3, walks = 3, parts = 5) == expected)
    // the walk dimension must actually diversify: some start has two
    // walks whose step-1 nodes differ (hub 0 and 1 both have deg > 1)
    val byStartStep1 = expected.collect {
      case (st, wk, 1, node) => (st, node)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).size }
    assert(byStartStep1.values.exists(_ > 1),
      "3 walks over multi-out-degree vertices should split at step 1")
  }

  test("walks end early at a dangling vertex instead of emitting " +
       "padded or null steps") {
    // 0 -> 1 -> 2, vertex 2 dangling: walk from 0 has steps 0..2 only,
    // walk from 1 has steps 0..1 only (deg=1 everywhere → md5-free)
    val got = runWalks(Seq((0L, 1L), (1L, 2L)), 3)
    assert(got == Set((0L, 0, 0, 0L), (0L, 0, 1, 1L), (0L, 0, 2, 2L),
      (1L, 0, 0, 1L), (1L, 0, 1, 2L)))
  }

  /** Sequential reference for biasedWalks: same recurrence, no Spark —
    * step 1 uniform, step t≥2 picks by md5 mod total weight mapped
    * through cumulative ranges over the dst-sorted candidates.
    */
  private def refBiasedWalks(edges: Seq[(Long, Long)], steps: Int,
                             walks: Int, wR: Long, wS: Long, wE: Long)
      : Set[(Long, Int, Int, Long)] = {
    val bySrc = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._2).sorted }
    val out = scala.collection.mutable.Set.empty[(Long, Int, Int, Long)]
    for (st <- edges.map(_._1).distinct; wk <- 0 until walks) {
      var cur = st
      var prev = -1L
      out += ((st, wk, 0, st))
      var alive = true
      for (t <- 1 to steps if alive) {
        bySrc.get(cur) match {
          case None => alive = false
          case Some(ds) if t == 1 =>
            prev = cur
            cur = ds((pickHash(s"$cur#$wk#$t") % ds.size).toInt)
            out += ((st, wk, t, cur))
          case Some(ds) =>
            val prevDs = bySrc(prev)
            val wts = ds.map(d =>
              if (d == prev) wR else if (prevDs.contains(d)) wS else wE)
            var target = pickHash(s"$cur#$wk#$t") % wts.sum
            var idx = 0
            while (target >= wts(idx)) { target -= wts(idx); idx += 1 }
            prev = cur
            cur = ds(idx)
            out += ((st, wk, t, cur))
        }
      }
    }
    out.toSet
  }

  private def runBiased(edges: Seq[(Long, Long)], steps: Int, walks: Int,
                        wR: Int, wS: Int, wE: Int, parts: Int = 1)
      : Set[(Long, Int, Int, Long)] = {
    import spark.implicits._
    val e0 = edges.toDF("src", "dst")
    val e = if (parts > 1) e0.repartition(parts) else e0
    Graph.biasedWalks(e, "src", "dst", steps = steps,
        walksPerStart = walks, wReturn = wR, wStay = wS, wExplore = wE)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
  }

  test("biased walks with equal weights ARE the uniform walks, row " +
       "for row") {
    assert(runBiased(fixture, 3, 2, 1, 1, 1) == refWalks(fixture, 3, 2))
  }

  test("biased walks match the sequential node2vec-weight reference " +
       "bit-for-bit, under a different partitioning") {
    val expected = refBiasedWalks(fixture, 3, 2, wR = 1, wS = 2, wE = 4)
    assert(runBiased(fixture, 3, 2, 1, 2, 4, parts = 7) == expected)
  }

  test("an overwhelming return bias makes step 2 backtrack wherever " +
       "the walk CAN return (prev reachable from cur)") {
    // ring + chords so every vertex has deg >= 2 and every edge has a
    // reverse: with wReturn=1000 vs 1, step-2 must return to the start
    val n = 40L
    val ring = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), ((i + 1) % n, i),
          (i, (i + 7) % n), ((i + 7) % n, i)))
    val got = runBiased(ring, 2, 1, 1000, 1, 1)
    val byStart = got.groupBy(_._1)
    val returned = byStart.count { case (st, rows) =>
      rows.exists { case (_, _, step, node) => step == 2 && node == st } }
    // total candidate weight per step-2 pick is ≤ 1000 + 3·1; the md5
    // target lands in the return range unless it falls in the tail —
    // expect ≥ 95% returns over 40 starts
    assert(returned >= 38, s"only $returned/40 walks returned")
  }

  /** Sequential reference for labelPropagation (synchronous rounds,
    * neighbor mode, min-label tie-break, clamped seeds).
    */
  private def refLabelProp(edges: Seq[(Long, Long)],
                           seeds: Map[Long, String], rounds: Int)
      : Map[Long, (Option[String], Boolean)] = {
    val sym = edges ++ edges.map(e => (e._2, e._1))
    val verts = sym.map(_._1).distinct.sorted
    var lab: Map[Long, Option[String]] =
      verts.map(v => v -> seeds.get(v)).toMap
    for (_ <- 1 to rounds) {
      val next = verts.map { v =>
        if (seeds.contains(v)) v -> lab(v)
        else {
          val nbrLabels = sym.collect { case (a, b) if a == v => lab(b) }
            .flatten
          if (nbrLabels.isEmpty) v -> lab(v)
          else {
            val counts = nbrLabels.groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            val best = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
            v -> Some(best)
          }
        }
      }.toMap
      lab = next
    }
    verts.map(v => v -> ((lab(v), seeds.contains(v)))).toMap
  }

  test("label propagation matches the sequential mode/tie reference; " +
       "seeds stay clamped and unreached vertices stay null") {
    import spark.implicits._
    // fixture + an extra far vertex chain 5 -> 6 so that 6 is only
    // reached at round 2 and 7 (isolated pair 7 <-> 8) never is
    val edges = fixture ++ Seq((5L, 6L), (0L, 5L), (7L, 8L))
    val seeds = Map(0L -> "en", 2L -> "de")
    val got = graft.extensions.Graph.labelPropagation(
        edges.toDF("src", "dst"), "src", "dst",
        seeds.toSeq.toDF("doc_id", "lang"), "doc_id", "lang", rounds = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getBoolean(2)))).toMap
    assert(got == refLabelProp(edges, seeds, 3))
    // the isolated component never hears from a seed
    assert(got(7L)._1.isEmpty && got(8L)._1.isEmpty)
    // seeds keep their own labels whatever the neighborhood says
    assert(got(0L)._1.contains("en") && got(2L)._1.contains("de"))
  }

  test("label propagation resume: resume(fromScratch(1), 2) == " +
       "fromScratch(3) bit-for-bit; appended vertices start unlabeled") {
    import spark.implicits._
    val edges = fixture ++ Seq((5L, 6L), (0L, 5L), (7L, 8L))
    val seeds = Map(0L -> "en", 2L -> "de")
    val e = edges.toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getBoolean(2)))).toMap
    val one = graft.extensions.Graph.labelPropagation(e, "src", "dst",
      seeds.toSeq.toDF("doc_id", "lang"), "doc_id", "lang", rounds = 1)
    val resumed = rows(graft.extensions.Graph.labelPropagationResume(
      e.repartition(5), "src", "dst", one, rounds = 2))
    assert(resumed == refLabelProp(edges, seeds, 3))
    // append an edge introducing vertex 9 next to the seeded hub: on
    // resume it starts unlabeled/unclamped and picks up 0's label in
    // one round
    val appended = (edges ++ Seq((0L, 9L))).toDF("src", "dst")
    val after = rows(graft.extensions.Graph.labelPropagationResume(
      appended, "src", "dst", one, rounds = 1))
    assert(after(9L) == ((Some("en"), false)))
  }

  test("skip-gram pairs: window-bounded ordered co-occurrence counts " +
       "per walk, repeated nodes accumulate") {
    import spark.implicits._
    // one walk 0 -> 5 -> 7 -> 5 (node 5 recurs) and an unrelated
    // 1-step walk that must not cross-pair with it
    val walks = Seq(
      (0L, 0, 0, 0L), (0L, 0, 1, 5L), (0L, 0, 2, 7L), (0L, 0, 3, 5L),
      (9L, 0, 0, 9L), (9L, 0, 1, 4L))
      .toDF("start", "walk", "step", "node")
    val got = Graph.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 5L) -> 1L, (0L, 7L) -> 1L, (5L, 0L) -> 1L, (5L, 7L) -> 2L,
      (5L, 5L) -> 2L, (7L, 0L) -> 1L, (7L, 5L) -> 2L,
      (9L, 4L) -> 1L, (4L, 9L) -> 1L))
  }

  test("fused walk skip-grams are bit-equal to " +
       "skipGramPairs(deterministicWalks) — dangling vertices, " +
       "multi-walk fanout, window clipping, and a window wider than " +
       "the walk all included") {
    import spark.implicits._
    // ring-jump graph plus a dangling tail: 60 -> 61 -> 62, where 62
    // has no out-edges, so walks through it die early; vertex ids
    // overlap the ring to force cross-walk pair accumulation
    val n = 60L
    val ring = spark.range(0, n).toDF("src")
      .select(col("src"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      .select(col("src"),
        ((col("src") + 1L +
          pmod(hash(col("src") * 31L + col("j")), lit(n - 1))) % n)
          .as("dst"))
    val dangling = Seq((60L, 61L), (61L, 62L), (0L, 60L)).toDF("src", "dst")
    val edges = ring.union(dangling)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((steps, wps, window) <- Seq((3, 2, 2), (4, 1, 3), (2, 2, 16))) {
      val unfused = Graph.skipGramPairs(
        Graph.deterministicWalks(edges, "src", "dst", steps, wps), window)
      val fused = Graph.walkSkipGramPairs(edges, "src", "dst", steps,
        wps, window)
      assert(canon(fused) == canon(unfused),
        s"fused != unfused at steps=$steps walks=$wps window=$window")
      assert(canon(fused).nonEmpty)
    }
    // biased variant: bit-equal to skipGramPairs(biasedWalks) with real
    // weights, and the all-equal-weights reduction IS the uniform fused
    val biasedUnfused = Graph.skipGramPairs(
      Graph.biasedWalks(edges, "src", "dst", 3, 2,
        wReturn = 1, wStay = 2, wExplore = 4), window = 2)
    val biasedFused = Graph.walkSkipGramPairsBiased(edges, "src", "dst",
      3, 2, 2, wReturn = 1, wStay = 2, wExplore = 4)
    assert(canon(biasedFused) == canon(biasedUnfused))
    assert(canon(biasedFused) !=
      canon(Graph.walkSkipGramPairs(edges, "src", "dst", 3, 2, 2)),
      "sanity: the bias must actually change the pair counts")
    assert(canon(Graph.walkSkipGramPairsBiased(edges, "src", "dst",
        3, 2, 2, 1, 1, 1)) ==
      canon(Graph.walkSkipGramPairs(edges, "src", "dst", 3, 2, 2)),
      "all-equal weights must reduce to the uniform fused walker")
  }

  test("a larger random-ish graph stays exact through more rounds") {
    // 400 vertices, 3 deterministic stride out-links each — the same
    // ring-jump construction the pagerank registry demo uses
    val n = 400L
    val edges = for {
      i <- 0L until n
      j <- 1 to 3
    } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
        .take(2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (i, (i + 1 + (h % (n - 1))) % n)
    }
    assert(run(edges, 6, parts = 5) == refPageRank(edges, 6))
  }

  /** Sequential brute-force triangle reference over the simple
    * undirected graph (set of a<b pairs, self-loops dropped).
    */
  private def refTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Double)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val verts = (und.map(_._1) ++ und.map(_._2)).toSeq.sorted
    val adj = verts.map(v => v -> und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    verts.map { v =>
      val nbrs = adj(v).toSeq.sorted
      val tri = (for {
        i <- nbrs.indices; j <- (i + 1) until nbrs.size
        if und.contains((math.min(nbrs(i), nbrs(j)),
                         math.max(nbrs(i), nbrs(j))))
      } yield 1).size.toLong
      val d = nbrs.size.toLong
      val lcc = if (d >= 2) 2.0 * tri / (d * (d - 1.0)) else 0.0
      v -> (d, tri, lcc)
    }.toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)], parts: Int = 1)
      : Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst").repartition(parts)
    Graph.triangleCounts(df, "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toMap
  }

  test("triangles: K4 is all-1.0 lcc, a pendant vertex is 0.0, and " +
       "direction / multiplicity / self-loops do not count") {
    // K4 on 0..3, plus pendant 4-0; noise: reversed duplicates, a
    // doubled edge, and a self-loop — none may change the counts
    val clean = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (4L, 0L))
    val noisy = clean ++ Seq((1L, 0L), (2L, 1L), (0L, 1L), (2L, 2L))
    val expect = refTriangles(clean)
    assert(runTriangles(clean) == expect)
    assert(runTriangles(noisy, parts = 3) == expect)
    assert(expect(0L) == ((4L, 3L, 2.0 * 3 / (4 * 3.0))))
    assert(expect(1L) == ((3L, 3L, 1.0)))
    assert(expect(4L) == ((1L, 0L, 0.0)))
  }

  test("triangles: the ring-stride graph matches the brute-force " +
       "reference on every vertex, any partitioning") {
    val n = 120L
    val edges = for {
      i <- 0L until n
      j <- 1 to 3
    } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
        .take(2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (i, (i + 1 + (h % (n - 1))) % n)
    }
    assert(runTriangles(edges, parts = 7) == refTriangles(edges))
  }

  /** Sequential link-prediction reference: common neighbors among
    * degree-capped centers, 2^20 div deg weights, non-adjacent pairs
    * only, (wscore desc, a, b) top-k.
    */
  private def refLinkCandidates(edges: Seq[(Long, Long)], maxDeg: Int,
                                k: Int): Seq[(Long, Long, Long, Long)] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = (und.toSeq ++ und.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val scores = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    for ((u, nbrs) <- adj if nbrs.size <= maxDeg) {
      val invw = 1048576L / nbrs.size
      val sorted = nbrs.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size) {
        val key = (sorted(i), sorted(j))
        val (c, w) = scores(key)
        scores(key) = (c + 1, w + invw)
      }
    }
    scores.toSeq
      .filter { case (p, _) => !und.contains(p) }
      .map { case ((a, b), (c, w)) => (a, b, c, w) }
      .sortBy { case (a, b, _, w) => (-w, a, b) }
      .take(k)
  }

  /** Sequential peel reference: the same bounded-round k-core. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int,
                       maxRounds: Int): Map[Long, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    def degrees = (und.toSeq.map(_._1) ++ und.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val bad = degrees.filter(_._2 < k).keySet
      if (bad.isEmpty) done = true
      else und = und.filter { case (a, b) =>
        !bad.contains(a) && !bad.contains(b) }
      r += 1
    }
    degrees
  }

  test("k-core: peel matches the sequential reference (converged and " +
       "budget-capped), any partitioning; a k above the max degree " +
       "empties the graph; every survivor has >= k neighbors at the " +
       "fixpoint") {
    import spark.implicits._
    // cutoff 65536 takes the driver fast path, cutoff 0 forces the
    // distributed rounds — both must match the sequential reference
    // (the fast path's bit-parity contract)
    def run(edges: Seq[(Long, Long)], k: Int, rounds: Int, parts: Int,
            cutoff: Int): Map[Long, Long] =
      Graph.kCore(edges.toDF("src", "dst").repartition(parts),
          "src", "dst", k, rounds, localCutoff = cutoff)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a 5-clique with a pendant chain hanging off it: the chain peels
    // one link per round under k=2, so a small budget leaves part of
    // it — exercising the budget-capped (non-converged) contract too
    val clique = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val chain = (0 until 6).map(i => (4L + i, 5L + i))
    val g = clique ++ chain
    for ((k, rounds) <- Seq((2, 8), (2, 2), (4, 8), (3, 1));
         cutoff <- Seq(65536, 0)) {
      val got = run(g, k, rounds, parts = 5, cutoff)
      assert(got == refKCore(g, k, rounds),
        s"k=$k rounds=$rounds cutoff=$cutoff")
    }
    // converged k=4: only the clique survives, all degrees 4
    assert(run(g, 4, 8, 3, 65536) == (0L until 5L).map(_ -> 4L).toMap)
    // k above max degree: empty result on BOTH paths
    assert(run(g, 6, 8, 3, 65536).isEmpty)
    assert(run(g, 6, 8, 3, 0).isEmpty)
    // the ring-stride graph from the other suites, both paths
    val n = 150L
    val rs = for {
      i <- 0L until n
      j <- 1 to 3
    } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
        .take(2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (i, (i + 1 + (h % (n - 1))) % n)
    }
    val expected = refKCore(rs, 4, 8)
    assert(run(rs, 4, 8, 7, 65536) == expected)
    assert(run(rs, 4, 8, 7, 0) == expected)
  }

  /** Sequential bounded-round truss reference: per round, per-edge
    * triangle support over the live simple graph, drop < k−2.
    */
  private def refKTruss(edges: Seq[(Long, Long)], k: Int,
                        maxRounds: Int): Map[(Long, Long), Long] = {
    def support(und: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = (und.toSeq ++ und.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      und.toSeq.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong
      }.toMap
    }
    var und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val keep = support(und).filter(_._2 >= (k - 2)).keySet
      if (keep == und) done = true
      und = keep
      r += 1
    }
    support(und)
  }

  test("k-truss: bounded-round edge peel matches the sequential " +
       "reference on the circulant graph (converged and capped), any " +
       "partitioning; a clique is its own truss; triangle-free graphs " +
       "empty at k=3") {
    import spark.implicits._
    // cutoff 0 forces the distributed rounds, where inc toggles the
    // adaptive delta support-maintenance vs per-round full
    // re-enumeration; the big cutoff takes the driver fast path.
    // All three must match the sequential reference bit for bit.
    def run(edges: Seq[(Long, Long)], k: Int, rounds: Int, parts: Int,
            inc: Boolean, cutoff: Int): Map[(Long, Long), Long] =
      Graph.kTruss(edges.toDF("src", "dst").repartition(parts),
          "src", "dst", k, rounds, incremental = inc,
          localCutoff = cutoff)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // circulant C_30(1..4): stride-4 edges have support 3 and peel
    // first at k=6; the cascade re-evaluates the rest — and shared
    // dead triangles between simultaneously-dropped edges exercise
    // the per-triangle (not per-dropped-edge) debit dedup
    val n = 30L
    val circ = for (i <- 0L until n; j <- 1L to 4L)
      yield (i, (i + j) % n)
    for ((k, rounds) <- Seq((6, 3), (6, 1), (5, 3), (7, 4));
         (inc, cutoff) <- Seq((true, 0), (false, 0), (true, 65536))) {
      val got = run(circ, k, rounds, parts = 5, inc, cutoff)
      assert(got == refKTruss(circ, k, rounds),
        s"k=$k rounds=$rounds inc=$inc cutoff=$cutoff")
    }
    // K5 at k=5: every edge closes 3 triangles — survives whole
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    assert(run(k5, 5, 3, 3, inc = true, cutoff = 65536) ==
      k5.map(e => e -> 3L).toMap)
    // a triangle-free star empties even at the weakest truss
    val star = (1L to 6L).map(i => (0L, i))
    assert(run(star, 3, 2, 3, inc = true, cutoff = 65536).isEmpty)
    assert(run(star, 3, 2, 3, inc = true, cutoff = 0).isEmpty)
    // planted-signal mixture (the registry demo's shape): circulant
    // noise + a spread K6 (members 0,7,...,35 — entangled with the
    // ring's wrap-around, so supports interact non-trivially) — the
    // bounded peel must still match the reference exactly on ALL
    // paths. The SPARSE drop rounds of this cascade engage the
    // adaptive delta (4|D| <= survivors), with overlapping dead
    // triangles — the decrementSupport fixture that matters.
    val k6 = for (t1 <- 0L until 6L; t2 <- (t1 + 1) until 6L)
      yield (t1 * 7, t2 * 7)
    val mixed = circ ++ k6
    val expectMixed = refKTruss(mixed, 6, 4)
    assert(run(mixed, 6, 4, 5, inc = true, cutoff = 0) == expectMixed)
    assert(run(mixed, 6, 4, 5, inc = false, cutoff = 0) == expectMixed)
    assert(run(mixed, 6, 4, 5, inc = true, cutoff = 65536)
      == expectMixed)
    // guaranteed-sparse drop round (4|D| <= survivors), so the
    // adaptive rule MUST route through decrementSupport: K7 (21
    // edges, support 5) + pendant vertex 100 adjacent to 0 and 1.
    // Round 1 at k=5 drops exactly (0,100) and (1,100) — |D|=2 vs
    // c=21 — and their ONE shared dead triangle (0,1,100) must debit
    // surviving edge (0,1) once (6 -> 5), not twice: the
    // per-triangle dedup, on the delta path, distributed.
    val pendant = (for (i <- 0L until 7L; j <- (i + 1) until 7L)
      yield (i, j)) ++ Seq((0L, 100L), (1L, 100L))
    val expectPendant = refKTruss(pendant, 5, 4)
    assert(expectPendant((0L, 1L)) == 5L, "fixture sanity")
    assert(run(pendant, 5, 4, 3, inc = true, cutoff = 0)
      == expectPendant)
    assert(run(pendant, 5, 4, 3, inc = false, cutoff = 0)
      == expectPendant)
  }

  test("link candidates: match the brute-force reference on the " +
       "ring-stride graph; never include an existing edge; hub " +
       "centers above the cap certify nothing") {
    import spark.implicits._
    val n = 80L
    val edges = (for {
      i <- 0L until n
      j <- 1 to 3
    } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
        .take(2).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      (i, (i + 1 + (h % (n - 1))) % n)
    }) ++ (1L until 40L).map(i => (0L, i)) // vertex 0 becomes a hub
    def run(maxDeg: Int): Seq[(Long, Long, Long, Long)] =
      Graph.linkCandidates(edges.toDF("src", "dst").repartition(5),
          "src", "dst", maxCenterDegree = maxDeg, k = 30)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet
    for (cap <- Seq(8, 64)) {
      val got = run(cap)
      assert(got == refLinkCandidates(edges, cap, 30), s"cap=$cap")
      assert(got.forall { case (a, b, _, _) => !und.contains((a, b)) })
    }
    // the hub (degree ~40) is a center at cap 64 but not at cap 8 —
    // the candidate sets must genuinely differ
    assert(run(8) != run(64))
  }

  test("triangles: ids outside [0, 2^31) are rejected before the " +
       "order-key arithmetic can wrap") {
    val bad = Seq((1L << 32, 1L), (1L, 2L))
    val ex = intercept[Exception](runTriangles(bad))
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(msgs.contains("2^31"), s"got: $msgs")
  }

  test("withExpansionSizedShuffles is session-isolated (VERDICT r14 #3): " +
       "the scope plans in a child session carrying the 8m advisory " +
       "while the parent — what a concurrent query would plan under — " +
       "keeps the default; results come back on the parent session") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val initialKey =
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val parentAdvisoryBefore = spark.conf.get(advisoryKey)
    assert(parentAdvisoryBefore != "8m",
      "sanity: the test needs a parent default distinct from the scope")
    val root = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    var sawChild: org.apache.spark.sql.SparkSession = null
    val out = graft.extensions.Graph.withExpansionSizedShuffles(
        root, engage = true) { r =>
      sawChild = r.sparkSession
      // the scope's own planning sees the expansion sizing...
      assert(r.sparkSession ne spark)
      assert(r.sparkSession.conf.get(advisoryKey) == "8m")
      assert(r.sparkSession.conf.get(initialKey) == "256")
      // ...while a query planned on the PARENT during the scope sees
      // the untouched default — the concurrent-driver guarantee
      assert(spark.conf.get(advisoryKey) == parentAdvisoryBefore)
      assert(spark.conf.getOption(initialKey).forall(_ != "256"))
      // and the child inherits the parent's other runtime confs
      assert(r.sparkSession.conf.get("spark.sql.shuffle.partitions")
        == spark.conf.get("spark.sql.shuffle.partitions"))
      r.groupBy("a").agg(count(lit(1)).as("n")).localCheckpoint(true)
    }
    assert(out.sparkSession eq spark,
      "results must come back rebased onto the parent session")
    assert(spark.conf.get(advisoryKey) == parentAdvisoryBefore)
    assert(out.orderBy("a").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (2L, 1L)))
    // the child is memoized: a second scoped call reuses it
    graft.extensions.Graph.withExpansionSizedShuffles(
        root, engage = true) { r =>
      assert(r.sparkSession eq sawChild)
      r.localCheckpoint(true)
    }
    // engage = false stays entirely on the parent
    graft.extensions.Graph.withExpansionSizedShuffles(
        root, engage = false) { r =>
      assert(r.sparkSession eq spark); r
    }
  }

  test("withExpansionSizedShuffles rejects a body returning live " +
       "lineage (ADVICE r14 #2): un-materialized results would " +
       "re-plan under default shuffle sizing outside the scope") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = Seq((1L, 2L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      graft.extensions.Graph.withExpansionSizedShuffles(
        root, engage = true)(r => r.groupBy("a").count())
    }
    assert(ex.getMessage.contains("materialized"))
  }
}
