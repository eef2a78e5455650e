package graft

import org.apache.spark.sql.functions._

/** Order-of-magnitude scale smoke: the near-dup pipeline on a synthetic
  * corpus 4× the sf0.1 documents table (20k docs, 40 tokens each, 1000
  * planted near-dup pairs). Guards the SCALE.md claims with numbers:
  * candidate volume stays bucket-bounded (no quadratic blow-up), recall
  * on planted pairs stays ~1, and the whole pass completes in one test
  * JVM at local[4] — the shape that scales is the shape that runs here.
  */
class ScaleStressSpec extends SparkTestBase {

  test("connected components on a planted 1,000-hop PATH graph — the " +
       "adversarial-diameter case — converges inside the default budget " +
       "(phase-2 large-star/small-star: O(log² n) rounds, any diameter)") {
    import spark.implicits._
    // worst case for plain min-propagation (needs ~1000 rounds); ids
    // permuted by a multiplicative shuffle so the min sits mid-path and
    // labels can't ride a monotone id layout to an easy win
    val n = 1000
    def perm(i: Int): Long = ((i.toLong * 571 + 13) % (n + 1))
    val edges = (0 until n).map(i => (perm(i), perm(i + 1)))
      .toDF("id_a", "id_b")
    val comps = graft.extensions.Components
      .connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(comps.length == n + 1)
    // one component, labeled by the global min vertex id
    assert(comps.map(_._2).distinct.toSeq == Seq(0L),
      s"path graph split into ${comps.map(_._2).distinct.length} labels " +
        "— propagation did not converge")
  }

  test("minhash near-dup pipeline on 20k synthetic docs: planted pairs " +
       "found, candidate volume bucket-bounded") {
    val nBase = 19000L
    val nCopies = 1000L
    // doc k's text: 40 PSEUDO-RANDOM tokens from a 100k vocabulary
    // (murmur3 of k and position — consecutive-valued tokens would give
    // the corpus a tiny shared shingle pool and near-dup EVERYTHING);
    // docs >= nBase copy doc (id - nBase) and append one extra token ->
    // near-dup, not exact-dup
    val docs = spark.range(0, nBase + nCopies).toDF("doc_id")
      .withColumn("k",
        when(col("doc_id") >= nBase, col("doc_id") - nBase)
          .otherwise(col("doc_id")))
      .withColumn("text",
        concat_ws(" ",
          transform(sequence(lit(0L), lit(39L)),
            j => concat(lit("w"),
              pmod(hash(col("k") * 997L + j * 131L), lit(99991))))))
      .withColumn("text",
        when(col("doc_id") >= nBase, concat(col("text"), lit(" extra")))
          .otherwise(col("text")))
      .select("doc_id", "text")

    val cands = graft.extensions.TextDedup
      .minhashCandidates(docs, "doc_id", "text")
    val nCands = cands.count()
    // 1000 planted near-identical pairs + md5-collision strays; a
    // quadratic bucket blow-up would be millions
    assert(nCands < 50000L, s"candidate volume blew up: $nCands")

    val pairs = graft.extensions.TextDedup
      .jaccardVerified(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = pairs.count { case (a, b) => b - a == nBase }
    // 39/41 shared shingles -> jaccard ~0.93; expected LSH misses at
    // (1 - 0.93^2)^4 per pair ~ 4e-4 -> a handful out of 1000
    assert(planted >= 990L,
      s"recall collapsed: only $planted of $nCopies planted pairs")
    // verification must kill sub-threshold strays: every surviving pair
    // at jaccard >= 0.5 with 500-vocab random text is a planted pair or
    // an exact k-collision (none by construction below 19000*7 period)
    assert(pairs.length.toLong <= nCopies + 10,
      s"false near-dups survived verification: ${pairs.length}")
  }

  test("span dedup on 20k synthetic docs: planted shared prefix flagged " +
       "corpus-wide, span volume linear in tokens") {
    val n = 20000L
    // every doc: a SHARED 10-token boilerplate prefix (the license-header
    // scenario) + 30 pseudo-random tokens of its own
    val docs = spark.range(0, n).toDF("doc_id")
      .withColumn("own",
        concat_ws(" ",
          transform(sequence(lit(0L), lit(29L)),
            j => concat(lit("w"),
              pmod(hash(col("doc_id") * 997L + j * 131L), lit(99991))))))
      .withColumn("text",
        concat(lit((1 to 10).map(i => s"hdr$i").mkString(" ")),
               lit(" "), col("own")))
      .select("doc_id", "text")
    val stats = graft.extensions.TextDedup.spanStats(docs, "doc_id", "text",
        w = 8)
      .agg(sum(col("n_spans")), sum(col("n_dup_spans")),
           min(col("n_dup_spans")))
      .collect().head
    // 40 tokens → 33 windows per doc, linear total
    assert(stats.getLong(0) == n * 33)
    // the 3 windows fully inside the 10-token header duplicate in EVERY
    // doc; windows straddling into unique tokens must not
    assert(stats.getLong(2) >= 3,
      s"every doc shares the header spans, min was ${stats.getLong(2)}")
    assert(stats.getLong(1) >= n * 3)
    assert(stats.getLong(1) < n * 6,
      s"random-token spans should not collide: ${stats.getLong(1)}")
  }

  test("hash ring lookup at 50k docs / 5k probes: every probe resolves, " +
       "spot-checked against brute force") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val nDocs = 50000L
    val docs = spark.range(0, nDocs).toDF("doc_id")
    val probes = spark.range(0, 5000).toDF("pid")
      .withColumn("h", md5(concat(col("pid").cast("string"), lit(":q"))))
    val got = graft.ops.Joins.hashRingLookup(probes, "h", docs,
        "doc_id", "pick")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == 5000)
    // brute force a sample of probes against the full ring
    val ring = (0L until nDocs).map(id => md5hex(id.toString) -> id)
      .sortBy(identity)
    (0 until 5000 by 250).foreach { p =>
      val h = md5hex(s"$p:q")
      val expect = ring.find(_._1 >= h).getOrElse(ring.head)._2
      assert(got(p.toLong) == expect, s"probe $p: ${got(p.toLong)} != $expect")
    }
  }

  test("dictionary NER on 20k docs x 10k-term dictionary: exact recall " +
       "on planted terms, zero false positives") {
    val docs = ScaleCurve.nerCorpus(spark, 20000L, 10000)
    val (nodes, clusters) = ScaleCurve.nerDictionary(spark, 10000)
    val got = new graft.ner.DictionaryNer(nodes, clusters)
      .textToKg2Nodes(docs, "doc_id", "text")
      .select(col("doc_key").cast("long"), col("curie"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // every doc matches exactly its one planted term — nothing else in
    // the ~120-n-gram/doc candidate stream may hit the dictionary
    assert(got.length == 20000, s"expected 20000 matches, got ${got.length}")
    got.foreach { case (id, curie) =>
      assert(curie == s"T:${id % 10000}", s"doc $id matched $curie")
    }
  }

  test("IVF-PQ search on 5k vectors: probes bounded, ADC ranks the " +
       "planted twin first") {
    import spark.implicits._
    import graft.extensions.{Ivf, Pq}
    val rng = new scala.util.Random(41)
    val base = (0 until 5000).map(i =>
      (i.toLong, Array.fill(32)(rng.nextGaussian().toFloat)))
    // vec 4999 ≈ vec 0 (planted twin)
    val twin = (4999L, base.head._2.map(v => v * 1.0005f))
    val vecs = (base.dropRight(1) :+ twin).toDF("vec_id", "embedding")
    val ivf = Ivf.trainDeterministic(vecs, "vec_id", "embedding", k = 16)
    val pq = Pq.trainDeterministic(vecs, "vec_id", "embedding",
      m = 4, nCodes = 16)
    val got = Pq.searchIvfPq(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", ivf, pq, nProbe = 16, topK = 1)
      .collect()
    // full probe: the twin encodes to the same codes as vec 0, so its
    // ADC distance is the self-distance minimum
    assert(got.head.getLong(1) == 4999L,
      s"expected planted twin, got ${got.head}")
  }
}
