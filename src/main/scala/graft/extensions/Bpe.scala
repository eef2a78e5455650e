package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** BPE vocabulary-induction primitives — the tokenizer-TRAINING side of
  * the token family (TextAnalysis.subwordCount et al. apply a
  * tokenizer; these learn one). Byte-pair encoding's inner loop is
  * pure corpus aggregation — count adjacent symbol pairs, fuse the
  * most frequent, repeat — which makes it a natural Spark job and a
  * real 100 TB workload: production tokenizers are trained on corpus
  * samples precisely because single-node trainers can't hold the pair
  * counts of a full crawl.
  *
  * Representation: words are lowercase alphabetic runs (`[a-z]+`,
  * length ≥ 2 — a 1-char word has no pair); merge round r fuses the
  * winning pair into the single UPPERCASE placeholder symbol
  * ('A' + r − 1), which keeps every symbol exactly one char. That
  * single-char invariant is what makes the whole induction exact and
  * oracle-checkable on any engine: pair i of a word is plainly
  * `substr(w, i, 2)`, and applying a merge is plain non-overlapping
  * left-to-right string `replace` — no token-array bookkeeping, no
  * engine-specific tokenizer state, identical semantics in Spark and
  * DuckDB. (Real BPE emits multi-char tokens; the placeholder
  * alphabet is a bijection away and caps rounds at 26, far above a
  * demonstration's needs — a production run would switch the symbol
  * domain to ints, same plan shape.)
  *
  * Scale shape per round: ONE map-side-combined pair count (the only
  * shuffle — pairs live in a ≤(26+rounds)² key space, so the exchange
  * carries at most a few thousand rows regardless of corpus size), an
  * argmax over that tiny aggregate, and a broadcast 1-row crossJoin
  * feeding a map-side replace. The corpus is re-read once per round —
  * inherent to BPE (each merge changes the pair statistics) — and
  * each round's representation persists until the final merge-table
  * materialization, then everything unpersists (in finally).
  */
object Bpe {

  /** Lowercase alphabetic words of length ≥ 2, one row per occurrence
    * (BPE counts pairs by corpus frequency, not per distinct word).
    */
  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)

  private def pairsOf(wordsDf: DataFrame): DataFrame =
    // the length guard matters from round 2 on: a merge can shrink a
    // word to ONE symbol ("an" -> "A"), and Spark's sequence(1, 0) is
    // the DESCENDING [1, 0] — not the empty range DuckDB's
    // range(1, 1) gives — which would emit two garbage pairs per
    // collapsed word
    wordsDf.filter(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))

  /** Adjacent symbol-pair counts over the corpus — BPE's inner-loop
    * aggregate, exposed on its own because it is also the cheapest
    * character-level corpus statistic (OCR garbage and wrong-language
    * slices surface as improbable pair mass). One explode + one
    * map-side-combined count; output keyed by (cnt desc, pair) is a
    * total order, so the frame is deterministic end to end.
    *
    * @return (pair, cnt), all pairs
    */
  def charPairCounts(docs: DataFrame, textCol: String): DataFrame =
    charPairCountsOf(words(docs, textCol))

  /** The BPE merge table: `rounds` iterations of count-argmax-fuse,
    * returning one row per round — (round, pair, cnt) where `pair` is
    * the fused symbol pair and `cnt` its corpus frequency at fuse
    * time. This IS the artifact tokenizer training produces (the
    * ordered merge list); ties break lexicographically smallest pair
    * so the induction is reproducible on any cluster layout.
    *
    * The round-r corpus feeds two consumers (its pair count and the
    * next round's replace), so each representation persists until the
    * single merge-table materialization — the
    * cache-until-one-materialization stance (see Graph.walkLoop), with
    * unpersist in finally.
    */
  def mergeTable(docs: DataFrame, textCol: String,
                 rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 26,
      "placeholder symbols are 'A'..'Z' — one merge each")
    val kept = scala.collection.mutable.Buffer.empty[DataFrame]
    try {
      var corpus = words(docs, textCol)
        .persist(StorageLevel.MEMORY_AND_DISK)
      kept += corpus
      var outs = List.empty[DataFrame]
      for (r <- 1 to rounds) {
        val top = charPairCountsOf(corpus)
          .orderBy(col("cnt").desc, col("pair").asc).limit(1)
          .persist(StorageLevel.MEMORY_AND_DISK)
        kept += top
        outs ::= top.select(lit(r).as("round"), col("pair"), col("cnt"))
        if (r < rounds) {
          // fuse the winner into this round's placeholder: plain
          // non-overlapping left-to-right replace, the exact BPE
          // application order ("aaa" under pair "aa" -> "Za")
          corpus = corpus
            .crossJoin(broadcast(top.select(col("pair").as("mp"))))
            .select(expr(s"replace(w, mp, '${('A' + r - 1).toChar}')")
              .as("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          kept += corpus
        }
      }
      outs.reduce(_.union(_)).orderBy("round").localCheckpoint(true)
    } finally kept.foreach(_.unpersist(false))
  }

  private def charPairCountsOf(wordsDf: DataFrame): DataFrame =
    pairsOf(wordsDf).groupBy("pair").agg(count(lit(1)).as("cnt"))

  /** The trained merge list as driver state — (round, pair, cnt)
    * ascending by round, exactly [[mergeTable]]'s rows. Bounded collect
    * (≤ rounds ≤ 26 rows — the same offline-artifact stance as
    * Kmeans.lloyd's k·d collect). A corpus can run OUT of fusable
    * pairs before `rounds` (every word already a single symbol): that
    * round has no winner and simply emits no row, so consumers apply
    * only the merges that exist — no NULL placeholder ever enters the
    * encode (the silent-NULL hazard the earlier broadcast-row pivot
    * had).
    */
  def collectMerges(docs: DataFrame, textCol: String,
                    rounds: Int): Seq[(Int, String, Long)] =
    mergeTable(docs, textCol, rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  /** ENCODE with a learned merge list — the other half of the BPE
    * contract ([[mergeTable]] trains; this applies). Per document:
    * extract the word stream (lowercase alphabetic runs, length ≥ 1 —
    * the encoder also sees the 1-char words the trainer skips, a merge
    * can never match them), apply the merges in training order (each
    * is one non-overlapping left-to-right replace under the
    * single-char placeholder alphabet), and report the token economics
    * tokenizer evaluation runs on: word count, symbol count before
    * (= characters) and after, and the compression ratio — ONE double
    * division of two exact longs, engine-reproducible.
    *
    * Docs with no alphabetic words have no measurable compression and
    * drop out (mirrors the SQL unnest of an empty word list).
    *
    * Scale shape: the merges are literals in the plan (the learned
    * artifact moves to the data, never the reverse), so the encode is
    * a single map-side pass — per-row array transforms with no
    * explode, no join, no shuffle: the plan a 100 TB tokenization job
    * wants.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(Int, String, Long)]): DataFrame = {
    require(merges.forall { case (r, _, _) => r >= 1 && r <= 26 },
      "placeholder symbols are 'A'..'Z' — one merge each")
    require(merges.map(_._1) == merges.map(_._1).sorted,
      "merges must be in training (round) order")
    val ws = filter(split(lower(col(textCol)), "[^a-z]+"),
      w => length(w) >= 1)
    val encoded = transform(col("ws"), w =>
      merges.foldLeft(w) { case (acc, (r, pair, _)) =>
        replace(acc, lit(pair), lit(('A' + r - 1).toChar.toString))
      })
    val sumLen = (c: Column) =>
      aggregate(c, lit(0L), (a, w) => a + length(w).cast("long"))
    docs.select(col(idCol).as("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        sumLen(col("ws")).as("n_chars"),
        sumLen(encoded).as("n_syms"))
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_syms"),
        (col("n_syms").cast("double") / col("n_chars").cast("double"))
          .as("compression"))
  }

  /** Train-then-encode convenience: [[collectMerges]] + [[encodeStats]]
    * in one call (tests and one-shot callers; the demo registry trains
    * once per corpus and shares the artifact).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  rounds: Int): DataFrame =
    encodeStats(docs, idCol, textCol, collectMerges(docs, textCol, rounds))

  // ------------------------------------------------------------------
  // INT-SYMBOL domain (VERDICT r15 #3) — BPE past the 26-merge
  // placeholder-alphabet ceiling. Symbols are ints: base ids 0..25
  // ('a'..'z'), merge round r mints id 26+r−1, merges are
  // (round, a, b, new_id, cnt) rows — the real tokenizer-artifact
  // shape, unbounded in rounds and multi-char in effect.
  //
  // The trainer also switches to the production formulation: ONE
  // corpus-scale aggregation builds the distinct-WORD frequency table
  // (pair statistics are a pure function of word-type counts — the
  // HuggingFace/SentencePiece trainer shape), and every merge round
  // runs over that bounded table. Against the string-domain
  // mergeTable (which re-reads the corpus per round) this makes
  // per-round cost INDEPENDENT of corpus size: grow the corpus 100×
  // and only the one-time frequency aggregation grows — the property
  // that makes 1000-round training on a 100 TB crawl a plan, not a
  // wish (SCALECURVE §13 measures it).
  //
  // Per round: one pair-explode + map-side-combined count over the
  // word table (shuffle keyed by the live pair space), one argmax
  // (TakeOrdered, 1 row to the driver), zero corpus reads. The
  // round-r representation is recomputed from the BASE table by one
  // native BpeApplyMerges call over the r−1 learned merges — plan
  // depth stays constant (no 100-deep lineage chain), and the apply
  // cost (len·r per word type) is noise next to the job itself.
  // ------------------------------------------------------------------

  /** The distinct-word frequency table in id space:
    * (w array&lt;int&gt;, cnt) — one corpus aggregation, then training
    * never touches the corpus again. Training-side words only
    * (length ≥ 2; a 1-symbol word has no pair and never will).
    */
  def wordFreqIds(docs: DataFrame, textCol: String): DataFrame =
    words(docs, textCol)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(wordIds(col("w")).as("w"), col("cnt"))

  /** Lowercase word → its base symbol ids (0..25 = 'a'..'z'). */
  private def wordIds(w: Column): Column =
    transform(sequence(lit(1), length(w)),
      i => ascii(w.substr(i, lit(1))) - 97)

  /** Train `rounds` id-domain merges: (round, a, b, cnt) in training
    * order, new_id = 26 + round − 1 by construction (rounds are
    * contiguous — training stops at the first round with no fusable
    * pair, so consumers derive the minted id from the round). Ties
    * break to the numerically smallest (a, b). Bounded driver state:
    * one merge row per round.
    */
  def collectMergesIds(docs: DataFrame, textCol: String,
                       rounds: Int): Seq[(Int, Int, Int, Long)] =
    collectMergesIdsFrom(wordFreqIds(docs, textCol), rounds)

  /** [[collectMergesIds]] over a PREBUILT word-frequency table
    * (w array&lt;int&gt;, cnt) — the one-time corpus aggregation and the
    * bounded training rounds are separate costs (SCALECURVE §13 times
    * them apart; a production trainer lands the frequency table as an
    * artifact and trains many tokenizers off it). */
  def collectMergesIdsFrom(wordFreqs: DataFrame,
                           rounds: Int): Seq[(Int, Int, Int, Long)] = {
    require(rounds >= 1, "rounds must be >= 1")
    // a caller-persisted table stays caller-owned (repeat trainings off
    // one landed frequency artifact must not lose each other's cache)
    val callerOwned =
      wordFreqs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val wf =
      if (callerOwned) wordFreqs
      else wordFreqs.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges =
        scala.collection.mutable.Buffer.empty[(Int, Int, Int, Long)]
      var done = false
      for (r <- 1 to rounds if !done) {
        val applied =
          if (merges.isEmpty) col("w")
          else graft.functions.BpeApplyMerges(col("w"),
            merges.toSeq.map { case (rr, a, b, _) => (a, b, 26 + rr - 1) })
        val top = wf.select(applied.as("w"), col("cnt"))
          // merges can shrink a word to ONE symbol; and Spark's
          // sequence(1, 0) is the DESCENDING [1, 0], not an empty
          // range — filter before building pair positions
          .filter(size(col("w")) >= 2)
          .select(explode(transform(
              sequence(lit(1), size(col("w")) - 1),
              i => struct(element_at(col("w"), i).as("a"),
                          element_at(col("w"), i + 1).as("b"))))
            .as("p"), col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (top.isEmpty) done = true
        else merges += ((r, top.head.getInt(0), top.head.getInt(1),
          top.head.getLong(2)))
      }
      merges.toSeq
    } finally {
      if (!callerOwned) wf.unpersist(false)
      ()
    }
  }

  /** VOCAB-SCALE id-domain training (VERDICT r17 #1): bit-equal to
    * [[collectMergesIds]], with per-merge cost that is a few HASH-MAP
    * updates instead of a Spark job. [[collectMergesIdsFrom]] runs one
    * job per round and re-applies the whole merge table every round —
    * per-round cost is corpus-independent (good) but a REAL tokenizer
    * vocabulary (32k–50k merges) would be tens of thousands of
    * sequential driver round-trips doing O(r²) total merge
    * application: unreachable. This trainer is the architecture
    * production tokenizers (HuggingFace, SentencePiece) actually use,
    * split at the sufficient statistic:
    *
    *  - DISTRIBUTED: the corpus collapses to the distinct-WORD
    *    frequency table in ONE aggregation ([[wordFreqIds]]) — the
    *    only data-sized cost, and the only part that grows with
    *    100 TB. Pair statistics are a pure function of word-type
    *    counts, so this table is the complete training input.
    *  - DRIVER: the classic incremental Sennrich loop over that
    *    bounded artifact — pair counts + a (cnt desc, a, b) ordered
    *    set + a pair→words inverted index, and each round applies the
    *    winning merge ONLY to the words that contain it, delta-
    *    updating the counts it touched. Zero Spark jobs per round,
    *    O(affected words · len) work per merge: 32k merges run in
    *    seconds (SCALECURVE §13b measures it).
    *
    * The collect is the same offline-artifact stance as
    * [[collectMergesIds]]'s per-round 1-row collect, but the table is
    * data-dependent — so it FAILS FAST over `maxWordTypes` (the knob a
    * caller raises deliberately, with the driver heap to back it;
    * ~10M types ≈ low-GB driver footprint). A 100 TB crawl whose
    * distinct-word table exceeds that is exactly the corpus where
    * production trainers cut the tail (min-frequency / top-N word
    * types) — that cut changes counts, so it is the CALLER's explicit
    * pre-filter on the frequency table, never a silent default here;
    * [[collectMergesIdsFrom]] remains the unbounded-table fallback.
    *
    * Semantics replicated exactly: pair counts are positional
    * (overlaps counted — "aaa" holds (a,a) twice), application is
    * left-to-right non-overlapping ("aaa" → [new, a]), ties break to
    * the numerically smallest (a, b), training stops at the first
    * round with no fusable pair. BpeSpec pins bit-equality against
    * [[collectMergesIds]] on fixture and synthetic corpora; the
    * `bpe_merges_fast` demo pins it against the independent DuckDB
    * replay of the SEQUENTIAL induction.
    */
  def collectMergesIdsFast(docs: DataFrame, textCol: String, rounds: Int,
                           maxWordTypes: Long = defaultMaxWordTypes)
      : Seq[(Int, Int, Int, Long)] =
    collectMergesIdsFastFrom(wordFreqIds(docs, textCol), rounds,
      maxWordTypes)

  /** [[collectMergesIdsFast]] over a PREBUILT word-frequency table
    * (w array&lt;int&gt;, cnt) — mirrors [[collectMergesIdsFrom]]. */
  def collectMergesIdsFastFrom(wordFreqs: DataFrame, rounds: Int,
                               maxWordTypes: Long = defaultMaxWordTypes)
      : Seq[(Int, Int, Int, Long)] = {
    require(rounds >= 1, "rounds must be >= 1")
    // fail-fast WITHOUT a separate count() job: a bounded limit-probe
    // collects at most maxWordTypes+1 rows — over the bound it aborts
    // having read one row past it, under the bound those rows ARE the
    // training input, so the only data-sized aggregation runs ONCE
    // (the old count()+collect() pair recomputed it twice; r18 advice)
    require(maxWordTypes < Int.MaxValue,
      s"maxWordTypes must be < Int.MaxValue, got $maxWordTypes")
    val probe = wordFreqs.select(col("w"), col("cnt"))
      .limit(maxWordTypes.toInt + 1).collect()
    require(probe.length <= maxWordTypes,
      s"word-frequency table has > maxWordTypes " +
        s"$maxWordTypes types — raise the bound deliberately (driver-heap " +
        "cost) or pre-filter the frequency table (min-frequency / " +
        "top-N cut), or fall back to collectMergesIdsFrom")
    val rows = probe
    val syms = rows.map(_.getSeq[Int](0).toArray)
    val cnts = rows.map(_.getLong(1))
    trainIncremental(syms, cnts, rounds)
  }

  /** The driver-side incremental Sennrich loop (exact; see
    * [[collectMergesIdsFast]]). `syms` is mutated in place. Pairs are
    * Long-encoded (a&lt;&lt;32 | b) end to end and count changes are
    * BATCHED per round — the ordered set sees one net update per
    * touched pair per round, not one per occurrence (the difference
    * between a ~2 s and a ~30 s init over a 200k-type table). */
  private def trainIncremental(syms: Array[Array[Int]],
                               cnts: Array[Long],
                               rounds: Int): Seq[(Int, Int, Int, Long)] = {
    import scala.collection.mutable
    def enc(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    val pairCnt = mutable.LongMap.empty[Long]
    val byWord = mutable.LongMap.empty[mutable.Set[Int]]
    // (cnt desc, a asc, b asc) — the argmax order of the sequential
    // trainer's orderBy; head is the round winner (a, b nonneg, so
    // the encoded-key ascending order IS (a asc, b asc))
    val order = mutable.TreeSet.empty[(Long, Long)](
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
    var i = 0
    while (i < syms.length) {
      val w = syms(i); val c = cnts(i)
      var j = 0
      while (j < w.length - 1) {
        val k = enc(w(j), w(j + 1))
        pairCnt(k) = pairCnt.getOrElse(k, 0L) + c
        byWord.getOrElseUpdate(k, mutable.Set.empty) += i
        j += 1
      }
      i += 1
    }
    pairCnt.foreachEntry((k, c) => { order.add((c, k)); () })
    def applyOne(w: Array[Int], a: Int, b: Int, nid: Int): Array[Int] = {
      val out = Array.newBuilder[Int]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
          out += nid; i += 2
        } else { out += w(i); i += 1 }
      }
      out.result()
    }
    val merges = mutable.Buffer.empty[(Int, Int, Int, Long)]
    var r = 1
    while (r <= rounds && order.nonEmpty) {
      val (c, key) = order.head
      val a = (key >>> 32).toInt; val b = key.toInt
      merges += ((r, a, b, c))
      val nid = 26 + r - 1
      val affected = byWord.getOrElse(key, mutable.Set.empty).toArray
      val delta = mutable.LongMap.empty[Long]
      affected.foreach { i =>
        val before = syms(i)
        val after = applyOne(before, a, b, nid)
        syms(i) = after
        // exact delta: retract the word's old pair multiset, add the
        // new one (both weighted by the word-type count), and keep
        // the inverted index in step on the DISTINCT pair sets
        val od = mutable.Set.empty[Long]
        val nd = mutable.Set.empty[Long]
        var j = 0
        while (j < before.length - 1) {
          val k = enc(before(j), before(j + 1))
          delta(k) = delta.getOrElse(k, 0L) - cnts(i); od += k
          j += 1
        }
        j = 0
        while (j < after.length - 1) {
          val k = enc(after(j), after(j + 1))
          delta(k) = delta.getOrElse(k, 0L) + cnts(i); nd += k
          j += 1
        }
        (od diff nd).foreach(k => byWord.get(k).foreach(_ -= i))
        (nd diff od).foreach(k =>
          byWord.getOrElseUpdate(k, mutable.Set.empty) += i)
      }
      delta.foreachEntry { (k, d) =>
        if (d != 0L) {
          val old = pairCnt.getOrElse(k, 0L)
          if (old != 0L) order.remove((old, k))
          val nu = old + d
          if (nu == 0L) pairCnt.remove(k)
          else { pairCnt(k) = nu; order.add((nu, k)) }
          ()
        }
      }
      r += 1
    }
    merges.toSeq
  }

  /** [[collectMergesIdsFast]]'s default word-type ceiling — ~low-GB
    * driver footprint; raise deliberately or pre-filter past it. */
  val defaultMaxWordTypes: Long = 10000000L

  /** [[collectMergesIds]] as the merge-table frame —
    * (round, a, b, new_id, cnt), the id-domain training artifact. */
  def mergeTableIds(spark: org.apache.spark.sql.SparkSession,
                    merges: Seq[(Int, Int, Int, Long)]): DataFrame = {
    import spark.implicits._
    merges.map { case (r, a, b, cnt) => (r, a, b, 26 + r - 1, cnt) }
      .toDF("round", "a", "b", "new_id", "cnt")
  }

  /** The expanded VOCABULARY (VERDICT r16 #4) — the (id → token
    * string) artifact every downstream consumer reads (detokenizers
    * and trainers consume token maps, not merge tables): base ids
    * 0..25 are 'a'..'z' (round 0, cnt 0); merge round r mints id
    * 26+r−1 whose token is the concatenation of its parts' tokens —
    * the exact replay of the merge table, so the multi-char strings
    * are engine-reproducible. Pure bounded driver expansion (26 +
    * rounds entries — the same offline-artifact stance as
    * [[collectMergesIds]] itself).
    */
  def vocabOf(merges: Seq[(Int, Int, Int, Long)])
      : Seq[(Int, String, Int, Long)] = {
    require(merges.map(_._1) == (1 to merges.length),
      "merges must be the contiguous training rounds 1..n in order")
    val vocab = scala.collection.mutable.Map.empty[Int, String]
    (0 until 26).foreach(i => vocab(i) = ('a' + i).toChar.toString)
    val base = (0 until 26).map(i => (i, vocab(i), 0, 0L))
    val minted = merges.map { case (r, a, b, cnt) =>
      val id = 26 + r - 1
      val tok = vocab(a) + vocab(b)
      vocab(id) = tok
      (id, tok, r, cnt)
    }
    base ++ minted
  }

  /** [[vocabOf]] as a frame — (id, token, round, cnt), the landed
    * vocabulary artifact. */
  def vocabFrame(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(Int, Int, Int, Long)]): DataFrame = {
    import spark.implicits._
    vocabOf(merges).toDF("id", "token", "round", "cnt")
  }

  /** Per-WORD encode: one lowercase alphabetic word → its merged id
    * sequence, ALL merges applied in training order by one native
    * [[graft.functions.BpeApplyMerges]] call — the unit the round-trip
    * contract ([[decodeIds]]) runs on and the building block
    * [[encodeIdsStats]] maps over the word stream. */
  def encodeWord(w: Column, merges: Seq[(Int, Int, Int, Long)]): Column =
    graft.functions.BpeApplyMerges(wordIds(w),
      merges.map { case (r, a, b, _) => (a, b, 26 + r - 1) })

  /** DECODE (detokenize): a merged id sequence → the original string,
    * via the expanded vocabulary riding the plan as one map literal —
    * map-side, no shuffle. `decodeIds(encodeWord(w)) == w` for every
    * lowercase alphabetic word (the BpeSpec round-trip pin); an id
    * outside the vocabulary raises rather than silently vanishing
    * from the concatenation.
    */
  def decodeIds(ids: Column,
                merges: Seq[(Int, Int, Int, Long)]): Column = {
    val vocab = vocabOf(merges).map(v => v._1 -> v._2).toMap
    val tok = (i: Column) => {
      val t = element_at(typedLit(vocab), i)
      when(t.isNull, raise_error(concat(
        lit("Bpe.decodeIds: id outside the trained vocabulary: "),
        i.cast("string")))).otherwise(t)
    }
    array_join(transform(ids, tok), "")
  }

  /** ENCODE in the id domain: per document, the word stream (length
    * ≥ 1 — the encoder also sees the 1-symbol words the trainer
    * skips), ALL merges applied in training order by one native
    * [[graft.functions.BpeApplyMerges]] call per word, and the token
    * economics plus two exact-long fingerprints that pin the encoded
    * id SEQUENCE itself: `sum_ids` = Σ ids and `wsum_ids` =
    * Σ_words Σ_i i·id_i (i 1-based within its word) — a transposition
    * or mis-merge anywhere changes the weighted sum. Docs with no
    * alphabetic words drop (no measurable compression).
    *
    * Scale shape: the merge table rides the plan as ONE codegen
    * reference object (not 10k expression nodes), so the encode is a
    * single map-side pass — no explode, no join, no shuffle: the plan
    * a 100 TB tokenization job wants, at any merge count.
    */
  def encodeIdsStats(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(Int, Int, Int, Long)]): DataFrame = {
    require(merges.map(_._1) == (1 to merges.length),
      "merges must be the contiguous training rounds 1..n in order")
    val mseq = merges.map { case (r, a, b, _) => (a, b, 26 + r - 1) }
    val ws = filter(split(lower(col(textCol)), "[^a-z]+"),
      w => length(w) >= 1)
    val encoded = transform(col("ws"),
      w => graft.functions.BpeApplyMerges(wordIds(w), mseq))
    val sumLen = (c: Column) =>
      aggregate(c, lit(0L), (a, w) => a + length(w).cast("long"))
    docs.select(col(idCol).as("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        sumLen(col("ws")).as("n_chars"),
        encoded.as("enc"))
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        aggregate(col("enc"), lit(0L),
          (a, e) => a + size(e).cast("long")).as("n_syms"),
        aggregate(flatten(col("enc")), lit(0L),
          (a, x) => a + x.cast("long")).as("sum_ids"),
        aggregate(col("enc"), lit(0L), (acc, e) => acc +
          aggregate(zip_with(sequence(lit(1), size(e)), e,
              (i, x) => i.cast("long") * x.cast("long")),
            lit(0L), (a, y) => a + y)).as("wsum_ids"))
      .withColumn("compression",
        col("n_syms").cast("double") / col("n_chars").cast("double"))
  }
}
