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
}
