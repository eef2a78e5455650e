package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure Column DSL (whole-stage codegen; no UDFs), engine-independent
  * arithmetic (integer-derived doubles only), so every op is
  * DuckDB-oracle-checkable and scales embarrassingly parallel — per-row
  * expressions with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    graft.functions.Tokens(text)

  /** Whitespace token count (long). */
  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token.
    */
  val bpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeIshPattern), lit(0))).cast("long")

  /** Stopword dictionaries for the n-gram/stopword language heuristic.
    * Deliberately tiny — the operator shape (argmax over per-language
    * evidence counts) is what scales; swap in real lists per deployment.
    */
  val langDicts: Seq[(String, Seq[String])] = Seq(
    ("de", Seq("der", "die", "das", "und", "ist", "nicht", "mit")),
    ("en", Seq("the", "a", "of", "and", "to", "in", "is")),
    ("es", Seq("el", "la", "los", "de", "y", "que", "es")),
    ("fr", Seq("le", "les", "des", "et", "une", "est", "dans")))

  /** Evidence count for one language: tokens present in its dictionary
    * (native StopHits — semantically size(filter(toks, isin)), but
    * whole-stage-codegen-compatible). */
  def langScore(text: Column, words: Seq[String]): Column =
    graft.functions.StopHits(tokens(lower(text)), words)

  /** Language ID: argmax evidence count; ties break toward the
    * lexicographically larger language code; all-zero → "und".
    * greatest() over (score, lang) structs keeps this one codegen'd
    * expression with a deterministic tie-break.
    */
  def langId(text: Column): Column = {
    val scored = langDicts.map { case (lang, words) =>
      struct(langScore(text, words).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Quality score in [0,1]: mix of stopword evidence, length band, and
    * punctuation sparsity (ratios of integer counts → identical doubles on
    * any IEEE-754 engine).
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val stopHits = langDicts.map { case (_, w) => langScore(text, w) }
      .reduce(_ + _).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(lit(0.0))
    val lenScore = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punct = length(text) -
      length(regexp_replace(text, "[\\p{Punct}]", ""))
    val punctRatio = when(length(text) > 0,
      punct.cast("double") / length(text).cast("double")).otherwise(lit(0.0))
    stopRatio * lit(0.4) + lenScore * lit(0.4) +
      (lit(1.0) - punctRatio) * lit(0.2)
  }

  /** Distribution-drift monitor over a bounded [0,1] score (quality,
    * language confidence, toxicity): fixed equal-width buckets, then
    * per-bucket total-variation and chi-square terms between a REFERENCE
    * sample and the CURRENT batch — the continuous-ingest health check
    * that catches a crawl source going bad (sum the terms; alert on a
    * threshold). PSI is the industry name for the same shape but needs
    * `ln`, which is not correctly-rounded across engines; TV distance
    * (0.5·Σ|p−q|) and chi-square (Σ(q−p)²/p) carry the same signal in
    * pure rational arithmetic, so the whole monitor is engine-exact and
    * SQL-oracle-able. Laplace smoothing (+1 per bucket) keeps empty
    * buckets finite; the bucket spine is always 0..n−1 so both sides'
    * smoothed masses sum to 1.
    *
    * Scale shape: two map-side bucket projections + two n-bucket
    * aggregates; the window total runs over the n-row result. Nothing
    * here grows with corpus size except the two counting passes.
    */
  def distributionDrift(ref: DataFrame, cur: DataFrame, scoreCol: String,
                        nBuckets: Int = 10): DataFrame = {
    def bucketed(df: DataFrame, cnt: String) = df
      .select(least(greatest(floor(col(scoreCol) * nBuckets), lit(0.0)),
          lit((nBuckets - 1).toDouble)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(cnt))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    ref.sparkSession.range(0, nBuckets).toDF("bucket")
      .join(bucketed(ref, "ref_n"), Seq("bucket"), "left")
      .join(bucketed(cur, "cur_n"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .withColumn("ref_p", (col("ref_n") + lit(1L)).cast("double") /
        (sum(col("ref_n")).over(w) + lit(nBuckets.toLong)).cast("double"))
      .withColumn("cur_p", (col("cur_n") + lit(1L)).cast("double") /
        (sum(col("cur_n")).over(w) + lit(nBuckets.toLong)).cast("double"))
      .withColumn("tv_term", abs(col("ref_p") - col("cur_p")) * lit(0.5))
      .withColumn("chi2_term",
        (col("cur_p") - col("ref_p")) * (col("cur_p") - col("ref_p"))
          / col("ref_p"))
  }

  /** Leakage-safe split assignment from a GROUP key (source, domain, or
    * near-dup cluster representative — not the row id): every member of a
    * group lands on the same side, so eval never sees a train-set
    * sibling of its documents. First hex digit of md5(key) → 2/16 test,
    * 2/16 val, 12/16 train; deterministic and seedless, so re-runs and
    * backfills agree without coordination. Pure map-side — no shuffle at
    * any corpus size.
    */
  def groupSplit(groupKey: Column): Column = {
    val h = substring(md5(groupKey.cast("string")), 1, 1)
    when(h.isin("0", "1"), "test")
      .when(h.isin("2", "3"), "val")
      .otherwise("train")
  }

  /** Shingles of a token array — native single-pass expression
    * ([[graft.functions.WordShingles]]). Referencing the input ONCE
    * makes this immune to the projection-collapse re-substitution that
    * made the old interpreted CASE/transform/slice chain O(tokens²) per
    * row whenever the optimizer inlined it into a filter predicate or
    * generator lambda (bit-equivalence with that chain is asserted in
    * ExtensionsSpec).
    */
  def shinglesOfTokens(toks: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftBridge.expression(toks), n))

  /** Token 3-gram shingles ("rolling window" of the token stream);
    * documents shorter than `n` tokens shingle to the whole text.
    * Single-expression convenience form — see [[shinglesOfTokens]] for
    * the staged form used on hot paths.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(tokens(text), n)

  /** Document fingerprint: minimum md5 over the shingle set (winnowing-
    * style rolling-hash selection with window = whole doc). Equal for
    * near-identical docs that share their minimal shingle; used as the
    * blocking key for pairwise dedup.
    */
  def fingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** Corpus snapshot diff — the crawl-to-crawl audit a continuously
    * refreshed training corpus needs: classify every doc id across two
    * snapshots as `added` / `removed` / `changed` / `unchanged` by
    * comparing content fingerprints. Fingerprints are computed map-side
    * ([[fingerprint]], with an exact md5-of-text fallback for docs too
    * short to form one shingle, and a non-hex sentinel for NULL text —
    * a null fingerprint must never masquerade as an add/remove, and
    * md5(NULL) is NULL, so the sentinel is load-bearing: two null-text
    * rows compare `unchanged`, null-vs-text compares `changed`); the
    * classification is ONE
    * full-outer join keyed by id, so at scale the only exchange
    * carries (id, fingerprint) pairs — document text never shuffles —
    * and id-bucketed snapshot tables make even that co-located.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    def fp(docs: DataFrame, out: String) = docs.select(
      col(idCol).as("id"),
      coalesce(fingerprint(col(textCol), n), md5(col(textCol)),
        lit(":null:")).as(out))
    fp(oldDocs, "fp_old")
      .join(fp(newDocs, "fp_new"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Repeated-n-gram ratio (the Gopher/C4-style repetition quality rule):
    * 1 - distinct/total over the token n-gram stream; 0.0 for docs too
    * short to form one n-gram. Ratio of longs — engine-independent.
    */
  def repetitionRatio(text: Column, n: Int = 2): Column =
    repetitionRatioOfShingles(shingles(text, n))

  /** Ratio form over a PRE-STAGED shingle array column. Prefer this on
    * hot paths: `grams` is referenced four times below (condition, two
    * sizes, divisor), and an inlined `shingles(text)` re-runs the whole
    * tokenize+shingle chain per reference (same pathology class as
    * [[shinglesOfTokens]]'s docstring).
    */
  def repetitionRatioOfShingles(grams: Column): Column = {
    val total = size(grams).cast("long")
    val distinctN = size(array_distinct(grams)).cast("long")
    when(total > 0,
      (total - distinctN).cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** PII scrubbing: emails, then dotted-quad IPs, then long digit runs
    * (phone-ish) replaced by typed placeholders, in that fixed order so
    * the digits rule can't eat IP octets first. Patterns stay in the
    * Java∩RE2 common subset (no lookaround, no backrefs) so the same
    * regex drives Spark (java.util.regex) and the DuckDB oracle (RE2).
    */
  def piiScrub(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]")
    regexp_replace(ip, "[0-9]{7,}", "[NUM]")
  }

  /** HTML boilerplate strip: drop tags, decode the common entities,
    * collapse runs of whitespace. Like [[piiScrub]], patterns stay in
    * the Java∩RE2 common subset, and the whitespace class is written
    * explicitly ([ \t\n\r] — Java's \s also eats \x0B, RE2's doesn't)
    * so the same expressions drive Spark and the DuckDB oracle.
    */
  def stripHtml(text: Column): Column = {
    val untagged = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
                      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (c, (ent, ch)) =>
        replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }

  /** Deterministic hash sampling: keep a row iff the md5(key) hex prefix
    * is lexicographically below `thresholdHex` (lowercase hex digits
    * compare like their numeric values, so "4000" keeps 0x0000-0x3fff ≈
    * 25%). A stable, engine-independent Bernoulli sample — no RNG state,
    * reproducible across runs/engines, per-key stable as the corpus
    * grows: the standard held-out / train-val split for training corpora.
    */
  def hashSample(key: Column, thresholdHex: String): Column = {
    require(thresholdHex.nonEmpty &&
      thresholdHex.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"thresholdHex must be lowercase hex, got '$thresholdHex'")
    substring(md5(key.cast("string")), 1, thresholdHex.length) < thresholdHex
  }

  /** Sequence packing: assign each document to a fixed token-budget pack
    * (the pre-training step that concatenates docs into context-length
    * chunks). Docs are ordered deterministically inside each stream by
    * md5(id) (stable epoch shuffle, no RNG state), the running token
    * total accumulates per stream, and pack_id = start-offset div budget
    * — a doc straddling a boundary belongs to the pack its first token
    * lands in (concat-then-chunk semantics). Integer `div` keeps the
    * assignment engine-exact.
    *
    * Scale shape: ONE window keyed by `stream` — the sort is
    * per-stream-partition, never global, so streams (language, shard,
    * source) bound the sort size; a corpus packs with as many parallel
    * streams as it has partitions.
    */
  def packByTokenBudget(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, streamCol: Column, budget: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, s"budget must be positive, got $budget")
    docs
      .select(col(idCol).as("doc_id"), streamCol.as("stream"),
              tokenCount(col(textCol)).as("n_tokens"),
              md5(col(idCol).cast("string")).as("ord"))
      .withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy("stream").orderBy(col("ord"))))
      .withColumn("pack_id", expr(s"(cum - n_tokens) div $budget"))
      .select("doc_id", "stream", "n_tokens", "pack_id")
  }

  /** Top-k salient terms per document by TF-IDF with a LINEAR idf
    * (tf * N/df, no logarithm): multiplication and division are
    * IEEE-exact so scores are bit-identical across engines (`ln` is not
    * correctly-rounded and would break oracle hash parity in the last
    * ulp); the ranking is the same monotone order in 1/df. Ties break by
    * term ascending.
    *
    * Scale shape: map-side explode → partial-agg tf keyed (doc, term) →
    * df keyed term → tf⋈df shuffles on term (both pre-keyed) → corpus
    * size N joined as a broadcast 1-row frame (never a driver collect) →
    * top-k window keyed doc. No all-pairs stage anywhere.
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfByTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfByTerm, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  /** Sliding-window token chunking (the retrieval/context-window prep
    * op): overlapping chunks of `window` tokens at `stride` offsets —
    * chunk o covers tokens [o·stride, o·stride + window); every token
    * lands in at least one chunk; the tail chunk may be short. Output:
    * (doc_id, chunk_id, n_chunk_tokens, chunk_md5). Pure map-side
    * explode — no shuffle; the chunk array is built in ONE staged
    * projection over the staged token array (generator-inlining trap:
    * an explode over an expression that recomputes `toks` re-tokenizes
    * per chunk).
    */
  def slidingChunks(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, window: Int = 64, stride: Int = 32)
      : org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n"))
      // `div`, not `/`: long `/` routes through double division
      .select(col("doc_id"), col("toks"), col("n"),
        expr(s"(n - 1) div $stride").as("max_o"))
      .select(col("doc_id"),
        transform(
          sequence(lit(0L), col("max_o")),
          o => struct(
            o.cast("long").as("chunk_id"),
            least(lit(window.toLong),
              col("n") - o * lit(stride.toLong)).as("n_chunk_tokens"),
            md5(array_join(
              slice(col("toks"), (o * stride + 1).cast("int"), lit(window)),
              " ")).as("chunk_md5"))).as("chunks"))
      .select(col("doc_id"), explode(col("chunks")).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.n_chunk_tokens"),
              col("c.chunk_md5"))
  }

  /** C4-style intra-document repeated-line removal WITH reassembly:
    * split on `.`, drop blank segments, keep each distinct line's FIRST
    * occurrence, and rebuild the document in original order. (The
    * cross-corpus variant is `paragraph_dedup`; this one is per-doc —
    * boilerplate repeated inside a page, nav text, chat echoes.)
    *
    * Scale shape: one explode, one (doc, line)-keyed window for the
    * first-occurrence pick, one doc-keyed reassembly agg — all
    * partition-local to the doc key after a single shuffle;
    * `array_sort` on (pos, line) structs restores original order
    * deterministically.
    */
  def dedupLinesWithin(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"), col("para")).orderBy("pos")
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\\."))).toDF("doc_id", "pos", "para")
      .filter(length(trim(col("para"))) > 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), ".").as("cleaned"))
  }

  /** Unigram-LM-proxy document score: the mean corpus frequency of the
    * doc's tokens — Σ cnt(term) / (total_tokens · n_doc_tokens) — the
    * log-free stand-in for unigram log-likelihood (same ranking per
    * doc length; `ln` is not correctly-rounded across engines, this
    * is: long sums, one long product, ONE double division). Low score =
    * tokens the corpus rarely uses = gibberish/OCR noise candidate —
    * the classic cheap perplexity-proxy quality gate.
    *
    * Scale shape: one explode → corpus term counts (map-side partial,
    * keyed term) → join back keyed term → per-doc sum keyed doc; the
    * corpus-total frame is 1 row, broadcast.
    */
  def unigramScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val cnt = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = terms.agg(count(lit(1)).as("n_total"))
    terms.join(cnt, "term")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("n_tokens"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        (col("s").cast("double") /
          (col("n_total") * col("n_tokens")).cast("double")).as("lm_score"))
  }

  /** Bigram-LM-proxy document score — [[unigramScores]] one order up:
    * the mean corpus frequency of the doc's ADJACENT TOKEN PAIRS.
    * Unigram frequency can't see scrambled text (a bag of common
    * words shuffled into nonsense scores high); bigram frequency
    * drops on every improbable transition — the cheapest
    * order-sensitive fluency gate, same log-free exact arithmetic
    * (long sums, one long product, ONE double division).
    *
    * Scale shape identical to unigram: one bigram explode feeds the
    * corpus pair counts (map-side partial, keyed pair) and joins
    * back keyed pair → per-doc sum keyed doc; 1-row total broadcast.
    * Docs with fewer than 2 tokens have no bigrams and drop out
    * (0/0), matching SQL unnest of an empty list.
    */
  def bigramScores(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val bi = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i + 1]))")).as("bg"))
    val cnt = bi.groupBy("bg").agg(count(lit(1)).as("cnt"))
    val total = bi.agg(count(lit(1)).as("n_total"))
    bi.join(cnt, "bg")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("n_bigrams"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_bigrams"),
        (col("s").cast("double") /
          (col("n_total") * col("n_bigrams")).cast("double"))
          .as("lm2_score"))
  }

  /** Simpson diversity of a document's token distribution:
    * 1 − Σ c_t² / n² (the probability two random token draws differ) —
    * the log-free entropy stand-in (Shannon needs ln, which is not
    * bit-stable across engines; Simpson carries the same repetition
    * signal in exact integers until ONE double division). Low
    * diversity = a few tokens dominate = keyword-stuffing / template
    * spam — complements `repetition_ratio` (adjacent repeats) with an
    * ORDER-FREE distributional gate.
    *
    * Scale shape: explode → per-(doc, term) counts (map-side partial)
    * → per-doc Σc² and n — both keyed by doc, no corpus-wide state at
    * all. Zero-token docs drop (0/0), matching SQL unnest.
    */
  def tokenDiversity(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("c")).as("c2"))
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") * col("n_tokens") - col("c2")).cast("double") /
          (col("n_tokens") * col("n_tokens")).cast("double"))
          .as("simpson"))

  /** Per-document out-of-vocabulary rate against the corpus' own
    * top-`vocabSize` vocabulary (count desc, term asc — a total order, so
    * the cut at the boundary is deterministic). The standard
    * tokenizer-fit / domain-shift diagnostic for a training corpus.
    *
    * Scale shape: one token explode feeds BOTH the vocab build (map-side
    * partial agg keyed term) and the per-doc totals (keyed doc); the
    * vocab is `vocabSize` rows by construction → broadcast to the anti
    * join, so the exploded stream is never shuffled a second time. The
    * oov_rate division is one exact IEEE op over two longs. Docs with
    * zero tokens have no rate (0/0) and drop out, matching SQL unnest.
    */
  def vocabOovRates(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, vocabSize: Int = 1000)
      : org.apache.spark.sql.DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val vocab = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabSize)
      .select("term")
    val perDoc = terms.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val oov = terms.join(broadcast(vocab), Seq("term"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("n_oov"))
    perDoc.join(oov, Seq("doc_id"), "left")
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
  }
}

/** End-to-end corpus cleaning — the composite a training-data pipeline
  * actually runs: language filter → quality threshold → exact dedup
  * (keep smallest id) → near-dup removal (MinHash+LSH candidates,
  * Jaccard-verified, keep the smaller id of each surviving pair).
  * Entirely built from the operators above; one pass over the corpus
  * plus the candidate joins — no all-pairs stage anywhere.
  */
object CorpusClean {
  import org.apache.spark.sql.DataFrame

  def run(docs: DataFrame, idCol: String, textCol: String,
          keepLangs: Seq[String] = Seq("en"),
          minQuality: Double = 0.5,
          jaccardThreshold: Double = 0.5): DataFrame = {
    val gated = docs
      .filter(TextAnalysis.langId(col(textCol))
        .isin(keepLangs.map(x => x: Any): _*))
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol).as("id"), col(textCol).as("text"))

    // exact dedup: keep the smallest id per content hash. Persisted —
    // referenced by the shingle pass AND the final anti-join, and the
    // gate expressions above it are the most expensive per-row work in
    // the composite (spill-safe MEMORY_AND_DISK; CacheManager dedups the
    // entry across repeated invocations by canonicalized plan).
    val exactKept = gated
      .withColumn("content_hash", md5(col("text")))
      .withColumn("keeper",
        min(col("id")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("content_hash")))
      .filter(col("id") === col("keeper"))
      .select("id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near-dup removal: drop the larger id of every verified pair. The
    // shingle frame is computed ONCE and persisted — the candidate
    // generator and the verification sets both read it (previously each
    // branch recomputed the full shingle pass).
    val shingled = TextDedup.withShingles(exactKept, "id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val losers = TextDedup
      .jaccardVerifiedFromShingles(shingled, jaccardThreshold)
      .select(col("id_b").as("id"))
      .distinct()
    exactKept.join(losers, Seq("id"), "left_anti")
  }
}
