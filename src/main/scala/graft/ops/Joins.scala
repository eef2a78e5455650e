package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for the scale paths SURVEY §4 calls out as contingencies:
  * AQE handles moderate skew automatically; explicit salting is the tool
  * for pathological hot keys (a handful of keys carrying a large share of
  * the fact side — e.g. ubiquitous simplified names like "aspirin" in the
  * synonymizer dictionary join).
  */
object Joins {

  /** Salted equi-join of a skewed fact side against a dimension side.
    *
    * The fact side gets a random salt in [0, saltFactor); the dimension
    * side is replicated saltFactor times (explode of a literal range), so
    * the shuffle key becomes (key, salt) and a hot key spreads over
    * saltFactor reducers. Use when AQE skew splitting isn't enough; the
    * dimension side must tolerate replication (small/medium).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = fact.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** As-of join: each left row matched to the LATEST right row with
    * rightTime <= leftTime for the same key — the event-analytics join
    * Spark has no native operator for.
    *
    * Union+window formulation, not a range join: both sides are tagged
    * and unioned, sorted within each key by (time, tag) with right rows
    * first at equal times (so "at or before" includes ties), and the
    * right payload is carried forward with last(ignoreNulls). ONE
    * shuffle on the key plus a per-key sort — no range-explosion join,
    * no per-row probe, and it scales exactly like a window aggregation
    * (skewed keys sort within their partition; salt the key upstream if
    * one key dominates).
    *
    * `key`/`timeCol` must be named identically on both sides; right rows
    * should be unique per (key, time) — payloads are carried column-wise,
    * so duplicate right timestamps would mix rows nondeterministically
    * (pre-aggregate them).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               timeCol: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val otherLeft = left.columns.filterNot(c => c == key || c == timeCol)
    val leftSel = left.select(
      (Seq(col(key), col(timeCol), lit(1).as("__tag")) ++
       otherLeft.map(col) ++
       payloadCols.map(c =>
         lit(null).cast(right.schema(c).dataType).as(prefix + c))): _*)
    val rightSel = right.select(
      (Seq(col(key), col(timeCol), lit(0).as("__tag")) ++
       otherLeft.map(c =>
         lit(null).cast(left.schema(c).dataType).as(c)) ++
       payloadCols.map(c => col(c).as(prefix + c))): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(timeCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(leftSel.unionByName(rightSel)) {
      (df, c) =>
        df.withColumn(prefix + c,
          last(col(prefix + c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag")
  }

  /** Range (interval) join at scale: point-in-interval matching WITHOUT
    * a theta join (a naive `t BETWEEN start AND end` condition forces a
    * broadcast-nested-loop or cartesian plan). Intervals are exploded to
    * every fixed-width bin they overlap, each point maps to exactly one
    * bin, the join is a plain equi-join on (key, bin), and the exact
    * containment predicate runs on candidates only. A point's bin lies
    * inside its containing interval's bin range by construction, so each
    * containment match is produced exactly once — no dedup pass.
    *
    * `binWidth` trades interval replication (≈ width/binWidth copies)
    * against candidate precision; pick it near the median interval
    * width. Both time columns must be integral (epoch seconds/micros).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binWidth"),
                       expr(s"$endCol div $binWidth"))))
    points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
      .join(binned, Seq(key, "__bin"))
      .filter(col(pointCol) >= col(startCol) &&
              col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Deterministic pseudo-random pick via a consistent hash ring: every
    * doc sits on the ring at md5(id); a probe resolves to the FIRST doc
    * at-or-after its own hash position, wrapping around. No RNG state,
    * reproducible across runs and engines, and stable under corpus
    * growth except at ring-neighbor boundaries — the classic
    * consistent-hashing property, used here for negative sampling in
    * contrastive-training triplets.
    *
    * Scale design: the ring scan is NOT a global sort. Both sides bucket
    * on the first 2 hex chars of the hash (256 buckets); the at-or-after
    * successor is a per-bucket union + window carry (the asofJoin
    * pattern, partitioned by bucket so it parallelizes). Probes whose
    * bucket has no successor fall back through a broadcast ≤256-row
    * bucket-minimum summary — bounded fan-out, no driver collect.
    *
    * `probes` keeps all its columns and gains `outCol`; `probeHashCol`
    * must be an md5-style lowercase hex string. Probe ROWS must be
    * distinct (the wrap-around fallback re-groups by the probe columns).
    */
  def hashRingLookup(probes: DataFrame, probeHashCol: String,
                     docs: DataFrame, docIdCol: String,
                     outCol: String = "ring_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col(docIdCol).as("__rid"),
                        md5(col(docIdCol).cast("string")).as("__h"))
    def bucketOf(h: Column): Column =
      conv(substring(h, 1, 2), 16, 10).cast("int")
    val probeCols = probes.columns
    val idType = d.schema("__rid").dataType
    val pSel = probes.select(
      (probeCols.map(col) :+ col(probeHashCol).as("__h") :+
        lit(0).as("__tag") :+ lit(null).cast(idType).as("__rid")): _*)
    val dSel = d.select(
      (probeCols.map(c =>
        lit(null).cast(probes.schema(c).dataType).as(c)) :+
        col("__h") :+ lit(1).as("__tag") :+ col("__rid")): _*)
    // at equal hash the doc (tag 1) sorts after the probe, so the
    // at-or-after frame includes an exact hash collision
    val w = Window.partitionBy("__b").orderBy("__h", "__tag", "__rid")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val scanned = pSel.unionByName(dSel)
      .withColumn("__b", bucketOf(col("__h")))
      .withColumn("__succ", first(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
    // wrap-around tables, both bounded: per-bucket doc minimum (≤256
    // rows) expanded to "min doc over any LATER bucket" for every
    // possible probe bucket (256 × ≤256 bounded join), plus the global
    // ring minimum. Resolving through one equi-join + coalesce keeps the
    // probe pipeline single-pass — a hit/miss branch split would run the
    // (possibly expensive) probe lineage twice.
    val bucketMins = d
      .groupBy(bucketOf(col("__h")).as("__mb"))
      .agg(min_by(col("__rid"), struct(col("__h"), col("__rid")))
        .as("__bmin"))
    val nextMin = probes.sparkSession.range(0, 256).toDF("__nb")
      .join(broadcast(bucketMins), col("__mb") > col("__nb"))
      .groupBy("__nb")
      .agg(min_by(col("__bmin"), col("__mb")).as("__next"))
    val globalMin = broadcast(
      d.agg(min_by(col("__rid"), struct(col("__h"), col("__rid")))
        .as("__gmin")))
    scanned
      .join(broadcast(nextMin), col("__b") === col("__nb"), "left")
      .crossJoin(globalMin)
      .select(probeCols.map(col) :+
        coalesce(col("__succ"), col("__next"), col("__gmin")).as(outCol): _*)
  }

  /** Top-k hot keys of a column — the measurement step before deciding
    * to salt (drive skew decisions with data, not guesses).
    */
  def hotKeys(df: DataFrame, key: Column, k: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
}
