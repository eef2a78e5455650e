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

  /** Top-k hot keys of a column — the measurement step before deciding
    * to salt (drive skew decisions with data, not guesses).
    */
  def hotKeys(df: DataFrame, key: Column, k: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
}
