package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** The scan layer must read `events.ts` identically across every parquet
  * timestamp flavor the testdata generator has actually shipped — the
  * driver regenerated the files mid-round-8 switching TIMESTAMP(NANOS)
  * to TIMESTAMP_NTZ(µs) and took 11 green queries down with an analysis
  * error. This spec writes events-shaped parquet in all three encodings
  * and asserts `Tables.events` lands every one on the same
  * TimestampType instants, so a future encoding swap is a red test here
  * instead of a 6,600 s bench artifact.
  */
class TablesSpec extends SparkTestBase {

  // micros-since-epoch fixtures, including a value whose nanos form
  // exercises the integral-division path (non-zero sub-micro digits
  // cannot survive any encoding, so all three agree on the micro)
  private val micros =
    Seq(1700000000000000L, 1700000000123456L, 1712345678901234L)

  private def scratch(tag: String): String =
    Files.createTempDirectory(s"graft_tables_$tag").toString

  /** Write an events-shaped table with `ts` in the given flavor and read
    * it back through Tables.events.
    */
  private def roundtrip(tag: String, sqlType: String): Seq[Long] = {
    import spark.implicits._
    val dir = scratch(tag)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, "click", i * 1.5)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
    val withTs = sqlType match {
      case "long_nanos" =>
        // what the nanosAsLong session conf turns INT64 TIMESTAMP(NANOS)
        // into at scan time: a plain nanos long (sub-micro digits added
        // to prove the `div 1000` truncation, Spark's native precision)
        base.withColumn("ts", col("us") * 1000L + lit(789L))
      case "timestamp" =>
        base.withColumn("ts", timestamp_micros(col("us")))
      case "timestamp_ntz" =>
        // session tz is pinned UTC, so the NTZ wall-clock equals the
        // instant and the cast back must be exact
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampType,
      s"$tag: Tables.events must normalize ts to TimestampType")
    out.select(col("event_id"), unix_micros(col("ts")).as("um"))
      .orderBy("event_id").collect().map(_.getLong(1)).toSeq
  }

  test("events.ts reads to identical instants from INT64-nanos, " +
       "TIMESTAMP, and TIMESTAMP_NTZ parquet") {
    val fromNanos = roundtrip("nanos", "long_nanos")
    val fromTs = roundtrip("ts", "timestamp")
    val fromNtz = roundtrip("ntz", "timestamp_ntz")
    assert(fromNanos == micros)
    assert(fromTs == micros)
    assert(fromNtz == micros)
  }

  test("events scan tolerates the props column's presence or absence") {
    import spark.implicits._
    val dir = scratch("props")
    // without props
    Seq((1L, 1700000000000000L, 2L, "view", 0.5))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val noProps = Tables.events(spark, dir)
    assert(!noProps.columns.contains("props"))
    assert(noProps.select(min(unix_micros(col("ts")))).collect()
      .head.getLong(0) == 1700000000000000L)
    // with props (the regenerated testdata's shape)
    val dir2 = scratch("props2")
    Seq((1L, 1700000000000000L, 2L, "view", 0.5, """{"k":"v"}"""))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val withProps = Tables.events(spark, dir2)
    assert(withProps.columns.contains("props"))
    assert(withProps.schema("ts").dataType == TimestampType)
    assert(withProps.select(min(unix_micros(col("ts")))).collect()
      .head.getLong(0) == 1700000000000000L)
  }

  test("embeddings survive an element-type drift: array<float> and " +
       "array<double> parquet yield identical vector-op results") {
    import spark.implicits._
    // every native vector expression casts its input to array<double>
    // at construction (VectorExpressions/QuantExpressions), so the
    // engine must not care which element width the generator shipped —
    // the same defensive property Tables.events provides for ts
    val vals = Seq(
      (0L, Seq(1.0f, 0.5f, -0.25f)),
      (1L, Seq(0.125f, -1.0f, 0.75f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))
    def results(dir: String): Seq[(Long, Double)] = {
      val e = Tables.embeddings(spark, dir)
      e.select(col("vec_id"),
          graft.extensions.Similarity.norm(col("embedding")).as("nrm"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val fdir = scratch("embf")
    vals.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$fdir/embeddings.parquet")
    val ddir = scratch("embd")
    vals.map { case (id, v) => (id, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$ddir/embeddings.parquet")
    // float->double widening is exact for these dyadic values, so the
    // norms must be bit-identical, not merely close
    assert(results(fdir) == results(ddir))
    assert(results(fdir).map(_._2).last == 0.0) // zero vector guard
  }

  test("the real testdata events table analyzes through unix_micros " +
       "at every shipped sf") {
    Seq("sf0.001", "sf0.01").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet"))) {
        val n = Tables.events(spark, dir)
          .select(unix_micros(col("ts"))).limit(1).collect().length
        assert(n == 1, s"$sf: events must yield rows through unix_micros")
      }
    }
  }
}
