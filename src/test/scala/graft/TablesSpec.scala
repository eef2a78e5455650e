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
    // r12 structural-drift contract: a dropped column is null-filled at
    // its canonical type, so queries selecting props keep analyzing
    assert(noProps.columns.contains("props"))
    assert(noProps.schema("props").dataType == StringType)
    assert(noProps.select(count(col("props"))).collect().head.getLong(0) == 0L)
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

  test("lineitem absorbs a decimal-vs-double / int32-vs-int64 drift: " +
       "both flavors load to the canonical schema with equal values") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 100L, 1, 17.0, 17017.25, 0.05, 0.02, "N", "O",
        1700000000000000L),
      (2L, 20L, 200L, 2, 36.5, 40040.50, 0.10, 0.04, "R", "F",
        1712345678000000L))
    def write(dir: String, drift: Boolean): Unit = {
      val base = rows
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "us")
        .withColumn("l_shipdate", timestamp_micros(col("us"))).drop("us")
      val out =
        if (!drift) base
        else base
          // the classic TPC-H DDL flavors: DECIMAL(12,2) money columns,
          // INT32 keys, DATE ship dates
          .withColumn("l_quantity", col("l_quantity").cast(DecimalType(12, 2)))
          .withColumn("l_extendedprice",
            col("l_extendedprice").cast(DecimalType(12, 2)))
          .withColumn("l_discount", col("l_discount").cast(DecimalType(12, 2)))
          .withColumn("l_tax", col("l_tax").cast(DecimalType(12, 2)))
          .withColumn("l_orderkey", col("l_orderkey").cast(IntegerType))
          .withColumn("l_partkey", col("l_partkey").cast(IntegerType))
          .withColumn("l_suppkey", col("l_suppkey").cast(IntegerType))
          .withColumn("l_linenumber", col("l_linenumber").cast(LongType))
          .withColumn("l_shipdate", col("l_shipdate").cast(DateType))
      out.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    def loadCanon(dir: String) = {
      val df = Tables.lineitem(spark, dir)
      assert(df.schema("l_quantity").dataType == DoubleType)
      assert(df.schema("l_extendedprice").dataType == DoubleType)
      assert(df.schema("l_orderkey").dataType == LongType)
      assert(df.schema("l_linenumber").dataType == IntegerType)
      assert(df.schema("l_shipdate").dataType == TimestampType)
      df.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_linenumber"))
        .orderBy("l_orderkey").collect().map(_.toSeq).toSeq
    }
    val cDir = scratch("li_canon"); write(cDir, drift = false)
    val dDir = scratch("li_drift"); write(dDir, drift = true)
    // dyadic-fraction fixture values survive decimal(2)->double exactly,
    // so the two flavors must agree bit-for-bit, not merely approximately
    assert(loadCanon(cDir) == loadCanon(dDir))
    // undrifted load adds no Project over the scan (normalized is a no-op)
    val plan = Tables.lineitem(spark, cDir).queryExecution.optimizedPlan
    assert(plan.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LeafNode],
      s"canonical-flavor load must stay a bare relation, got:\n$plan")
  }

  test("an INT64 epoch-MICROS timestamp column fails loudly instead of " +
       "loading 1000x wrong under the nanos rule") {
    import spark.implicits._
    val dir = scratch("orders_micros_long")
    // ~1.7e15: epoch-micros magnitude — the drift flavor coerce() must
    // refuse to guess at (div-1000 would silently read it as ~1970)
    Seq((1L, 1L, 100.0, 1700000000000000L))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val e = intercept[Exception] {
      Tables.orders(spark, dir).collect()
    }
    // but 0 is unit-independent (the epoch in any unit — a common
    // sentinel) and must load as the epoch, not poison the table
    val zdir = scratch("orders_zero_long")
    Seq((1L, 1L, 100.0, 0L), (2L, 2L, 50.0, 1700000000000000000L))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$zdir/orders.parquet")
    val z = Tables.orders(spark, zdir).orderBy("o_orderkey")
      .select(unix_micros(col("o_orderdate"))).collect().map(_.getLong(0))
    assert(z.toSeq == Seq(0L, 1700000000000000L))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not nanos-since-epoch")),
      s"wanted the refusing-to-guess error, got: $e")
  }

  test("ScratchDirs: recursive delete removes nested scratch trees; " +
       "register returns the path unchanged") {
    val root = new java.io.File(scratch("scratchdirs_test"))
    val nested = new java.io.File(root, "a/b")
    nested.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(nested, "f.txt").toPath, "x")
    assert(nested.exists())
    graft.tables.ScratchDirs.deleteRecursively(root)
    assert(!root.exists())
    val p = scratch("scratchdirs_reg")
    assert(graft.tables.ScratchDirs.register(p) == p)
  }

  test("nation absorbs an int64-keys drift back to canonical int32") {
    import spark.implicits._
    val dir = scratch("nation64")
    Seq((0L, "ALGERIA", 0L), (1L, "ARGENTINA", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val df = Tables.nation(spark, dir)
    assert(df.schema("n_nationkey").dataType == IntegerType)
    assert(df.schema("n_regionkey").dataType == IntegerType)
    assert(df.orderBy("n_nationkey").collect().map(_.getInt(0)).toSeq
      == Seq(0, 1))
  }

  test("orders absorbs an INT64-nanos o_orderdate exactly (div-1000 " +
       "truncation, not double division)") {
    import spark.implicits._
    val dir = scratch("ordnanos")
    // a micros value whose nanos form is near 2^60, where double ulp
    // is 256 ns — double division would round some values up 1 µs
    val us = Seq(1700000000000001L, 1700000000000003L, 1152921504606846L)
    us.zipWithIndex.map { case (u, i) =>
      (i.toLong, i.toLong, "O", 1.0, u * 1000L + 999L, "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.orders(spark, dir)
    assert(df.schema("o_orderdate").dataType == TimestampType)
    assert(df.orderBy("o_orderkey")
      .select(unix_micros(col("o_orderdate")))
      .collect().map(_.getLong(0)).toSeq == us)
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

  test("structural drift: an ADDED column is dropped, a DROPPED column " +
       "is null-filled at its canonical type, and the projection lands " +
       "in canonical order") {
    import spark.implicits._
    val dir = scratch("docdrift")
    // documents with an extra generator column and without source/n_chars
    Seq((1L, "hello world", "en", 0.9), (2L, "bonjour", "fr", 0.4))
      .toDF("doc_id", "text", "lang", "quality_v2")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(df.schema("source").dataType == StringType)
    assert(df.schema("n_chars").dataType == LongType)
    val r = df.orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(r.forall(row => row.isNullAt(3) && row.isNullAt(4)))
  }

  test("structural drift: a pure column REORDER reprojects to canonical " +
       "order silently — no drift log line naming nothing") {
    import spark.implicits._
    val dir = scratch("docreorder")
    Seq(("hello", 1L, "en", "web", 5L))
      .toDF("text", "doc_id", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val df = try {
      System.setErr(new java.io.PrintStream(buf, true))
      Tables.documents(spark, dir)
    } finally System.setErr(old)
    assert(df.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(df.collect().head.getLong(0) == 1L)
    assert(!buf.toString.contains("structural drift"),
      s"reorder-only must not emit the drift line; got: $buf")
  }

  test("structural drift: RENAMED columns map back via the alias table " +
       "(timestamp->ts) and the case/separator fold (Event_ID), then " +
       "type-coerce like any pinned column") {
    import spark.implicits._
    val dir = scratch("evrename")
    Seq((7L, 1700000000000000L, 3L, "view", 1.5, "{}"))
      .toDF("Event_ID", "us", "user_id", "event_type", "value", "props")
      .withColumn("timestamp", timestamp_micros(col("us")))
      .select("Event_ID", "timestamp", "user_id", "event_type", "value",
        "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val row = df.collect().head
    assert(row.getLong(0) == 7L)
    assert(df.select(unix_micros(col("ts"))).collect().head.getLong(0)
      == 1700000000000000L)
  }

  test("structural drift: two source columns competing for one " +
       "canonical name fail loudly instead of guessing") {
    import spark.implicits._
    val dir = scratch("evambig")
    Seq((1L, 1700000000000000L, 1700000000000001L, 3L, "view", 1.5, "{}"))
      .toDF("event_id", "tsa", "tsb", "user_id", "event_type", "value",
        "props")
      .withColumn("timestamp", timestamp_micros(col("tsa")))
      .withColumn("event_time", timestamp_micros(col("tsb")))
      .select("event_id", "timestamp", "event_time", "user_id",
        "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("renamed 'ts'"), e.getMessage)
  }

  test("bucketedTable refuses to clear an UNREGISTERED non-empty path " +
       "with no prior same-name table: unrelated data survives, the " +
       "CTAS fails; a registered scratch path rebuilds fine") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // unrelated data at an unregistered path: must NOT be deleted
    val foreign = scratch("bucket_foreign")
    val marker = java.nio.file.Paths.get(foreign, "precious.txt")
    Files.writeString(marker, "do not delete")
    intercept[Exception] {
      graft.ops.Partitioning.bucketedTable(df, "g_guard_t1", Seq("k"),
        buckets = 2, foreign)
    }
    assert(Files.exists(marker), "unrelated file must survive the guard")
    // registered scratch path: rebuild-over-leftovers works (covers())
    val owned = graft.tables.ScratchDirs.register(scratch("bucket_owned"))
    Files.writeString(java.nio.file.Paths.get(owned, "leftover.txt"), "x")
    val t = graft.ops.Partitioning.bucketedTable(df, "g_guard_t2", Seq("k"),
      buckets = 2, owned)
    assert(t.count() == 2)
    spark.sql("DROP TABLE IF EXISTS `g_guard_t2`")
  }

  test("pre-epoch INT64 nanos divide with floor semantics (no +1us " +
       "round-up toward zero)") {
    import spark.implicits._
    val dir = scratch("evfloor")
    // -1.7e18 ns is far pre-epoch (magnitude passes the nanos guard);
    // the 999 ns remainder must floor DOWN a microsecond
    val nanos = Seq(-1700000000000000999L, -1700000000000000000L)
    nanos.zipWithIndex.map { case (n, i) =>
      (i.toLong, n, 1L, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // the fixture writes ts as plain INT64 (not TIMESTAMP(NANOS)), so
    // it arrives as LongType exactly like the nanosAsLong read path
    val got = Tables.events(spark, dir).orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-1700000000000001L, -1700000000000000L), got)
  }
}
