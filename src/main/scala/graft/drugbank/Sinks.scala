package graft.drugbank

import org.apache.spark.sql.DataFrame

/** S5/S6 sinks (perform_NER.py:136-142, look_for_identifiers.py:107-112):
  * JSON for interchange, parquet replacing pickle as the fast-reload
  * checkpoint between stages (SURVEY §2.1 S4/S6).
  *
  * The reference emits one keyed-by-curie JSON object; Spark writes
  * JSON-lines. `keyedJson` reproduces the reference's sink formatting at
  * the API edge (driver-side assembly — sink formatting, not query
  * semantics; SURVEY §7.4 note 6). Use only for golden-file comparison at
  * fixture scale.
  */
object Sinks {

  def writeJson(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df).write.mode("overwrite").json(path)

  def writeCheckpoint(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readCheckpoint(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame =
    spark.read.parquet(path)

  /** In-memory stage boundary: persist + cut the logical lineage.
    *
    * A stage whose output feeds N downstream branches would otherwise
    * contribute N copies of its whole subtree to every downstream plan —
    * Catalyst re-analyzes each copy, so driver time (not just execution)
    * grows with the product of the branch counts (drugbank_e2e: 1,126
    * Exchanges, ~26 s of driver-side analysis). An eager localCheckpoint
    * materializes the frame once and wraps its InternalRow RDD as a
    * fresh leaf, so downstream plans see one shared scan — the in-memory
    * analogue of the reference's pickle checkpoint (perform_NER.py:141-142
    * → look_for_identifiers.py:65-66) — without the Row encode/decode a
    * persist + createDataFrame(df.rdd) round-trip pays, and with the RDD
    * dependency graph truncated too. For a restart-safe boundary across
    * jobs use writeCheckpoint/readCheckpoint.
    */
  def stageBoundary(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  /** Keyed JSON object string `{"<keyCol>": {record}, ...}` (driver-side,
    * fixture-scale only — `maxRows` guards the collect). The key comes
    * from the actual column and the record from `to_json(struct(*))`, so
    * values containing `"<key>":"`-shaped text can't corrupt the
    * extraction (the old indexOf surgery could).
    */
  def keyedJson(df: DataFrame, keyCol: String, maxRows: Int = 100000): String = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val pairs = df
      .select(col(keyCol).cast("string").as("_key"),
              to_json(struct(df.columns.map(col): _*)).as("_json"))
      .limit(maxRows + 1)
      .collect()
    require(pairs.length <= maxRows,
      s"keyedJson is a fixture-scale sink: > $maxRows rows (write " +
        "JSON-lines with writeJson instead)")
    pairs
      .map { r =>
        require(!r.isNullAt(0),
          s"keyedJson: null value in key column '$keyCol'")
        val key = r.getString(0).replace("\\", "\\\\").replace("\"", "\\\"")
        s""""$key": ${r.getString(1)}"""
      }
      .sorted.mkString("{", ", ", "}")
  }

  /** The 17M-drug path for the keyed-object sink (VERDICT r14 #6):
    * [[keyedJson]]'s `{"<key>": {record}, ...}` document, produced
    * DISTRIBUTED — each executor renders and writes its key range, the
    * driver only writes a tiny ordered manifest. Entries are the same
    * rendered strings keyedJson builds (`"escaped-key": to_json(row)`),
    * range-partitioned and sorted on the rendered entry, one text file
    * per range, so concatenating the shard lines in manifest order with
    * `", "` separators inside braces reassembles keyedJson's output
    * byte for byte (DrugBankSpec pins it on the golden fixture;
    * [[assembleKeyedJson]] is that fixture-scale reassembly — at real
    * scale consumers stream the shards and nobody builds the string).
    *
    * Ordering caveat, disclosed: shard order is Spark's UTF-8 binary
    * string order, keyedJson's driver sort is UTF-16 code-unit order —
    * identical for ASCII keys (every reference curie; asserted
    * nowhere stronger). Keys must also be free of raw newlines (the
    * shard format is line-per-entry; keyedJson technically permits
    * them) — both enforced loudly below, matching the null-key raise.
    *
    * @return total entries written
    */
  def writeKeyedJsonShards(df: DataFrame, keyCol: String, path: String,
                           shards: Int = 64): Long = {
    import org.apache.spark.sql.functions._
    require(shards >= 1 && shards <= 100000, "sane shard count")
    val esc = regexp_replace(
      regexp_replace(col(keyCol).cast("string"), "\\\\", "\\\\\\\\"),
      "\"", "\\\\\"")
    val guarded = when(col(keyCol).isNull,
        raise_error(lit(s"writeKeyedJsonShards: null value in key " +
          s"column '$keyCol'")))
      .when(col(keyCol).cast("string").contains("\n") ||
            col(keyCol).cast("string").contains("\r"),
        raise_error(lit(s"writeKeyedJsonShards: raw newline in key " +
          s"column '$keyCol' breaks the line-per-entry shard format")))
      .otherwise(esc)
    // entry total observed DURING the write — a read-back count would
    // re-scan the whole rendered output as a second job at 17M keys
    val obs = org.apache.spark.sql.Observation(s"keyed_json_$shards")
    // observe sits ABOVE the range shuffle: repartitionByRange runs a
    // hidden sampling pass over its child, which would double-count a
    // pre-shuffle metric
    val entries = df
      .select(concat(lit("\""), guarded, lit("\": "),
        to_json(struct(df.columns.map(col): _*))).as("value"))
      .repartitionByRange(shards, col("value"))
      .sortWithinPartitions("value")
      .observe(obs, count(lit(1)).as("n"))
    entries.write.mode("overwrite").text(path)
    // tiny driver-side manifest: ordered shard names + the entry total,
    // so a consumer can place separators / validate without re-listing.
    // Path.getFileSystem, not FileSystem.get(new URI(...)): a raw URI
    // constructor rejects URI-illegal path characters (spaces)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val shardFiles = fs.listStatus(root)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc"))
      .sorted
    val total = obs.get("n").asInstanceOf[Long]
    val manifest = shardFiles.map(n => s"""    "$n"""")
      .mkString(s"""{\n  "entries": $total,\n  "shards": [\n""",
        ",\n", "\n  ]\n}\n")
    val out = fs.create(
      new org.apache.hadoop.fs.Path(path, "_graft_manifest.json"), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    total
  }

  /** Fixture-scale reassembly of a [[writeKeyedJsonShards]] directory
    * into the exact [[keyedJson]] string — for golden-file comparison
    * only (`maxBytes` guards the driver): streams the manifest's
    * shards in order, joining entry lines with `", "` inside braces.
    */
  def assembleKeyedJson(spark: org.apache.spark.sql.SparkSession,
                        path: String, maxBytes: Long = 64L << 20): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val manifestText = {
      val in = fs.open(
        new org.apache.hadoop.fs.Path(path, "_graft_manifest.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val shardNames = "\"(part-[^\"]+)\"".r
      .findAllMatchIn(manifestText).map(_.group(1)).toSeq
    var bytes = 0L
    val entries = shardNames.iterator.flatMap { n =>
      val p = new org.apache.hadoop.fs.Path(path, n)
      bytes += fs.getFileStatus(p).getLen
      require(bytes <= maxBytes,
        s"assembleKeyedJson is a fixture-scale reader: > $maxBytes " +
          "bytes (consume the shards directly instead)")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector
      finally in.close()
    }
    entries.mkString("{", ", ", "}")
  }
}
