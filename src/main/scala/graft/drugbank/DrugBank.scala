package graft.drugbank

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.constants.Constants
import graft.ops.StringOps
import graft.synonymizer.Synonymizer

/** DrugBank XML ingestion (SURVEY §1.3, §3 EP1 steps 2-3).
  *
  * The reference parses the whole XML into one in-memory dict and handles
  * xmltodict's dict-or-list polymorphism with isinstance ladders at every
  * access (utils.py:81-84, 142-168, 176-200 — ~90 LoC). Here a single
  * fixed schema declares every might-repeat element as ArrayType, so
  * Spark's XML reader normalizes singleton-vs-list at scan time and the
  * crawls collapse to transform/flatten expressions. The scan streams
  * record-by-record (rowTag) — no whole-corpus materialization
  * (anti-pattern at utils.py:26-27).
  */
object DrugBank {

  private val polypeptide = StructType(Seq(
    StructField("_id", StringType),          // XML attribute id
    StructField("name", StringType),
    StructField("gene-name", StringType)))

  private def bioentityList(singular: String): StructField =
    StructField(singular + "s", StructType(Seq(
      StructField(singular, ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("polypeptide", ArrayType(polypeptide)))))))))

  /** Fixed scan schema for one `<drug>` row — every might-repeat element
    * is an ArrayType (kills P14, SURVEY §1.3).
    */
  val drugSchema: StructType = StructType(Seq(
    StructField("drugbank-id", ArrayType(StructType(Seq(
      StructField("_VALUE", StringType),
      StructField("_primary", StringType))))),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("indication", StringType),
    StructField("pharmacodynamics", StringType),
    StructField("mechanism-of-action", StringType),
    StructField("metabolism", StringType),
    StructField("protein-binding", StringType),
    bioentityList("target"),
    bioentityList("enzyme"),
    bioentityList("carrier"),
    bioentityList("transporter"),
    StructField("pathways", StructType(Seq(
      StructField("pathway", ArrayType(StructType(Seq(
        StructField("smpdb-id", StringType),
        StructField("enzymes", StructType(Seq(
          StructField("uniprot-id", ArrayType(StringType))))))))))))))

  /** map<curie, struct<name, category>> — the match-map type shared by
    * the stage-1 NER maps and stage-2 mechanistic merge.
    */
  val matchMapType: DataType = MapType(StringType, StructType(Seq(
    StructField("name", StringType), StructField("category", StringType))))

  def emptyMatchMap: Column = map().cast(matchMapType)

  /** Streaming-friendly XML scan (Spark 4 native XML source). */
  def readXml(spark: SparkSession, paths: String*): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "drug")
      .schema(drugSchema)
      .load(paths: _*)

  /** Corrupt-tolerant scan variant: PERMISSIVE parse with each damaged
    * row's raw text quarantined in `_corrupt_record` instead of killing
    * the scan — at a 17k-drug (or 100 TB) dump, one mangled entity or
    * mismatched tag mid-file must cost one row, not the job. Good rows
    * parse exactly as [[readXml]]; route `_corrupt_record IS NOT NULL`
    * rows to a quarantine sink for offline repair.
    *
    * Scope: damage CONTAINED in a row (bad entities, encoding garbage,
    * schema-type mismatches) costs exactly that row. Damage to the row
    * DELIMITERS themselves (a mangled `</drug>` close tag) can swallow
    * the following row into the quarantined record — the tokenizer can
    * only resynchronize at the next intact row boundary.
    */
  def readXmlLenient(spark: SparkSession, paths: String*): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "drug")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(drugSchema.add(StructField("_corrupt_record", StringType)))
      .load(paths: _*)

  /** The reference's literal first-command flow (`download_data.sh:1-20`:
    * unzip the release, read `full database.xml`): extract the archive's
    * XML entries under `workDir` (hash-verified per entry — S8,
    * [[graft.sources.Ingest.extractZip]]) and scan them. One extraction
    * per release, then every query runs off the extracted files.
    */
  def readXmlFromZip(spark: SparkSession, zipPath: String,
                     workDir: String): DataFrame = {
    val extracted = graft.sources.Ingest.extractZip(
      spark.sparkContext.hadoopConfiguration, zipPath, workDir,
      _.toLowerCase(java.util.Locale.ROOT).endsWith(".xml"))
    require(extracted.nonEmpty, s"no .xml entries in $zipPath")
    readXml(spark, extracted.map(e =>
      new org.apache.hadoop.fs.Path(workDir, e.name).toString): _*)
  }

  /** Bioentity crawl (utils.py:129-169): names = entry names ∪ polypeptide
    * names ∪ gene-names; ids = entry ids ∪ polypeptide @ids; set-dedup
    * (A3 — first-occurrence order, SURVEY §6.3).
    */
  private def crawlBioentities(field: String): Column = {
    val entries = coalesce(
      col(s"${field}s.$field"),
      array().cast(ArrayType(drugSchema(s"${field}s").dataType
        .asInstanceOf[StructType](field).dataType
        .asInstanceOf[ArrayType].elementType)))
    val polys: Column => Column =
      e => coalesce(e.getField("polypeptide"), array())
    val names = array_distinct(filter(concat(
      transform(entries, e => e.getField("name")),
      flatten(transform(entries,
        e => transform(polys(e), p => p.getField("name")))),
      flatten(transform(entries,
        e => transform(polys(e), p => p.getField("gene-name"))))),
      n => n.isNotNull))
    val ids = array_distinct(filter(concat(
      transform(entries, e => e.getField("id")),
      flatten(transform(entries,
        e => transform(polys(e), p => p.getField("_id"))))),
      i => i.isNotNull))
    struct(names.as("names"), ids.as("ids"))
  }

  /** Pathway crawl (utils.py:172-203): SMPDB:-prefixed pathway ids +
    * UniProtKB:-prefixed enzyme ids.
    */
  private def crawlPathways: Column = {
    val ps = coalesce(col("pathways.pathway"),
      array().cast(drugSchema("pathways").dataType
        .asInstanceOf[StructType]("pathway").dataType))
    val ids = array_distinct(
      transform(ps, p =>
        concat(lit("SMPDB:"), p.getField("smpdb-id"))))
    val enzymes = transform(
      flatten(transform(ps,
        p => coalesce(p.getField("enzymes").getField("uniprot-id"),
                      array().cast(ArrayType(StringType))))),
      e => concat(lit("UniProtKB:"), e))
    struct(ids.as("ids"), struct(enzymes.as("ids")).as("enzymes"))
  }

  /** Drug row → per-drug record keyed by kg2_id (utils.py:72-126 +
    * 206-223): resolve `DRUGBANK:<first drugbank-id>` through the
    * synonymizer as ONE broadcast-probe join (replacing the reference's
    * fresh sqlite connection per drug, utils.py:209 — SURVEY §4.2), drop
    * unresolved drugs, attach text fields and crawled bioentities.
    * Last-wins on duplicate kg2_id (A6: dict.update at utils.py:64-69) with
    * a deterministic tie-break on drug_bank_id.
    */
  def records(drugs: DataFrame, syn: Synonymizer): DataFrame = {
    val withId = drugs
      .withColumn("drug_bank_id", col("drugbank-id").getItem(0).getField("_VALUE"))
      .filter(col("drug_bank_id").isNotNull)
    val lookups = syn.canonicalCuriesByCurie(
        withId.select(
          StringOps.withPrefix(Constants.DbPrefix, col("drug_bank_id"))
            .as("input")).distinct())
      .filter(col("preferred_curie").isNotNull)
    withId
      .join(lookups,
        StringOps.withPrefix(Constants.DbPrefix, col("drug_bank_id"))
          === lookups("input"))
      .select(
        col("preferred_curie").as("kg2_id"),
        col("preferred_name").as("name"),
        col("preferred_category").as("category"),
        col("drug_bank_id"),
        col("description"),
        col("indication"),
        col("pharmacodynamics"),
        col("mechanism-of-action").as("mechanism_of_action"),
        col("metabolism"),
        col("protein-binding").as("protein_binding"),
        crawlBioentities("transporter").as("transporters"),
        crawlBioentities("enzyme").as("enzymes"),
        crawlBioentities("target").as("targets"),
        crawlBioentities("carrier").as("carriers"),
        crawlPathways.as("pathways"))
      .groupBy("kg2_id")
      // tie-break on the FULL record (struct ordering), not just
      // drug_bank_id — two entries sharing kg2_id AND drug_bank_id (e.g.
      // concatenated dumps) would otherwise pick a partition-order-
      // dependent winner
      .agg(max(struct(col("drug_bank_id").as("k"), struct(col("*")).as("r")))
        .as("m"))
      .select(col("m.r.*"))
  }
}
