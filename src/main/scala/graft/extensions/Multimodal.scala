package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads
  * ride as opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs as a batched per-partition pass over the typed
  * Dataset (the Scala analogue of an arrow-batched Python UDF).
  *
  * The decode step itself is a STUB — media codecs aren't available in
  * this environment — implemented as a deterministic fake (byte
  * statistics standing in for pixel decoding). The Spark-side plumbing is
  * real and load-bearing: binary schema, per-partition batching,
  * column pruning (payload only read when features are computed), and a
  * fixed-width feature vector output ready for the Similarity operators.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            format: String, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, format: String,
                                 n_bytes: Long, header_sum: Long,
                                 features: Array[Float])

  /** Attach a synthetic media payload to the documents table (the
    * testdata carries no real media): payload = UTF-8 bytes of `text`,
    * format derived from the source column. At ingestion scale this
    * column is what an object-store loader would populate.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("img/"), col("source")).as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** STUB decode: deterministic fake feature extraction — an 8-bin byte
    * histogram normalized by length stands in for a real image decode +
    * embed. Runs per-partition over the typed Dataset so a real codec
    * drops in without touching the plumbing (batch shape, schema,
    * partitioning are exactly what a production decode needs).
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // ??? real decode goes here; deterministic fake below.
        val hist = new Array[Long](8)
        var headerSum = 0L
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xff
          hist(b % 8) += 1
          if (i < 8) headerSum += b
          i += 1
        }
        val n = math.max(1L, r.payload.length.toLong)
        MediaFeatures(r.doc_id, r.format, r.n_bytes, headerSum,
          hist.map(h => h.toFloat / n))
      }
    }
  }

  /** End-to-end: documents → payload → batched stub decode → features. */
  def documentFeatures(docs: DataFrame): Dataset[MediaFeatures] = {
    import docs.sparkSession.implicits._
    decodeFeatures(withPayload(docs).as[MediaRow])
  }

  final case class ResizedMedia(doc_id: Long, format: String,
                                n_bytes: Long, payload: Array[Byte])
  final case class Frame(doc_id: Long, frame_idx: Long,
                         payload: Array[Byte])

  /** STUB resize: deterministic payload downsampling (every k-th byte)
    * standing in for an image resample. Real plumbing: per-partition
    * batch pass, payload-typed in and out, metadata updated — a codec
    * drops in at the marked line.
    */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    require(factor > 0, "factor must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        // ??? real resample goes here; deterministic fake below.
        val out = Array.tabulate(
          math.max(1, r.payload.length / factor))(i => r.payload(i * factor))
        ResizedMedia(r.doc_id, r.format + s";x1/$factor", out.length.toLong,
                     out)
      }
    }
  }

  /** STUB frame sampling: split the payload into fixed-size chunks and
    * keep every `stride`-th chunk — the batch shape of video frame
    * extraction (one input row → N frame rows, explode-like fan-out
    * with per-frame index metadata).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
                   stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && stride > 0, "frameBytes/stride must be positive")
    media.flatMap { r =>
      // ??? real frame decode goes here; deterministic chunking below.
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0L until nFrames by stride).map { f =>
        val start = (f * frameBytes).toInt
        val end = math.min(start + frameBytes, r.payload.length)
        Frame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, start, end))
      }
    }
  }
}
