package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition.
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in
  * this environment): [[FakeDecoder]] produces deterministic features
  * from the bytes. Everything around it — schema, encoder, partition
  * batching, the mapPartitions pipeline shape — is the real Spark
  * plumbing a production decoder would drop into. */
object Multimodal {

  /** One media row: payload + format tag + source metadata. */
  final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
      width: Int, height: Int, checksum: Long)

  /** STUB decoder: deterministic pseudo-features derived from the raw
    * bytes. A real implementation would decode the image/audio frame
    * here (e.g. via a JNI codec); the signature — bytes in, fixed
    * feature struct out, called once per row inside a partition batch —
    * is exactly what the real one needs. */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum = sum * 31 + (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(r.doc_id, r.fmt, n.toLong,
        width = (math.abs(sum) % 640).toInt + 1,
        height = (math.abs(sum / 640) % 480).toInt + 1,
        checksum = sum)
    }
  }

  /** Wrap a text table as a binary media table (payload = UTF-8 bytes;
    * in production this column holds the encoded image/audio). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg").otherwise("wav").as("fmt"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Feature-extraction pipeline: Dataset-typed mapPartitions so the
    * (heavyweight, real-world) decoder initializes once per partition,
    * not per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init happens here in a real decoder
      it.map(FakeDecoder.decode)
    }
  }
}
