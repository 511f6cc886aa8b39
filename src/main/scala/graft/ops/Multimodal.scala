package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): media payloads are
  * opaque `binary` columns traveling next to typed metadata; decode /
  * feature-extraction runs per-partition so one task amortizes codec setup
  * over a whole batch (the Spark-side shape of an image/audio pipeline).
  *
  * The actual codecs are NOT available in this environment, so
  * [[fakeDecodeFeatures]] is a clearly-marked deterministic STUB — the
  * schema, partitioning, batch shape and per-partition execution are real.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Float])

  /** Attach a binary media column (here: UTF-8 bytes standing in for an
    * encoded image/audio blob) plus typed metadata. */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  /** STUB decode + feature extraction. A real implementation would invoke an
    * image/audio codec here (per partition, reusing one decoder instance);
    * this container has no codec libraries, so features are a deterministic
    * function of the bytes (length + 8 byte-histogram buckets). The Spark
    * plumbing — typed Dataset, mapPartitions batch shape, schema — is real
    * and tested.
    */
  def fakeDecodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init of the (stub) "codec" happens once here
      rows.map { r =>
        val hist = new Array[Float](8)
        var i = 0
        while (i < r.media.length) { hist((r.media(i) & 0xff) >> 5) += 1f; i += 1 }
        MediaFeatures(r.doc_id, r.media.length.toLong, hist)
      }
    }
  }
}
