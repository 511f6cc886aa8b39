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

  final case class FrameFeatures(doc_id: Long, frame_idx: Long, n_bytes: Long,
      features: Array[Float])

  /** STUB frame sampling: the payload is treated as consecutive fixed-size
    * "frames" (a real implementation would run a video demuxer per
    * partition, amortized like the decoder above); every `stride`-th frame
    * is decoded into the same 8-bucket byte-histogram features. The fan-out
    * shape (one input row -> many frame rows via an iterator, no
    * materialized intermediate collection per doc) is the real contract for
    * a 100 TB video corpus. */
  def fakeFrameSample(spark: SparkSession, media: Dataset[MediaRow],
      frameBytes: Int = 64, stride: Int = 2): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        // ceil: the trailing partial frame is still a frame
        val nFrames = math.max(1, (r.media.length + frameBytes - 1) / frameBytes)
        Iterator.range(0, nFrames, stride).map { fi =>
          val start = fi * frameBytes
          val end = math.min(start + frameBytes, r.media.length)
          val hist = new Array[Float](8)
          var i = start
          while (i < end) { hist((r.media(i) & 0xff) >> 5) += 1f; i += 1 }
          FrameFeatures(r.doc_id, fi.toLong, (end - start).toLong, hist)
        }
      }
    }
  }

  /** Resize analog: average-pool a feature vector down to `outDim` buckets —
    * the Spark-side shape of an image resize (the math is real; only the
    * pixels are fake). Declarative, so it fuses into the scan. */
  def poolFeatures(features: org.apache.spark.sql.Column, inDim: Int,
      outDim: Int): org.apache.spark.sql.Column = {
    require(inDim % outDim == 0, "inDim must divide by outDim")
    val w = inDim / outDim
    transform(sequence(lit(0), lit(outDim - 1)), b =>
      aggregate(slice(features, b * w + 1, lit(w)),
        lit(0.0), (acc, x) => acc + x.cast("double")) / w)
  }
}
