package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The DECODE step is a clearly-marked STUB (no image/audio codecs in
  * this environment): it derives deterministic pseudo-features from
  * the raw bytes. Everything around it — binary schema, encoders,
  * partition-wise batching, explode of per-frame rows — is the real
  * distributed shape: swap `stubDecode`/`stubFrames` for a codec call
  * and nothing else changes.
  */
object Multimodal {

  /** One decoded media asset (stub features). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      fp: String,       // md5 hex of the payload
      width: Int,       // STUB: derived from byte 0
      height: Int)      // STUB: derived from byte 1

  case class Frame(doc_id: Long, frame_idx: Int, frame_fp: String)

  private def md5hex(b: Array[Byte], from: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(b, from, len)
    d.digest().map("%02x".format(_)).mkString
  }

  /** STUB decode: a real implementation would hand `bytes` to an
    * image codec; here features are deterministic functions of the
    * payload so the distributed plumbing is testable end-to-end.
    */
  private def stubDecode(id: Long, bytes: Array[Byte]): MediaFeatures =
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length,
      fp = md5hex(bytes, 0, bytes.length),
      width = (if (bytes.nonEmpty) bytes(0) & 0xFF else 0) % 640,
      height = (if (bytes.length > 1) bytes(1) & 0xFF else 0) % 480)

  /** Batch feature extraction over a binary column. Partition-wise
    * (`mapPartitions`): at scale each task decodes its partition's
    * blobs without any shuffle; output is a columnar typed Dataset.
    */
  def extractFeatures(df: DataFrame, idCol: String,
      binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        stubDecode(id, Option(bytes).getOrElse(Array.emptyByteArray))
      })
  }

  /** STUB frame sampling: treats the payload as fixed-size 64-byte
    * "frames" (a real implementation samples video frames); one
    * output row per frame.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = Option(bytes).getOrElse(Array.emptyByteArray)
        (0 until b.length / frameBytes).iterator.map { i =>
          Frame(id, i, md5hex(b, i * frameBytes, frameBytes))
        }
      }
  }
}
