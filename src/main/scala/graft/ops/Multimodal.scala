package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, processed by iterator-based partition functions
  * (the Scala analog of `mapInPandas`: one decoder instance per
  * partition, streaming batches, no per-row setup cost).
  *
  * The actual media decode is STUBBED — image/audio codecs are not in
  * this container — behind [[decodeStub]], a deterministic fake that
  * derives "decoded" dimensions from the payload bytes. Everything
  * around it is real and load-bearing: the binary-column schema, the
  * `Dataset[T]` encoder plumbing, per-partition batching, and the
  * explode path for frame sampling. Swapping `decodeStub` for a real
  * codec changes no query shape.
  */
object Multimodal {

  /** A media row: id + raw bytes + mime tag. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte], mime: String)

  /** Extracted features (decode STUB output). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic fake decode: dimensions/frame-count derived from the
    * byte payload. ??? -- replace with a real codec (libjpeg/ffmpeg) when
    * available; signature and batch shape stay identical.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length.toLong // Long math: n*31 overflows Int at ~69 MB
    ((64 + n % 577).toInt, (64 + (n * 31) % 411).toInt, (1 + n % 7).toInt)
  }

  /** Attach a binary payload column (here: UTF-8 bytes of `textCol`, as a
    * stand-in for real media bytes read from a blob store).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit(mime).as("mime"))

  /** Per-partition feature extraction: one digest instance per partition,
    * rows streamed through it (the `mapInPandas` batch shape).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.content).map("%02x".format(_)).mkString
        val (w, h, f) = decodeStub(r.content)
        MediaFeatures(r.doc_id, r.content.length.toLong, digest, w, h, f)
      }
    }
  }

  /** Frame sampling: explode each media item into its (stub-)decoded
    * frames — the generator/UDTF path of a video pipeline.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("doc_id"), col("col").as("frame_idx"))
}
