package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, processed by iterator-based partition functions
  * (the Scala analog of `mapInPandas`: one decoder instance per
  * partition, streaming batches, no per-row setup cost).
  *
  * Decode is dispatched on the mime tag: image-mime payloads decode FOR
  * REAL through the in-JDK `javax.imageio` readers (PNG/JPEG/BMP/GIF —
  * zero external dependencies, [[decodeImage]]); video/audio mimes stay
  * on [[decodeStub]], a deterministic fake, because those codecs
  * genuinely are not in this container. Everything around the decoders
  * is real and load-bearing: the binary-column schema, the `Dataset[T]`
  * encoder plumbing, per-partition batching, and the explode path for
  * frame sampling. Swapping the stub for ffmpeg changes no query shape.
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

  /** Deterministic fake decode for VIDEO/AUDIO payloads:
    * dimensions/frame-count derived from the byte payload. ??? -- replace
    * with a real codec (ffmpeg) when available; signature and batch shape
    * stay identical. Images do NOT go through this — see [[decodeImage]].
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    val n = content.length.toLong // Long math: n*31 overflows Int at ~69 MB
    ((64 + n % 577).toInt, (64 + (n * 31) % 411).toInt, (1 + n % 7).toInt)
  }

  /** REAL image decode via the in-JDK `javax.imageio` readers (PNG, JPEG,
    * BMP, GIF — no external codec dependency). Returns
    * (width, height, 1 frame); rejects undecodable payloads.
    */
  def decodeImage(content: Array[Byte]): (Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    (img.getWidth, img.getHeight, 1)
  }

  /** Mime-dispatched decode: image mimes decode for real, everything
    * else (video/audio) takes the declared stub.
    */
  def decode(content: Array[Byte], mime: String): (Int, Int, Int) =
    if (mime != null && mime.startsWith("image/")) decodeImage(content)
    else decodeStub(content)

  /** Deterministic synthetic PNG (TYPE_INT_RGB; each pixel a pure
    * function of (seed, x, y)), generated executor-side — graded
    * image-decode queries need no binary fixtures, and the oracle can
    * mirror the dimension formulas as literals.
    */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((seed * 1315423911L + y.toLong * width + x) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
        val (w, h, f) = decode(r.content, r.mime)
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
