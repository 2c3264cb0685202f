package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, processed by iterator-based partition functions
  * (the Scala analog of `mapInPandas`: one decoder instance per
  * partition, streaming batches, no per-row setup cost).
  *
  * Decode is dispatched on the mime tag, and both media paths are REAL:
  * image-mime payloads decode through the in-JDK `javax.imageio` readers
  * (PNG/JPEG/BMP/GIF — zero external dependencies, [[decodeImage]]), and
  * video-mime payloads decode through the same readers' multi-frame API
  * ([[decodeVideo]]: `ImageReader.getNumImages(true)` + per-frame
  * dimensions — an animated GIF is a genuine multi-frame container, the
  * closest real video format the JDK can read without external codecs;
  * an MP4/H.264 payload fails honestly instead of returning fake
  * numbers). Only non-media mimes (e.g. `text/plain` stand-in payloads)
  * take [[byteStatsFallback]], a declared deterministic pseudo-decode.
  * The plumbing is format-agnostic: the binary-column schema, the
  * `Dataset[T]` encoder work, per-partition batching, and the explode
  * path for frame sampling are identical whatever codec sits behind
  * [[decode]].
  */
object Multimodal {

  // ImageIO's default caching wraps every input stream in a
  // FileCacheImageInputStream — a temp file written+deleted on disk PER
  // ROW even though our payloads are already in-memory byte arrays.
  // Static JVM-wide switch; the object initializer runs once per
  // executor JVM on first use.
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: id + raw bytes + mime tag. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte], mime: String)

  /** Extracted per-media features (decoded dimensions + frame count). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Deterministic pseudo-features for NON-MEDIA payloads (a text/plain
    * stand-in column): dimensions/frame-count derived from the byte
    * payload so the pipeline shape can be graded without binary
    * fixtures. Media mimes never route here — images decode via
    * [[decodeImage]], video via [[decodeVideo]], both real.
    */
  def byteStatsFallback(content: Array[Byte]): (Int, Int, Int) = {
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

  /** REAL multi-frame (video) decode via the in-JDK `javax.imageio`
    * multi-image API: finds a reader for the container bytes, counts the
    * frames with an exhaustive forward scan (`getNumImages(true)` — the
    * GIF reader walks every image block), and reports frame-0
    * dimensions. Animated GIF is the multi-frame container the JDK ships
    * a real decoder for; payloads no installed reader understands (e.g.
    * MP4 in this container) are rejected with a clear error instead of
    * fake numbers.
    */
  def decodeVideo(content: Array[Byte]): (Int, Int, Int) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable media container")
      val reader = readers.next()
      // seekForwardOnly=false: getNumImages(true) needs random access.
      reader.setInput(iis, false, true)
      try {
        val frames = reader.getNumImages(true)
        require(frames >= 1, "media container holds no frames")
        (reader.getWidth(0), reader.getHeight(0), frames)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Mime-dispatched decode: image and video mimes decode for real;
    * non-media payloads take the declared byte-stats fallback.
    */
  def decode(content: Array[Byte], mime: String): (Int, Int, Int) =
    if (mime != null && mime.startsWith("image/")) decodeImage(content)
    else if (mime != null && mime.startsWith("video/")) decodeVideo(content)
    else byteStatsFallback(content)

  /** Deterministic synthetic PNG (TYPE_INT_RGB; each pixel a pure
    * function of (seed, x, y)), generated executor-side — graded
    * image-decode queries need no binary fixtures, and the oracle can
    * mirror the dimension formulas as literals.
    */
  private def syntheticRaster(width: Int, height: Int, seed: Long): java.awt.image.BufferedImage = {
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
    img
  }

  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(syntheticRaster(width, height, seed), "png", bos)
    bos.toByteArray
  }

  /** splitmix64 finalizer — the per-pixel scrambler for
    * [[syntheticTexturePng]]/[[syntheticTextureBmp]].
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** HIGH-ENTROPY deterministic raster (every pixel an independent-ish
    * 24-bit scramble of (seed, x, y)) — [[syntheticRaster]]'s near-linear
    * gradient collapses 8×8 cell averages toward the global mean, which
    * makes [[aHash64]] bits near-ties and COLLIDES distinct images; a
    * texture raster gives each cell an independent random sum, so
    * distinct seeds get distinct hashes with ~2⁻⁶⁴ collision odds.
    * The perceptual-dedup fixtures use these; the decode-dimension
    * fixtures keep the original gradient (their grade never reads
    * pixels).
    */
  private def syntheticTexture(width: Int, height: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y,
          (mix64(seed * 1000003L + y.toLong * width + x) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  def syntheticTexturePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(syntheticTexture(width, height, seed), "png", bos)
    bos.toByteArray
  }

  /** The SAME deterministic raster as [[syntheticPng]] in a different
    * lossless container (24-bit BMP): byte-level digests differ, decoded
    * pixels are identical — the test article for CONTENT-level image
    * dedup ([[aHash64]]), which byte-hash dedup provably cannot catch.
    */
  def syntheticTextureBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(syntheticTexture(width, height, seed), "bmp", bos)
    bos.toByteArray
  }

  /** The texture raster with `flips` pixels inverted (deterministic
    * positions) — a NEAR-duplicate of [[syntheticTextureBmp]]'s image:
    * byte-distinct, pixel-close, so its [[aHash64]] sits a few Hamming
    * bits away instead of equal. The planted article for banded
    * image near-dup search (qn79).
    */
  def syntheticTexturePerturbedBmp(
      width: Int, height: Int, seed: Long, flips: Int): Array[Byte] = {
    val img = syntheticTexture(width, height, seed)
    var i = 0
    while (i < flips) {
      val x = i % width
      val y = (i * 2 + 1) % height
      img.setRGB(x, y, img.getRGB(x, y) ^ 0xFFFFFF)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash — the classic perceptual image hash:
    * downscale, grayscale, threshold at the mean, pack bits) computed
    * with INTEGER-EXACT arithmetic so the value is bit-reproducible
    * across JVMs and executors: grayscale = 299r+587g+114b (scaled,
    * never divided), average-pooled onto an 8×8 grid with floor-boundary
    * blocks, and each bit set by the cross-multiplied exact comparison
    * `cellSum·totalPixels > totalSum·cellPixels` (i.e. cell mean >
    * GLOBAL pixel mean — no float division anywhere). Any lossless
    * re-encode of the same pixels (PNG↔BMP) hashes identically;
    * near-duplicate pixels differ in few bits, so Hamming banding (the
    * qn04 SimHash machinery) extends this to near-dup search.
    */
  def aHash64(content: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "aHash64: undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
          114L * (rgb & 0xFF)
        val cell = by * 8 + x * 8 / w
        sums(cell) += gray
        counts(cell) += 1
        totalSum += gray
        x += 1
      }
      y += 1
    }
    val totalPixels = w.toLong * h
    // The cross-multiplied comparison stays inside Long up to ~40M
    // pixels (255000·P·(P/64) < 2^63); past that, exact BigInt — still
    // no float division on any path.
    val big = totalPixels > 40000000L
    var bits = 0L
    var i = 0
    while (i < 64) {
      // Empty cells (w or h < 8) stay 0 — deterministic either way.
      val set = counts(i) > 0 && {
        if (big) BigInt(sums(i)) * totalPixels > BigInt(totalSum) * counts(i)
        else sums(i) * totalPixels > totalSum * counts(i)
      }
      if (set) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** One perceptual-identity row per media payload. */
  final case class MediaHash(doc_id: Long, phash: Long, digest: String)

  /** Perceptual hash + byte digest per row — the inputs to content-level
    * image dedup (group/band on `phash`, count encodings via `digest`).
    * Same iterator-based partition shape as [[extractFeatures]].
    */
  def perceptualHashes(media: DataFrame): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.select("doc_id", "content").as[(Long, Array[Byte])](
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, content) =>
          md.reset()
          val digest = md.digest(content).map("%02x".format(_)).mkString
          MediaHash(id, aHash64(content), digest)
        }
      }
  }

  /** Deterministic synthetic ANIMATED GIF: `nFrames` frames of
    * `width`×`height`, each pixel a pure function of (seed, frame, x, y),
    * written through the JDK GIF writer's sequence API
    * (`prepareWriteSequence`/`writeToSequence`) — a real multi-frame
    * container, generated executor-side so graded video-decode queries
    * need no binary fixtures and the oracle can state the frame-count
    * and dimension formulas as literals.
    */
  def syntheticGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            img.setRGB(x, y,
              (((seed * 1315423911L + f.toLong * 7919L + y.toLong * width + x) * 2654435761L)
                & 0xFFFFFF).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Per-FRAME features from a decoded frame's actual pixels. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      pix_checksum: Long)

  /** REAL per-frame decode: `ImageReader.read(i)` every frame of the
    * container and reduce its PIXELS to a position-weighted checksum
    * (Σ value·(y·w+x+1) over the blue channel) — the per-frame payload
    * [[sampleFrames]]'s count-based explode never touched. Works for any
    * `javax.imageio` container (a PNG is the 1-frame case); payloads no
    * reader understands are rejected.
    */
  def decodeVideoFrames(content: Array[Byte]): Seq[(Int, Int, Int, Long)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable media container")
      val reader = readers.next()
      reader.setInput(iis, false, true)
      try {
        val frames = reader.getNumImages(true)
        require(frames >= 1, "media container holds no frames")
        (0 until frames).map { i =>
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              sum += (img.getRGB(x, y) & 0xFF).toLong * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          (i, w, h, sum)
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Per-partition per-frame extraction: one reader pipeline per
    * partition, each media row exploding into its decoded frames WITH
    * their pixel payloads reduced to features — the real generator/UDTF
    * shape of a video pipeline (vs [[sampleFrames]], which explodes on
    * the frame count alone).
    */
  def extractFrameFeatures(media: DataFrame): Dataset[FrameFeatures] = {
    implicit val enc = Encoders.product[FrameFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeVideoFrames(r.content).map { case (i, w, h, sum) =>
          FrameFeatures(r.doc_id, i, w, h, sum)
        }
      }
    }
  }

  /** Deterministic synthetic animated GIF with an EXPLICIT 256-gray
    * indexed palette, so GIF encoding is pixel-LOSSLESS (the RGB variant
    * [[syntheticGif]] gets palette-quantized by the writer, making
    * decoded pixel values unstateable): pixel value =
    * (seed·131 + frame·31 + y·width + x·7) mod 251 — small-term integer
    * math an oracle reproduces exactly (and 64-bit-overflow-free on both
    * engines). Graded per-frame queries state the resulting
    * position-weighted checksum ([[decodeVideoFrames]]) in SQL from this
    * formula alone.
    */
  def syntheticGifIndexed(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val grays = Array.tabulate(256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              ((seed * 131 + f * 31 + y.toLong * width + x * 7) % 251).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Deterministic multi-scene GIF (same lossless 256-gray indexed
    * palette as [[syntheticGifIndexed]]): frame `f` belongs to scene
    * `f / sceneLen`, and its pixel value is
    * `(seed·131 + scene·97 + y·width + x·7 + fInScene) mod 251`.
    * Within a scene, consecutive frames differ by +1 (mod 251) per
    * pixel — mean |Δ| ≈ 2 (the wrap pixels contribute 250 each at
    * ~1/251 density); across a scene boundary every pixel shifts by
    * `97 − sceneLen + 1` (mod 251), so for any sceneLen ≤ 77 the
    * boundary mean |Δ| is ≥ 20 by construction. The gap makes the
    * [[sceneCuts]] threshold provably separating, not fixture luck.
    */
  def syntheticSceneGif(
      width: Int, height: Int, sceneLen: Int, nScenes: Int, seed: Long): Array[Byte] = {
    require(sceneLen >= 1 && nScenes >= 1)
    val grays = Array.tabulate(256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < sceneLen * nScenes) {
        val scene = f / sceneLen
        val fIn = f % sceneLen
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0,
              ((seed * 131 + scene * 97 + y.toLong * width + x * 7 + fIn) % 251).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** One consecutive-frame luminance delta: `sum_abs_delta` is
    * Σ |blue(f) − blue(f−1)| over all pixels, `frame_idx` the LATER
    * frame.
    */
  final case class FrameDelta(
      doc_id: Long, frame_idx: Int, sum_abs_delta: Long, n_pixels: Long)

  /** Decode every frame and reduce each consecutive pair to its total
    * absolute blue-channel delta — the temporal-derivative signal under
    * shot-boundary detection. Integer-exact (sums of |byte − byte|), so
    * the result is bit-identical on any executor.
    */
  def decodeFrameDeltas(content: Array[Byte]): Seq[(Int, Long, Long)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable media container")
      val reader = readers.next()
      reader.setInput(iis, false, true)
      try {
        val frames = reader.getNumImages(true)
        require(frames >= 1, "media container holds no frames")
        var prev: Array[Int] = null
        val out = Seq.newBuilder[(Int, Long, Long)]
        var i = 0
        while (i < frames) {
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          val cur = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              cur(y * w + x) = img.getRGB(x, y) & 0xFF
              x += 1
            }
            y += 1
          }
          if (prev != null) {
            require(prev.length == cur.length,
              "frame dimensions changed mid-container")
            var sum = 0L
            var j = 0
            while (j < cur.length) {
              sum += math.abs(cur(j) - prev(j)).toLong
              j += 1
            }
            out += ((i, sum, cur.length.toLong))
          }
          prev = cur
          i += 1
        }
        out.result()
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Per-partition frame-delta extraction (one decoder pipeline per
    * partition, same shape as [[extractFrameFeatures]]).
    */
  def frameDeltas(media: DataFrame): Dataset[FrameDelta] = {
    implicit val enc = Encoders.product[FrameDelta]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeFrameDeltas(r.content).map { case (i, sum, npix) =>
          FrameDelta(r.doc_id, i, sum, npix)
        }
      }
    }
  }

  /** Shot-boundary (scene-cut) detection: a frame is a cut when its
    * mean absolute delta from the previous frame exceeds `threshold`
    * gray levels — stated as the integer comparison
    * `sum_abs_delta > threshold · n_pixels`, so the decision is exact.
    * The temporal-segmentation pass a video curation pipeline runs
    * before sampling one representative frame per shot; downstream of
    * the cut list, shot sampling is a plain `min(frame_idx)` per
    * (doc, shot) group. Shape at scale: decode runs per-partition with
    * no shuffle — only (id, frame_idx, two longs) rows leave the
    * scan; video bytes never cross an exchange.
    */
  def sceneCuts(media: DataFrame, threshold: Int = 20): DataFrame =
    frameDeltas(media).toDF()
      .where(col("sum_abs_delta") > lit(threshold.toLong) * col("n_pixels"))
      .select(col("doc_id"), col("frame_idx").as("cut_frame"))

  /** Deterministic 8-bit gray PNG: pixel =
    * `(seed·131 + y·width + x·7) mod 251` — the single-frame sibling of
    * [[syntheticGifIndexed]]'s formula, so graded resize/decode queries
    * can state every pixel in SQL. The PNG writer may emit this as a
    * true-grayscale image (it detects the all-gray palette), whose
    * Java2D `getRGB` path gamma-converts linear gray to sRGB — readers
    * needing the exact samples must take the raw raster path, as
    * [[thumbnailChecksum]] does.
    */
  def syntheticGrayPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val grays = Array.tabulate(256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, ((seed * 131 + y.toLong * width + x * 7) % 251).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode + nearest-neighbor resize to `outW`×`outH`, reduced to the
    * position-weighted checksum Σ value·(y·outW+x+1) over the LUMINANCE
    * (blue) channel. Nearest-neighbor on purpose: source pixel
    * `(⌊x·w/outW⌋, ⌊y·h/outH⌋)` is pure integer math, so the thumbnail
    * is bit-identical on every executor and stateable by an oracle —
    * area/bilinear filters are float-blend-order territory and belong
    * behind a declared-approximate variant. This is the "resize" leg of
    * the multimodal plumbing (decode / feature-extract / resize /
    * frame-sample): a real `javax.imageio` decode feeds a real
    * resample, and only (id, checksum) rows leave the partition.
    */
  def thumbnailChecksum(content: Array[Byte], outW: Int, outH: Int): Long = {
    require(outW >= 1 && outH >= 1)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    val img =
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "payload is not a decodable image")
        val reader = readers.next()
        reader.setInput(iis, false, true)
        try reader.read(0) finally reader.dispose()
      } finally iis.close()
    val (w, h) = (img.getWidth, img.getHeight)
    // Grayscale images (1 color component, e.g. a gray PNG) must read
    // the RAW raster sample: their getRGB path converts linear gray to
    // sRGB (gamma), silently changing every value. Palette and RGB
    // images read the blue channel via getRGB as elsewhere.
    val gray = img.getColorModel.getNumComponents == 1
    def px(x: Int, y: Int): Int =
      if (gray) img.getRaster.getSample(x, y, 0) else img.getRGB(x, y) & 0xFF
    var sum = 0L
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        sum += px(sx, sy).toLong * (y.toLong * outW + x + 1)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Per-partition thumbnail pass over a media table. */
  def imageThumbnails(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    implicit val inEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map(r => (r.doc_id, thumbnailChecksum(r.content, outW, outH)))
    }.toDF("doc_id", "thumb_checksum")
  }

  /** Shot segmentation + representative-frame selection: frames between
    * consecutive [[sceneCuts]] boundaries form a shot (`shot_id` counts
    * boundaries so far, frame 0 opens shot 0), and each shot reports
    * its first frame as the representative — the standard "one frame
    * per shot" sampling a VLM training pipeline runs instead of
    * fixed-stride frame grabs (stride sampling over-represents long
    * static shots and can miss short ones entirely).
    *
    * Shape at scale: one per-partition decode (no media bytes shuffle),
    * then a per-video running-sum window and a (video, shot) aggregate
    * — both partitioned by `doc_id`, so there is no global sort and a
    * video's frames (tens to thousands of rows) are one task's work.
    * Output: (doc_id, shot_id, rep_frame, n_frames).
    */
  def shotFrames(media: DataFrame, threshold: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cuts = frameDeltas(media).toDF()
      .select(col("doc_id"), col("frame_idx"),
        (col("sum_abs_delta") > lit(threshold.toLong) * col("n_pixels"))
          .as("is_cut"))
    // Frame 0 exists for every decodable payload (decode requires >= 1
    // frame) and never opens on a cut.
    val frame0 = media.select(col("doc_id").cast("long").as("doc_id"),
      lit(0).as("frame_idx"), lit(false).as("is_cut"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame0.unionByName(cuts)
      .withColumn("shot_id",
        sum(when(col("is_cut"), 1L).otherwise(0L)).over(w).cast("int"))
      .groupBy("doc_id", "shot_id")
      .agg(min("frame_idx").as("rep_frame"), count(lit(1)).as("n_frames"))
  }

  /** Extracted per-audio features (decoded format + PCM payload). */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      pcm_checksum: Long)

  /** REAL audio decode via the in-JDK `javax.sound.sampled` readers
    * (WAV/AIFF/AU PCM — no external codec dependency): parse the
    * container, stream the decoded PCM, and reduce the actual 16-bit
    * little-endian samples to a position-weighted checksum
    * (Σ sample·(i+1)). Payloads no installed reader understands (MP3 in
    * this container) are rejected with a clear error, mirroring
    * [[decodeVideo]]'s honesty contract.
    */
  def decodeAudio(content: Array[Byte]): (Int, Int, Long, Long) = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException("payload is not a decodable audio container", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"expected 16-bit PCM, got $fmt")
      // Both endiannesses decode (WAV is LE; AIFF/AU are BE — the doc
      // promises all three and the old LE-only require contradicted it).
      val be = fmt.isBigEndian
      val buf = ais.readAllBytes()
      // n_samples counts what the checksum walks: TOTAL samples across
      // channels from the decoded bytes (for mono, = frame count).
      // getFrameLength would report frames (half the checksummed values
      // on stereo — an internally inconsistent pair) and can be
      // NOT_SPECIFIED (-1) for streamed formats.
      val samples = buf.length / 2
      var sum = 0L
      var i = 0
      while (i < samples) {
        val v =
          if (be) (((buf(2 * i) & 0xFF) << 8) | (buf(2 * i + 1) & 0xFF)).toShort.toLong
          else (((buf(2 * i + 1) & 0xFF) << 8) | (buf(2 * i) & 0xFF)).toShort.toLong
        sum += v * (i + 1)
        i += 1
      }
      (fmt.getSampleRate.toInt, fmt.getChannels, samples.toLong, sum)
    } finally ais.close()
  }

  /** Per-partition audio extraction: one decode pipeline per partition,
    * each row's PCM reduced executor-side — the audio leg of the
    * multimodal feature family (images [[extractFeatures]], video
    * frames [[extractFrameFeatures]]).
    */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    implicit val enc = Encoders.product[AudioFeatures]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, n, sum) = decodeAudio(r.content)
        AudioFeatures(r.doc_id, rate, ch, n, sum)
      }
    }
  }

  /** Deterministic synthetic WAV: 16-bit little-endian mono PCM, sample
    * i = (seed·131 + i·7) mod 4001 − 2000 — small-term integer math an
    * oracle reproduces exactly — written through the JDK WAV writer.
    * The PCM round-trips bit-exact (WAV is uncompressed), so graded
    * audio queries state the decoded checksum in SQL from this formula
    * alone, the audio analog of [[syntheticGifIndexed]].
    */
  def syntheticWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = ((seed * 131 + i.toLong * 7) % 4001 - 2000).toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  private def writeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  private def noiseSamples(nSamples: Int, seed: Long, gain: Int): Array[Short] =
    Array.tabulate(nSamples)(i =>
      ((mix64(seed * 1000003L + i) % 2001L).toInt * gain).toShort)

  /** HIGH-ENTROPY deterministic 16-bit mono WAV (splitmix-scrambled
    * samples in ±2000·gain) — the audio analog of the texture raster:
    * [[syntheticWav]]'s near-linear sawtooth makes window energies
    * near-ties (the [[aHash64]] gradient lesson), noise makes every
    * [[audioEnergyHash64]] window sum independent. `gain` scales every
    * sample exactly, so gain≠1 produces a byte-distinct payload with an
    * IDENTICAL energy hash (all comparisons scale by gain²) — the
    * planted article for volume-invariant audio dedup (qn80).
    */
  def syntheticNoiseWav(nSamples: Int, sampleRate: Int, seed: Long, gain: Int = 1): Array[Byte] =
    writeWav(noiseSamples(nSamples, seed, gain), sampleRate)

  /** 64-bit volume-invariant audio fingerprint: decode 16-bit PCM (both
    * endiannesses, like [[decodeAudio]]), split the sample stream into
    * 64 floor-boundary windows, and set bit i iff window i's ENERGY
    * (Σ v², integer-exact) exceeds the global mean energy via the
    * cross-multiplied comparison `winSum·totalSamples >
    * totalSum·winSamples` — no float division, bit-reproducible across
    * executors, and invariant under exact amplitude scaling (both sides
    * scale by gain²). Same Hamming-banding extension as [[aHash64]]
    * (the qn04 Manku machinery) for NEAR-matches.
    */
  /** [[syntheticNoiseWav]] with PLANTED silence: the samples of every
    * window in `silentRuns` (given as (startWindow, nWindows) in
    * `windowLen`-sample windows) are zeroed — the ground-truth article
    * for silence-trimming detection.
    */
  def syntheticSpeechWav(
      windowLen: Int, nWindows: Int, sampleRate: Int, seed: Long,
      silentRuns: Seq[(Int, Int)]): Array[Byte] = {
    val s = noiseSamples(windowLen * nWindows, seed, 1)
    silentRuns.foreach { case (start, n) =>
      require(start >= 0 && start + n <= nWindows, s"run ($start,$n) out of range")
      java.util.Arrays.fill(s, start * windowLen, (start + n) * windowLen, 0.toShort)
    }
    writeWav(s, sampleRate)
  }

  /** Maximal runs of silent `windowLen`-sample windows (a window is
    * silent when max |sample| ≤ `maxAbs`), as (startWindow, nWindows)
    * pairs — the voice-activity segmentation a speech pipeline runs to
    * trim silence before paying tokenizer/encoder cost for it. Only
    * full windows are classified (a trailing partial window is
    * ignored); the run merge happens inside the decode loop, so per
    * audio only the run list leaves the partition. Integer-exact.
    */
  def decodeSilentRuns(
      content: Array[Byte], windowLen: Int, maxAbs: Int = 0): Seq[(Int, Int)] = {
    require(windowLen >= 1)
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException("payload is not a decodable audio container", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
      val be = fmt.isBigEndian
      val buf = ais.readAllBytes()
      val samples = buf.length / 2
      def sample(i: Int): Int =
        if (be) (((buf(2 * i) & 0xFF) << 8) | (buf(2 * i + 1) & 0xFF)).toShort.toInt
        else (((buf(2 * i + 1) & 0xFF) << 8) | (buf(2 * i) & 0xFF)).toShort.toInt
      val nWindows = samples / windowLen
      val out = Seq.newBuilder[(Int, Int)]
      var runStart = -1
      var w = 0
      while (w < nWindows) {
        var peak = 0
        var i = w * windowLen
        val end = i + windowLen
        while (i < end) {
          val a = math.abs(sample(i))
          if (a > peak) peak = a
          i += 1
        }
        if (peak <= maxAbs) { if (runStart < 0) runStart = w }
        else if (runStart >= 0) { out += ((runStart, w - runStart)); runStart = -1 }
        w += 1
      }
      if (runStart >= 0) out += ((runStart, nWindows - runStart))
      out.result()
    } finally ais.close()
  }

  /** Decode + decimate-by-`k` resample, reduced to the position-weighted
    * checksum Σ sample·(j+1) over the kept samples (indices 0, k, 2k …)
    * — the audio leg of the resize plumbing (qn88 is the image leg).
    * Plain decimation by contract: it is integer-exact and
    * oracle-stateable; a production resampler low-passes before
    * decimating (float filter territory) and belongs behind a
    * declared-approximate variant, exactly like bilinear image
    * filters. Returns (outputSampleRate, nKept, checksum).
    */
  def audioDecimateChecksum(content: Array[Byte], k: Int): (Int, Long, Long) = {
    require(k >= 1, "decimation factor must be >= 1")
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException("payload is not a decodable audio container", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
      val be = fmt.isBigEndian
      val buf = ais.readAllBytes()
      val samples = buf.length / 2
      var sum = 0L
      var j = 0L
      var i = 0
      while (i < samples) {
        val v =
          if (be) (((buf(2 * i) & 0xFF) << 8) | (buf(2 * i + 1) & 0xFF)).toShort.toLong
          else (((buf(2 * i + 1) & 0xFF) << 8) | (buf(2 * i) & 0xFF)).toShort.toLong
        sum += v * (j + 1)
        j += 1
        i += k
      }
      (fmt.getSampleRate.toInt / k, j, sum)
    } finally ais.close()
  }

  /** One silent segment of one audio row. */
  final case class SilenceRun(doc_id: Long, start_window: Int, n_windows: Long)

  /** Per-partition silence segmentation over a media table. */
  def audioSilenceRuns(
      media: DataFrame, windowLen: Int, maxAbs: Int = 0): Dataset[SilenceRun] = {
    implicit val enc = Encoders.product[SilenceRun]
    implicit val inEnc = Encoders.product[MediaRecord]
    media.as[MediaRecord].mapPartitions { rows =>
      rows.flatMap { r =>
        decodeSilentRuns(r.content, windowLen, maxAbs).map { case (s, n) =>
          SilenceRun(r.doc_id, s, n.toLong)
        }
      }
    }
  }

  def audioEnergyHash64(content: Array[Byte]): Long = {
    val ais =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException("payload is not a decodable audio container", e)
      }
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
      val be = fmt.isBigEndian
      val buf = ais.readAllBytes()
      val samples = buf.length / 2
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var totalSum = 0L
      var i = 0
      while (i < samples) {
        val v =
          if (be) (((buf(2 * i) & 0xFF) << 8) | (buf(2 * i + 1) & 0xFF)).toShort.toLong
          else (((buf(2 * i + 1) & 0xFF) << 8) | (buf(2 * i) & 0xFF)).toShort.toLong
        val w = (i.toLong * 64 / samples).toInt
        val e = v * v
        sums(w) += e
        counts(w) += 1
        totalSum += e
        i += 1
      }
      // Long-safe up to ~500k samples (max energy 2^30 per sample);
      // past that, exact BigInt (no float division on any path).
      val big = samples > 500000
      var bits = 0L
      var j = 0
      while (j < 64) {
        val set = counts(j) > 0 && {
          if (big) BigInt(sums(j)) * samples > BigInt(totalSum) * counts(j)
          else sums(j) * samples > totalSum * counts(j)
        }
        if (set) bits |= (1L << j)
        j += 1
      }
      bits
    } finally ais.close()
  }

  /** [[MediaHash]] rows for audio payloads ([[audioEnergyHash64]] +
    * byte digest) — the audio leg of content-level dedup.
    */
  def audioHashes(media: DataFrame): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.select("doc_id", "content").as[(Long, Array[Byte])](
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, content) =>
          md.reset()
          val digest = md.digest(content).map("%02x".format(_)).mkString
          MediaHash(id, audioEnergyHash64(content), digest)
        }
      }
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

  /** Frame sampling: explode each media item into its decoded frames —
    * the generator/UDTF path of a video pipeline.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1)))
      .select(col("doc_id"), col("col").as("frame_idx"))
}
