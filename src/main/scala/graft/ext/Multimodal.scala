package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata.
  *
  * Two layers, deliberately separated:
  *
  *   1. Everything computable from the raw bytes WITHOUT a codec —
  *      sizes, fingerprints, header-byte fields, fixed-size frame
  *      slicing — is pure built-in expressions (`length`/`md5`/
  *      `substr`/`posexplode(sequence)`) so it stays inside
  *      whole-stage codegen and never deserializes rows out of
  *      Tungsten. (An earlier Dataset-encoder `flatMap` version of
  *      frame sampling benched 6x slower for identical output.)
  *   2. The DECODE step — the only part that genuinely needs
  *      imperative per-blob code — is a clearly-marked STUB behind
  *      `decodeWithCodec` (`mapPartitions`; no image/audio codecs in
  *      this environment). Swap `stubDecode` for a codec call and
  *      nothing else changes: schema, partitioning, and batch shape
  *      are the real distributed plumbing.
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

  case class Resized(doc_id: Long, width: Int, height: Int,
    out_w: Int, out_h: Int)

  /** Value of byte `pos` (1-based) of a binary column as 0..255
    * (0 when the payload is shorter) — a codegen'd expression, the
    * building block for header-field extraction.
    */
  def byteAt(bin: Column, pos: Int): Column =
    coalesce(conv(hex(substring(bin, pos, 1)), 16, 10).cast("int"), lit(0))

  /** Batch feature extraction over a binary column — all built-ins
    * (one codegen'd projection, shuffle-free). The width/height
    * fields stand in for codec-decoded header fields; real decode
    * lives behind `decodeWithCodec` below.
    */
  def extractFeatures(df: DataFrame, idCol: String,
      binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = col(binCol).cast("binary")
    df.select(
        col(idCol).cast("long").as("doc_id"),
        coalesce(length(b), lit(0)).cast("int").as("n_bytes"),
        md5(coalesce(b, lit(Array.emptyByteArray))).as("fp"),
        (byteAt(b, 1) % 640).as("width"),
        (byteAt(b, 2) % 480).as("height"))
      .as[MediaFeatures]
  }

  /** STUB frame sampling: treats the payload as fixed-size
    * `frameBytes` "frames" (a real implementation samples video
    * frames); one output row per frame.
    *
    * Shape: `posexplode` of a bounded `sequence` + binary `substr` +
    * `md5` — fully codegen'd, no encoder round-trip, and the
    * generator's output is skinny (id, idx, 32-char hex) regardless
    * of payload size.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 64): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    val b = col(binCol).cast("binary")
    df.select(col(idCol).cast("long").as("doc_id"), b.as("b"),
        floor(coalesce(length(b), lit(0)) / lit(frameBytes)).cast("int")
          .as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("b"))
      .select(col("doc_id"), col("frame_idx").cast("int"),
        md5(col("b").substr(
          col("frame_idx") * lit(frameBytes) + lit(1), lit(frameBytes)))
          .as("frame_fp"))
      .as[Frame]
  }

  // ---- codec seam ----

  private def md5hex(b: Array[Byte], from: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(b, from, len)
    d.digest().map("%02x".format(_)).mkString
  }

  /** STUB decode: a real implementation hands `bytes` to an image/
    * audio codec; here features are deterministic functions of the
    * payload so the seam is testable end-to-end.
    */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaFeatures =
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length,
      fp = md5hex(bytes, 0, bytes.length),
      width = (if (bytes.nonEmpty) bytes(0) & 0xFF else 0) % 640,
      height = (if (bytes.length > 1) bytes(1) & 0xFF else 0) % 480)

  // ---- real image-header decode (pure JVM, public formats) ----

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** (width, height) parsed from real image bytes — PNG IHDR and JPEG
    * SOF, both public formats, no codec library:
    *
    *   - PNG: 8-byte signature, then the IHDR chunk (always first):
    *     width = big-endian u32 at offset 16, height at 20.
    *   - JPEG: SOI (FFD8), then marker segments walked by their
    *     big-endian lengths; the first SOFn frame header (C0-CF minus
    *     C4/C8/CC) carries height at +5 and width at +7. Standalone
    *     markers (RSTn, TEM) have no length field and are skipped.
    *   - GIF: "GIF87a"/"GIF89a" signature, then the logical screen
    *     descriptor: width = little-endian u16 at offset 6, height
    *     at 8.
    *
    * None for anything else (or truncated/corrupt payloads) — decode
    * failures must be data, not exceptions, in a 100 TB pass.
    */
  def decodeImageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
        bytes(15) == 'R')
      Some((be32(16), be32(20)))
    else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some((le16(6), le16(8)))
    else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var p = 2
      while (p + 1 < bytes.length) {
        if (u8(p) != 0xFF) return None // lost marker sync
        // any run of 0xFF before the marker id is legal fill/padding
        // (B.1.1.2) — without the skip, 0xFF lands in the length
        // branch and misparses the segment
        while (p + 1 < bytes.length && u8(p + 1) == 0xFF) p += 1
        if (p + 1 >= bytes.length) return None
        val m = u8(p + 1)
        if (m == 0xD9) return None // EOI: image ended with no SOF
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) p += 2 // standalone
        else {
          if (p + 3 >= bytes.length) return None
          val len = be16(p + 2)
          if (len < 2 || p + 2 + len > bytes.length) return None
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
              m != 0xCC) {
            if (len < 7) return None
            return Some((be16(p + 7), be16(p + 5)))
          }
          p += 2 + len
        }
      }
      None
    } else None
  }

  /** REAL codec for `decodeWithCodec`: image dims from the actual
    * header bytes (0x0 for non-images) — the de-stubbed decode path.
    */
  def imageDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val (w, h) = decodeImageDims(bytes).getOrElse((0, 0))
    MediaFeatures(id, bytes.length, md5hex(bytes, 0, bytes.length), w, h)
  }

  /** Resize planning behind the codec seam: decodes the REAL header
    * dims, then computes the aspect-preserving fit into a
    * `maxDim`-square box with pure integer floor arithmetic
    * (`out = max(1, side * maxDim / longSide)` — no doubles, so the
    * target box is oracle-checkable exactly). Images already inside
    * the box pass through unscaled; undecodable payloads come out
    * 0x0. A real implementation would hand (bytes, out_w, out_h) to
    * the codec's resampler right here — the planning arithmetic and
    * the partition-wise plumbing are the Spark-side contract.
    */
  def resizeTo(df: DataFrame, idCol: String, binCol: String,
      maxDim: Int): Dataset[Resized] = {
    require(maxDim >= 1, s"maxDim must be positive, got $maxDim")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImageDims(Option(bytes).getOrElse(Array.emptyByteArray))
          match {
          case Some((w, h)) if w > 0 && h > 0 =>
            val m = math.max(w, h)
            if (m <= maxDim) Resized(id, w, h, w, h)
            else Resized(id, w, h,
              // Long arithmetic: PNG headers carry be32 dims, so a
              // (possibly hostile) header near 2^31 would overflow
              // `w * maxDim` in Int and emit garbage output dims
              math.max(1, (w.toLong * maxDim / m).toInt),
              math.max(1, (h.toLong * maxDim / m).toInt))
          case _ => Resized(id, 0, 0, 0, 0)
        }
      })
  }

  // ---- real pixel resample (uncompressed gray8 raster) ----

  case class ResampledImage(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, pix_sum: Long)

  /** Minimal uncompressed raster: "G8" magic + big-endian u16 width +
    * u16 height + exactly width*height gray pixel bytes, row-major.
    * None on bad magic, non-positive dims, or a length mismatch —
    * at 100 TB decode failures must be data, not exceptions.
    */
  def decodeGray8(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != '8') None
    else {
      val w = ((bytes(2) & 0xFF) << 8) | (bytes(3) & 0xFF)
      val h = ((bytes(4) & 0xFF) << 8) | (bytes(5) & 0xFF)
      if (w <= 0 || h <= 0 || bytes.length != 6 + w * h) None
      else Some((w, h,
        java.util.Arrays.copyOfRange(bytes, 6, bytes.length)))
    }
  }

  /** REAL pixel resample — decode gray8 payloads, aspect-fit into a
    * `maxDim` box (same integer planning as `resizeTo`), then
    * nearest-neighbor sample the ACTUAL pixels: output pixel (x, y)
    * reads source (x*w DIV out_w, y*h DIV out_h) — pure integer
    * arithmetic, so an oracle can replay it exactly. Emits a
    * position-weighted checksum Σ px(y,x)·(y·out_w + x + 1) of the
    * resampled image (weights catch transposes and row-order bugs a
    * plain sum would miss). Undecodable payloads come out all-zero.
    *
    * Same partition-wise codec-seam shape as `decodeWithCodec`: the
    * per-blob work is imperative but embarrassingly parallel — no
    * shuffle, no driver involvement, output skinny regardless of
    * payload size.
    */
  def resampleNearest(df: DataFrame, idCol: String, binCol: String,
      maxDim: Int): Dataset[ResampledImage] = {
    require(maxDim >= 1, s"maxDim must be positive, got $maxDim")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeGray8(Option(bytes).getOrElse(Array.emptyByteArray))
          match {
          case Some((w, h, px)) =>
            val m = math.max(w, h)
            val (ow, oh) =
              if (m <= maxDim) (w, h)
              else (math.max(1, (w.toLong * maxDim / m).toInt),
                math.max(1, (h.toLong * maxDim / m).toInt))
            var sum = 0L
            var y = 0
            while (y < oh) {
              val sy = (y.toLong * h / oh).toInt
              var x = 0
              while (x < ow) {
                val sx = (x.toLong * w / ow).toInt
                sum += (px(sy * w + sx) & 0xFF).toLong *
                  (y.toLong * ow + x + 1)
                x += 1
              }
              y += 1
            }
            ResampledImage(id, w, h, ow, oh, sum)
          case None => ResampledImage(id, 0, 0, 0, 0, 0L)
        }
      })
  }

  case class PHashed(doc_id: Long, phash: Long)

  /** Difference hash (dHash) of a gray8 raster — the perceptual
    * fingerprint that makes IMAGE dedup a hash-groupBy problem: decode,
    * nearest-neighbor-sample onto a fixed (gw+1)×gh grid, set bit
    * `y*gw + x` iff the pixel right of grid (y, x) is strictly
    * brighter. Uniform brightness shifts and any resize that preserves
    * the NN grid leave the hash unchanged (the classic dHash
    * invariances), so re-encoded copies of an image collide — exactly
    * what a multimodal pipeline needs from near-dup detection at the
    * cheap tier (the expensive tier being embedding similarity).
    *
    * gw*gh <= 63 keeps every bit out of the sign position, so the
    * hash is a plain non-negative BIGINT in any engine. Pure integer
    * arithmetic end to end — an oracle replays it exactly. Same
    * partition-wise codec seam as `resampleNearest`; undecodable
    * payloads hash to -1 (no valid raster can, bit 63 is never set).
    */
  def dHash(df: DataFrame, idCol: String, binCol: String,
      gw: Int = 8, gh: Int = 7): Dataset[PHashed] = {
    require(gw >= 1 && gh >= 1 && gw * gh <= 63,
      s"dHash grid ${gw}x$gh must fit 63 bits")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeGray8(Option(bytes).getOrElse(Array.emptyByteArray))
          match {
          case Some((w, h, px)) =>
            var hash = 0L
            var y = 0
            while (y < gh) {
              val sy = (y.toLong * h / gh).toInt
              var prev = -1
              var x = 0
              while (x <= gw) {
                val sx = (x.toLong * w / (gw + 1)).toInt
                val v = px(sy * w + sx) & 0xFF
                if (x > 0 && v > prev)
                  hash |= 1L << (y * gw + (x - 1))
                prev = v
                x += 1
              }
              y += 1
            }
            PHashed(id, hash)
          case None => PHashed(id, -1L)
        }
      })
  }

  /** CODEC SEAM — the one place imperative per-blob code belongs.
    * Partition-wise (`mapPartitions`): at scale each task decodes its
    * partition's blobs with no shuffle; a real codec (JNI/FFI) would
    * be initialized once per partition and fed the iterator. Only
    * decode work that built-ins can't express should live here.
    * `imageDecode` is the real-header instance; `stubDecode` remains
    * the deterministic fake for formats with no pure-JVM parser.
    */
  def decodeWithCodec(df: DataFrame, idCol: String, binCol: String,
      codec: (Long, Array[Byte]) => MediaFeatures = stubDecode)
      : Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        codec(id, Option(bytes).getOrElse(Array.emptyByteArray))
      })
  }
}
