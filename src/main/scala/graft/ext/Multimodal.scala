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
    ScanSpread.spread(df)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
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

  // ---- real PNG pixel decode (JDK-only: zlib inflate + unfilter) ----

  /** Full PNG pixel decode with nothing but the JDK: chunk walk →
    * concatenated IDAT zlib stream inflated via
    * `java.util.zip.Inflater` → per-scanline unfiltering (the five
    * standard filters None/Sub/Up/Average/Paeth, RFC 2083 §6) →
    * grayscale plane. Supports non-interlaced 8-bit images in color
    * types 0 (gray, pixels byte-exact), 2/6 (RGB/RGBA via the
    * integer luma (299r+587g+114b)/1000, alpha ignored) and 4
    * (gray+alpha). None on anything else and on corrupt, truncated,
    * or hostile payloads — decode failures must be data, not
    * exceptions or OOMs, in a 100 TB pass, so dims are capped at
    * 65535 and the raw plane at 64 MiB before any allocation.
    */
  def decodePngPixels(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] = {
    try {
      if (bytes.length < 45 || !bytes.take(8).sameElements(PngSig))
        return None
      def u8(i: Int) = bytes(i) & 0xFF
      def be32(i: Int) =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      if (be32(8) != 13 || bytes(12) != 'I' || bytes(13) != 'H' ||
          bytes(14) != 'D' || bytes(15) != 'R') return None
      val w = be32(16)
      val h = be32(20)
      val color = u8(25)
      if (w <= 0 || h <= 0 || w > 0xFFFF || h > 0xFFFF) return None
      // bit depth 8, compression 0, filter method 0, no interlace
      if (u8(24) != 8 || u8(26) != 0 || u8(27) != 0 || u8(28) != 0)
        return None
      val channels = color match {
        case 0 => 1
        case 2 => 3
        case 4 => 2
        case 6 => 4
        case _ => return None
      }
      val rowBytes = w * channels
      if (h.toLong * (rowBytes + 1) > (1L << 26)) return None
      val idat = new java.io.ByteArrayOutputStream()
      var p = 33
      var done = false
      while (!done) {
        if (p + 8 > bytes.length) return None
        val len = be32(p)
        // long arithmetic: a crafted len near Int.MaxValue wraps
        // p + 12 + len negative, sneaking past an int bounds check
        if (len < 0 || p.toLong + 12L + len > bytes.length) return None
        val isIdat = bytes(p + 4) == 'I' && bytes(p + 5) == 'D' &&
          bytes(p + 6) == 'A' && bytes(p + 7) == 'T'
        val isIend = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
          bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
        if (isIdat) idat.write(bytes, p + 8, len)
        if (isIend) done = true
        p += 12 + len
      }
      val raw = new Array[Byte](h * (rowBytes + 1))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, off, raw.length - off)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return None // truncated / preset-dictionary stream
          off += n
        }
      } finally inf.end()
      if (off != raw.length) return None
      val out = new Array[Byte](h * rowBytes)
      val bpp = channels
      var y = 0
      while (y < h) {
        val f = raw(y * (rowBytes + 1)) & 0xFF
        val rs = y * (rowBytes + 1) + 1
        val os = y * rowBytes
        var x = 0
        while (x < rowBytes) {
          val cur = raw(rs + x) & 0xFF
          val a = if (x >= bpp) out(os + x - bpp) & 0xFF else 0
          val b = if (y > 0) out(os - rowBytes + x) & 0xFF else 0
          val c = if (x >= bpp && y > 0)
            out(os - rowBytes + x - bpp) & 0xFF else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + a
            case 2 => cur + b
            case 3 => cur + ((a + b) >> 1)
            case 4 =>
              val pp = a + b - c
              val pa = math.abs(pp - a)
              val pb = math.abs(pp - b)
              val pc = math.abs(pp - c)
              cur + (if (pa <= pb && pa <= pc) a
                     else if (pb <= pc) b else c)
            case _ => return None
          }
          out(os + x) = (v & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      val gray =
        if (channels == 1) out
        else {
          val g = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val base = i * channels
            val v =
              if (channels == 2) out(base) & 0xFF
              else ((out(base) & 0xFF) * 299 + (out(base + 1) & 0xFF) *
                587 + (out(base + 2) & 0xFF) * 114) / 1000
            g(i) = v.toByte
            i += 1
          }
          g
        }
      Some((w, h, gray))
    } catch {
      case _: java.util.zip.DataFormatException => None
      // the broad parent: ByteArrayOutputStream.write and friends
      // throw plain IndexOutOfBoundsException, not the Array subclass
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Deterministic gray8 PNG ENCODER — the synthesis side of the
    * codec seam, used by the planted-PNG queries and the round-trip
    * specs. Color type 0, bit depth 8, one IDAT; the filter type
    * cycles `y % 5` per scanline, so one decode of any image ≥5 rows
    * exercises every unfilter branch.
    */
  def encodePngGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"bad raster: ${w}x$h with ${px.length} pixels")
    val raw = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      var x = 0
      while (x < w) {
        val cur = px(y * w + x) & 0xFF
        val a = if (x > 0) px(y * w + x - 1) & 0xFF else 0
        val b = if (y > 0) px((y - 1) * w + x) & 0xFF else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xFF else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a)
            val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (w + 1) + 1 + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw)
    defl.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Int): Unit = {
        out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
        out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
      }
      be32(data.length)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb)
      crc.update(data)
      be32(crc.getValue.toInt)
      out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array()
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Format-dispatching raster decode: "G8" magic → [[decodeGray8]],
    * PNG signature → [[decodePngPixels]] (the real compressed path),
    * anything else → None. The pixel operators below run on EITHER
    * format through this one seam.
    */
  def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes.length >= 2 && bytes(0) == 'G' && bytes(1) == '8')
      decodeGray8(bytes)
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig))
      decodePngPixels(bytes)
    else None

  /** REAL pixel resample — decode raster payloads (uncompressed
    * gray8 or REAL compressed PNG, via [[decodeRaster]]), aspect-fit
    * into a `maxDim` box (same integer planning as `resizeTo`), then
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
    ScanSpread.spread(df)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeRaster(Option(bytes).getOrElse(Array.emptyByteArray))
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

  /** Difference hash (dHash) of a raster (gray8 or real compressed
    * PNG, via [[decodeRaster]]) — the perceptual
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
    ScanSpread.spread(df)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeRaster(Option(bytes).getOrElse(Array.emptyByteArray))
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
    ScanSpread.spread(df)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        codec(id, Option(bytes).getOrElse(Array.emptyByteArray))
      })
  }
}
