package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY north-star): image/audio/video
  * payloads are opaque `binary` columns with a typed metadata struct.
  *
  * Two real decode surfaces, no codec stubs:
  *
  *  - [[probeImage]] / [[decodeMedia]] — header-only metadata probe: PNG
  *    IHDR / JPEG SOF / GIF logical-screen parsing straight off the
  *    payload bytes (public file-format specs). The cheap pass every
  *    image-pipeline stage (dedup-by-dims, aspect filtering, resize
  *    planning) runs first, reading a few dozen bytes per row.
  *  - [[decodePixels]] / [[decodePixelStats]] — full pixel decode through
  *    `javax.imageio` (public JDK API: PNG, JPEG, GIF, BMP codecs ship
  *    with the JRE), emitting dimensions, channel count, and per-channel
  *    sRGB means per payload. Batched per partition via `mapPartitions`
  *    (the Scala analogue of the `mapInPandas` batch shape): map-side
  *    only, no shuffle, no driver collect.
  *
  *  - [[decodeAudio]] / [[decodeAudioStats]] — real audio decode through
  *    `javax.sound.sampled` (public JDK API: WAV/AIFF/AU PCM codecs ship
  *    with the JRE), emitting channel count, sample rate, bit depth,
  *    frame count, and the mean PCM16 amplitude per payload. Same
  *    `mapPartitions` batch shape as the pixel path.
  *
  * Compressed audio/video codecs (MP3/AAC frame decode, video frames)
  * are not in the JDK and not shipped here; [[sampleFrames]] carries the
  * frame-window plumbing with byte slicing in place of a frame codec.
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Wrap a text table as fake media rows (documents → payload bytes) so
    * the pipeline is exercisable on the synthetic testdata.
    */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (length(col(textCol)) % 1024).cast(IntegerType).as("width"),
        (length(col(textCol)) % 768).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Byte-level content fingerprint: payload length plus a stable 60-bit
    * digest (high 60 bits of MD5 — reproducible by any engine's md5(),
    * which is how the DuckDB oracle checks it). Modality-agnostic by
    * design — exact-duplicate detection over media payloads compares raw
    * bytes, not decoded pixels, so this runs on any payload including
    * formats no local codec can open. Pixel-level decode is the separate
    * [[decodePixels]] kernel.
    */
  private[operators] def contentFingerprint(payload: Array[Byte]): (Int, Long) = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(payload)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (payload.length, h >>> 4)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_size", IntegerType, nullable = true),
    StructField("content_digest", LongType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** Batched fingerprint extraction over partitions — the `mapInPandas`
    * batch shape in Scala: one iterator pass per partition, no driver
    * collect, output schema declared up front. The 8-dim feature is the
    * digest's bytes scaled to [0,1] — a locality-free binary fingerprint
    * (exact-match only, by construction); embedding-like features over
    * decoded pixels come from [[decodePixelStats]].
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "modality", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        if (payload == null) Row(id, modality, null, null, null)
        else {
          val (len, digest) = contentFingerprint(payload)
          val feat = Array.tabulate(8)(i =>
            (((digest >>> (i * 8)) & 0xffL).toFloat / 255.0f))
          Row(id, modality, len, digest, feat.toSeq)
        }
      }
    }(enc)
  }

  /** Parse an image header: (format, width, height, channels), or None if
    * the bytes match no supported signature. Pure byte-layout parsing from
    * the public format specs — no codec library:
    *
    *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk — width and
    *    height big-endian at offsets 16/20, color type at 25 (0 grey,
    *    2 RGB, 3 palette, 4 grey+alpha, 6 RGBA).
    *  - JPEG (ITU T.81): SOI then marker segments; the frame header
    *    SOFn (0xC0-0xCF except DHT/JPG/DAC) carries height, width, and
    *    component count.
    *  - GIF (87a/89a): 6-byte signature then little-endian logical screen
    *    width/height; always palette-indexed RGB.
    *  - WebP (RFC 9649): RIFF container — VP8X extended header (24-bit LE
    *    minus-one canvas dims, alpha flag), VP8 lossy frame header
    *    (14-bit LE dims behind the 9d 01 2a start code), VP8L lossless
    *    bitstream (14-bit packed dims, alpha bit 28).
    */
  private[operators] def probeImage(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 26 && be32(0) == 0x89504e47 && be32(4) == 0x0d0a1a0a &&
        new String(b, 12, 4, "US-ASCII") == "IHDR") {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      val w = be32(16); val h = be32(20)
      // hostile headers: the spec caps dims at 2^31-1, so a wrapped
      // (negative) or zero value is a malformed header, not an image
      if (w <= 0 || h <= 0) None else Some(("png", w, h, channels))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk marker segments to the first SOFn frame header
      var i = 2
      while (i + 9 < b.length) {
        if (u8(i) != 0xff) return None
        val marker = u8(i + 1)
        // T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a
        // marker; TEM (0x01) and RSTn/SOI/EOI (0xD0-0xD9) are standalone
        if (marker == 0xff) { i += 1 }
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) { i += 2 }
        else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val w = be16(i + 7); val h = be16(i + 5)
          return if (w <= 0 || h <= 0) None
            else Some(("jpeg", w, h, u8(i + 9)))
        } else i += 2 + be16(i + 2)
      }
      None
    } else if (b.length >= 10 && (new String(b, 0, 6, "US-ASCII") == "GIF87a" ||
        new String(b, 0, 6, "US-ASCII") == "GIF89a")) {
      val w = le16(6); val h = le16(8)
      if (w <= 0 || h <= 0) None else Some(("gif", w, h, 3))
    } else if (b.length >= 30 && u8(0) == 'B' && u8(1) == 'M') {
      // BMP (BITMAPINFOHEADER): LE32 width at 18, LE32 height at 22
      // (negative = top-down rows), LE16 bits-per-pixel at 28
      def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      val w = le32(18); val h = math.abs(le32(22))
      val channels = le16(28) match {
        case 1 | 4 | 8 => 1; case 16 | 24 => 3; case 32 => 4
        case _ => return None
      }
      if (w <= 0 || h <= 0) None else Some(("bmp", w, h, channels))
    } else if (b.length >= 16 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
        new String(b, 8, 4, "US-ASCII") == "WEBP") {
      // WebP (RFC 9649): RIFF container, first chunk decides the flavor.
      //  - VP8X (extended): 24-bit LE canvas width-1 at 24, height-1 at 27;
      //    alpha bit 4 of the flags byte at 20
      //  - VP8  (lossy): frame tag + start code, 14-bit LE dims at 26/28
      //  - VP8L (lossless): signature 0x2f, 14-bit dims packed LE from 21
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      val chunk = new String(b, 12, 4, "US-ASCII")
      val parsed: Option[(Int, Int, Int)] = chunk match {
        case "VP8X" if b.length >= 30 =>
          val ch = if ((u8(20) & 0x10) != 0) 4 else 3
          Some((le24(24) + 1, le24(27) + 1, ch))
        case "VP8 " if b.length >= 30 &&
            u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a =>
          Some((le16(26) & 0x3fff, le16(28) & 0x3fff, 3))
        case "VP8L" if b.length >= 25 && u8(20) == 0x2f =>
          val bits = u8(21).toLong | (u8(22).toLong << 8) |
            (u8(23).toLong << 16) | (u8(24).toLong << 24)
          val ch = if (((bits >> 28) & 1L) != 0L) 4 else 3
          Some((((bits & 0x3fff) + 1).toInt, (((bits >> 14) & 0x3fff) + 1).toInt, ch))
        case _ => None
      }
      parsed.flatMap { case (w, h, ch) =>
        if (w <= 0 || h <= 0) None else Some(("webp", w, h, ch))
      }
    } else if (b.length >= 20 && new String(b, 4, 4, "US-ASCII") == "ftyp" &&
        (new String(b, 8, 4, "US-ASCII") == "avif" ||
          new String(b, 8, 4, "US-ASCII") == "avis")) {
      // AVIF (ISO-BMFF / ISO 23000-22): presentation dims live in the
      // `ispe` (image spatial extents) property fullbox — size(4) 'ispe'
      // version/flags(4) width(4) height(4), all big-endian. The box
      // nests under meta→iprp→ipco; a bounded linear fourcc scan finds
      // it without replicating the fullbox-offset bookkeeping (the
      // 12-byte shape behind the fourcc disambiguates). Channel count is
      // reported as 3 — AVIF alpha rides a separate auxiliary item the
      // header does not flag cheaply.
      var i = 12
      val limit = math.min(b.length - 20, 4096)
      var found: Option[(String, Int, Int, Int)] = None
      while (found.isEmpty && i <= limit) {
        if (b(i + 4) == 'i' && b(i + 5) == 's' && b(i + 6) == 'p' &&
            b(i + 7) == 'e' && be32(i) == 20) {
          val w = be32(i + 12); val h = be32(i + 16)
          if (w > 0 && h > 0) found = Some(("avif", w, h, 3))
        }
        i += 1
      }
      found
    } else None
  }

  /** Fixture encoder: a spec-shaped minimal AVIF header — ftyp(avif) +
    * meta fullbox nesting iprp→ipco→ispe with the given dims.
    */
  private[graft] def avifHeaderBytes(w: Int, h: Int,
      alpha: Boolean = false, animated: Boolean = false): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp", {
      val p = java.nio.ByteBuffer.allocate(12)
      p.put((if (animated) "avis" else "avif").getBytes("US-ASCII"))
        .putInt(0).put("avif".getBytes("US-ASCII"))
      p.array()
    })
    val ispe = box("ispe", {
      val p = java.nio.ByteBuffer.allocate(12)
      p.putInt(0).putInt(w).putInt(h); p.array()
    })
    // auxC (auxiliary type property): fullbox + null-terminated urn —
    // the spec's marker for an alpha auxiliary image item
    val auxC = if (!alpha) Array.empty[Byte] else box("auxC",
      Array[Byte](0, 0, 0, 0) ++
        "urn:mpeg:mpegB:cicp:systems:auxiliary:alpha\u0000".getBytes("US-ASCII"))
    val meta = box("meta",
      Array[Byte](0, 0, 0, 0) ++ box("iprp", box("ipco", ispe ++ auxC)))
    ftyp ++ meta
  }

  /** Fixture encoder: a spec-valid WebP VP8X (extended-format) header
    * with the given canvas dims — RIFF + VP8X chunk only, the same
    * header-level shape [[pngHeaderBytes]] plants for PNG.
    */
  private[graft] def webpHeaderBytes(w: Int, h: Int,
      alpha: Boolean = false, anim: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(22)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8X".getBytes("US-ASCII")).putInt(10)
      .put(((if (alpha) 0x10 else 0x00) | (if (anim) 0x02 else 0x00)).toByte)
      .put(Array[Byte](0, 0, 0))
    def le24(v: Int): Unit = {
      out.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
        .put(((v >> 16) & 0xff).toByte)
    }
    le24(w - 1); le24(h - 1)
    out.array()
  }

  val decodeSchema: StructType = StructType(Seq(
    // nullable: a null input id passes through as null (getLong would
    // silently read it as 0 and collide with a real id 0)
    StructField("media_id", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("has_alpha", BooleanType, nullable = true),
    StructField("is_animated", BooleanType, nullable = true)))

  /** Alpha-channel / animation flags straight off the container header —
    * pure public-spec fields, no frame decode, null where the header does
    * not carry the answer:
    *
    *  - PNG: alpha from the IHDR color type (4/6); animation from the
    *    APNG `acTL` chunk, which the spec requires BEFORE the first IDAT
    *    — a bounded chunk walk answers it definitively, or null if the
    *    buffer is a prefix that ends before IDAT/IEND.
    *  - JPEG: neither exists in the format — (false, false).
    *  - GIF: both live in per-frame blocks behind the variable-length
    *    global color table, not the header — (null, null).
    *  - BMP: alpha iff 32 bpp; never animated.
    *  - WebP: VP8X feature flags byte (bit 4 alpha, bit 1 animation);
    *    plain VP8 has neither; VP8L carries alpha in bit 28.
    *  - AVIF: animation iff the `avis` brand appears in ftyp (major or
    *    compatible); alpha iff an `auxC` property carries the
    *    `urn:…:auxiliary:alpha` aux type (bounded scan, like ispe).
    */
  private[operators] def probeImageFlags(
      fmt: String, b: Array[Byte]): (Option[Boolean], Option[Boolean]) = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    try fmt match {
      case "png" =>
        val alpha = u8(25) == 4 || u8(25) == 6
        var i = 8
        var anim: Option[Boolean] = None
        while (anim.isEmpty && i + 8 <= b.length) {
          val t = new String(b, i + 4, 4, "US-ASCII")
          if (t == "acTL") anim = Some(true)
          else if (t == "IDAT" || t == "IEND") anim = Some(false)
          else i += 12 + math.min(be32(i), Int.MaxValue.toLong - 16).toInt
        }
        (Some(alpha), anim)
      case "jpeg" => (Some(false), Some(false))
      case "gif" => (None, None)
      case "bmp" => (Some(le16(28) == 32), Some(false))
      case "webp" =>
        new String(b, 12, 4, "US-ASCII") match {
          case "VP8X" =>
            (Some((u8(20) & 0x10) != 0), Some((u8(20) & 0x02) != 0))
          case "VP8 " => (Some(false), Some(false))
          case "VP8L" =>
            (Some((u8(24) & 0x10) != 0), Some(false))
          case _ => (None, None)
        }
      case "avif" =>
        val ftypEnd = math.min(be32(0), b.length.toLong).toInt
        var anim = false
        var i = 8
        while (!anim && i + 4 <= ftypEnd) {
          if (new String(b, i, 4, "US-ASCII") == "avis") anim = true
          i += 4
        }
        val urn = "auxiliary:alpha".getBytes("US-ASCII")
        val limit = math.min(b.length - urn.length, 8192)
        var alpha = false
        var j = ftypEnd
        while (!alpha && j <= limit) {
          var k = 0
          while (k < urn.length && b(j + k) == urn(k)) k += 1
          if (k == urn.length) alpha = true
          j += 1
        }
        (Some(alpha), Some(anim))
      case _ => (None, None)
    } catch { case scala.util.control.NonFatal(_) => (None, None) }
  }

  /** Header decode over a media frame — the REAL probe (no stub): one
    * `mapPartitions` pass parses each payload's PNG/JPEG/GIF/WebP/AVIF
    * header into (format, width, height, channels, has_alpha,
    * is_animated); unparseable or null payloads yield null columns rather
    * than dropping the row, so the output stays 1:1 with the input (the
    * join-back contract downstream filters rely on). Scale shape:
    * map-side only — no shuffle, no driver collect, and the scan reads
    * just (media_id, payload).
    */
  def decodeMedia(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodeSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (if (payload == null) None else probeImage(payload)) match {
          case Some((fmt, w, h, c)) =>
            val (alpha, anim) = probeImageFlags(fmt, payload)
            Row(id, fmt, w, h, c,
              alpha.map(Boolean.box).orNull, anim.map(Boolean.box).orNull)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  // javax.imageio writes decode scratch to temp FILES by default — on an
  // executor that is one disk round-trip per image; keep it in memory
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Full pixel decode of one payload via `javax.imageio` (PNG, JPEG,
    * GIF, BMP — the codecs the JDK ships): (width, height, channels,
    * mean_r, mean_g, mean_b). Means are over the sRGB-converted pixels
    * (`getRGB` routes palette and grayscale images through their
    * ColorModel), so a GIF's palette indices and a PNG's raw samples both
    * land in one comparable color space. Returns None for null payloads,
    * non-image bytes, and formats without a local codec — decode failure
    * is data, not an exception, at 10^10-row scale.
    */
  private[operators] def decodePixels(
      payload: Array[Byte]): Option[(Int, Int, Int, Double, Double, Double)] = {
    imageIoNoCache
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val channels = img.getColorModel.getNumComponents
          var sr = 0L; var sg = 0L; var sb = 0L
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Some((w, h, channels, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val pixelStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true)))

  /** Pixel-level decode over a media frame: one `mapPartitions` pass runs
    * the real `javax.imageio` codec per payload and emits dimensions,
    * channel count, and per-channel sRGB means; `format` comes from the
    * byte-level header probe so it agrees with [[decodeMedia]].
    * Undecodable or null payloads yield null columns rather than dropping
    * the row (same 1:1 join-back contract as [[decodeMedia]]). Scale
    * shape: map-side only — no shuffle, no driver collect, scan reads
    * just (media_id, payload); decode cost is embarrassingly parallel and
    * scales with executor count.
    */
  def decodePixelStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(pixelStatsSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (if (payload == null) None else decodePixels(payload)) match {
          case Some((w, h, c, mr, mg, mb)) =>
            val fmt = probeImage(payload).map(_._1).getOrElse("unknown")
            Row(id, fmt, w, h, c, mr, mg, mb)
          case None => Row(id, null, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** REAL video-container metadata probe — ISO BMFF / MP4 (the public
    * ISO/IEC 14496-12 box structure): walk the top-level boxes to `moov`,
    * then its children: `mvhd` carries the movie timescale and duration
    * (version 0: 32-bit; version 1: 64-bit), `trak`/`tkhd` carries the
    * presentation width/height as 16.16 fixed point, and the
    * trak→mdia→minf→stbl→stsd sample-description walk surfaces the track
    * codec fourcc (`avc1`/`hev1`/`mp4a`/…) plus the average bitrate from
    * the sample entry's `btrt` box when the muxer wrote one. Returns
    * (brand, width, height, duration_ms, codec, avg_bitrate_bps).
    * Header-only — a few hundred bytes — the video analogue of
    * [[probeImage]]: every video-curation stage that filters on
    * resolution/length/codec runs this before any frame codec is
    * involved. Frame DECODE stays a codec-boundary non-goal (no
    * H.264/AV1 decoder in the JDK).
    *
    * Box sizing follows ISO/IEC 14496-12 §4.2 exactly: `size==1` means an
    * 8-byte largesize follows the fourcc, `size==0` means the box extends
    * to the end of the enclosing container — both legal and common in
    * real muxer output (large mdat, last top-level box). Sizes past the
    * enclosing bound are clamped (a header-only probe of a sampled prefix
    * must not walk off the buffer), and all advances are Long-safe so a
    * hostile 32-bit size can never wrap an index negative.
    */
  private[operators] def probeVideo(
      b: Array[Byte]): Option[(String, Int, Int, Long, Option[String], Option[Long])] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def boxName(i: Int): String = new String(b, i + 4, 4, "US-ASCII")
    // The box at `i` inside [.., limit): (fourcc, payloadStart, boxEnd).
    // size==0 → to end of container; size==1 → 64-bit largesize; ends are
    // clamped to the enclosing bound so hostile sizes cannot escape it.
    def boxAt(i: Int, limit: Int): Option[(String, Int, Int)] = {
      if (i + 8 > limit) return None
      val sz = be32(i)
      val name = boxName(i)
      if (sz == 0L) Some((name, i + 8, limit))
      else if (sz == 1L) {
        if (i + 16 > limit) None
        else {
          val ls = be64(i + 8)
          if (ls < 16L) None
          else Some((name, i + 16, math.min(i.toLong + ls, limit.toLong).toInt))
        }
      } else if (sz < 8L) None
      else Some((name, i + 8, math.min(i.toLong + sz, limit.toLong).toInt))
    }
    // Payload bounds of the first child box named `name` within [start, limit).
    def findChild(start: Int, limit: Int, name: String): Option[(Int, Int)] = {
      var i = start
      while (i + 8 <= limit) {
        boxAt(i, limit) match {
          case Some((n, ps, pe)) =>
            if (n == name) return Some((ps, pe))
            if (pe <= i) return None // no forward progress → malformed
            i = pe
          case None => return None
        }
      }
      None
    }
    try {
      if (b.length < 16 || boxName(0) != "ftyp") return None
      val brand = new String(b, 8, 4, "US-ASCII").trim
      var timescale = 0L; var duration = -1L; var w = 0; var h = 0
      var codec: Option[String] = None
      var codecIsVideo = false
      var bitrate: Option[Long] = None
      for ((ms, me) <- findChild(0, b.length, "moov")) {
        for ((ps, pe) <- findChild(ms, me, "mvhd")) {
          val v = u8(ps)
          if (v == 1 && ps + 32 <= pe) {
            timescale = be32(ps + 20); duration = be64(ps + 24)
          } else if (v == 0 && ps + 20 <= pe) {
            timescale = be32(ps + 12); duration = be32(ps + 16)
          }
        }
        // walk every trak: the video track (nonzero tkhd dims) wins the
        // codec slot; otherwise the first sample entry seen is reported
        var i = ms
        var advance = true
        while (advance && i + 8 <= me) {
          boxAt(i, me) match {
            case Some((n, ps, pe)) =>
              if (n == "trak") {
                var trakHasDims = false
                for ((ts, te) <- findChild(ps, pe, "tkhd")) {
                  val v = u8(ts)
                  val off = ts + (if (v == 1) 88 else 76)
                  if (off + 8 <= te) {
                    // 16.16 fixed point; zero for audio-only tracks
                    val tw = be16(off); val th = be16(off + 4)
                    if (tw > 0 && th > 0) { w = tw; h = th; trakHasDims = true }
                  }
                }
                for ((ds, de) <- findChild(ps, pe, "mdia");
                     (fs, fe) <- findChild(ds, de, "minf");
                     (ss, se) <- findChild(fs, fe, "stbl");
                     (xs, xe) <- findChild(ss, se, "stsd")) {
                  // stsd fullbox: version/flags(4) entry_count(4), then
                  // sample entries — the entry's fourcc IS the codec id
                  if (xs + 8 <= xe && be32(xs + 4) > 0L) {
                    for ((cc, es, ee) <- boxAt(xs + 8, xe)) {
                      if (codec.isEmpty || (trakHasDims && !codecIsVideo)) {
                        codec = Some(cc)
                        codecIsVideo = trakHasDims
                        // btrt (§8.5.2): size(4)='btrt'(4) bufferSizeDB(4)
                        // maxBitrate(4) avgBitrate(4) — fixed 20-byte box
                        // nested behind the entry's format-specific fixed
                        // fields; a bounded fourcc scan finds it without
                        // visual-vs-audio entry-layout bookkeeping
                        var k = es
                        var hit: Option[Long] = None
                        while (hit.isEmpty && k + 20 <= ee) {
                          if (b(k + 4) == 'b' && b(k + 5) == 't' &&
                              b(k + 6) == 'r' && b(k + 7) == 't' &&
                              be32(k) == 20L) {
                            val avg = be32(k + 16)
                            if (avg > 0L) hit = Some(avg)
                          }
                          k += 1
                        }
                        bitrate = hit
                      }
                    }
                  }
                }
              }
              advance = pe > i
              i = pe
            case None => advance = false
          }
        }
      }
      if (timescale <= 0L || duration < 0L) None
      else Some((s"mp4/$brand", w, h, duration * 1000L / timescale, codec, bitrate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val videoProbeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("codec", StringType, nullable = true),
    StructField("avg_bitrate", LongType, nullable = true)))

  /** Video metadata over a media frame — mapPartitions batch shape, same
    * null-on-unparseable 1:1 contract as the image/audio paths.
    */
  def probeVideoMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(videoProbeSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (if (payload == null) None else probeVideo(payload)) match {
          case Some((fmt, w, h, ms, codec, kbps)) =>
            Row(id, fmt, if (w > 0) w else null, if (h > 0) h else null, ms,
              codec.orNull, kbps.map(Long.box).orNull)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Fixture encoder: a spec-valid minimal MP4 (ftyp + moov{mvhd,
    * trak{tkhd, mdia{minf{stbl{stsd{<codec>{btrt}}}}}}}) with the given
    * presentation dims, timescale, duration, sample-entry codec fourcc,
    * and (when > 0) a `btrt` average bitrate — the video analogue of
    * [[pngHeaderBytes]]: real box layout, no media data.
    */
  private[graft] def mp4HeaderBytes(w: Int, h: Int, timescale: Int,
      duration: Int, codec: String = "avc1", avgBitrate: Int = 0): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    val ftyp = box("ftyp", {
      val p = java.nio.ByteBuffer.allocate(8)
      p.put("isom".getBytes("US-ASCII")).putInt(512); p.array()
    })
    val mvhd = box("mvhd", {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)            // version 0 + flags
      p.putInt(0).putInt(0)  // creation/modification
      p.putInt(timescale).putInt(duration)
      p.array()              // rate/volume/matrix/next-track left zero
    })
    val tkhd = box("tkhd", {
      val p = java.nio.ByteBuffer.allocate(84)
      p.putInt(0)
      p.position(76)
      p.putInt(w << 16).putInt(h << 16)
      p.array()
    })
    val btrt = if (avgBitrate <= 0) Array.empty[Byte] else box("btrt", {
      val p = java.nio.ByteBuffer.allocate(12)
      p.putInt(0).putInt(avgBitrate).putInt(avgBitrate); p.array()
    })
    // VisualSampleEntry: 6 reserved + 2 data_ref_index, then 70 bytes of
    // fixed visual fields (dims at 24/26 of the fixed part), then children
    val entry = box(codec, {
      val p = java.nio.ByteBuffer.allocate(78)
      p.position(6); p.putShort(1)        // data_reference_index
      p.position(8 + 16)
      p.putShort(w.toShort).putShort(h.toShort)
      p.position(78); p.array()
    } ++ btrt)
    val stsd = box("stsd", {
      val p = java.nio.ByteBuffer.allocate(8)
      p.putInt(0).putInt(1); p.array()    // version/flags, entry_count
    } ++ entry)
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ moov
  }

  /** Compressed-audio HEADER probe — the metadata pass for formats the
    * JDK cannot decode (the audio analogue of [[probeImage]]): returns
    * (format, channels, sample_rate, duration_ms; duration −1 when the
    * header does not carry it). Pure public-spec bit parsing:
    *
    *  - FLAC: "fLaC" magic then the mandatory STREAMINFO block — sample
    *    rate (20 bits), channels−1 (3 bits), and total samples (36 bits)
    *    packed big-endian at byte 18 of the block.
    *  - MP3 (MPEG-1/2 Layer III): 11-bit frame sync, then version/
    *    bitrate/samplerate indexes from the published tables; duration
    *    requires walking all frames, so only rate/mode are reported.
    */
  private[operators] def probeAudioHeader(
      b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    try {
      if (b.length >= 34 && new String(b, 0, 4, "US-ASCII") == "fLaC") {
        // STREAMINFO payload starts at 8; bytes 10-17 of the payload pack
        // rate(20) | channels-1(3) | bps-1(5) | totalSamples(36)
        val o = 8 + 10
        val rate = (u8(o) << 12) | (u8(o + 1) << 4) | (u8(o + 2) >> 4)
        val ch = ((u8(o + 2) >> 1) & 0x7) + 1
        val samples = ((u8(o + 3).toLong & 0xf) << 32) |
          (u8(o + 4).toLong << 24) | (u8(o + 5).toLong << 16) |
          (u8(o + 6).toLong << 8) | u8(o + 7).toLong
        if (rate <= 0) None
        else Some(("flac", ch, rate, samples * 1000L / rate))
      } else if (b.length >= 4 && u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0) {
        val versionBits = (u8(1) >> 3) & 0x3   // 3 = MPEG-1, 2 = MPEG-2
        val layerBits = (u8(1) >> 1) & 0x3     // 1 = Layer III
        if (layerBits != 1 || versionBits == 1) return None
        val rateIdx = (u8(2) >> 2) & 0x3
        if (rateIdx == 3) return None
        val rate = versionBits match {
          case 3 => Seq(44100, 48000, 32000)(rateIdx)
          case 2 => Seq(22050, 24000, 16000)(rateIdx)
          case _ => Seq(11025, 12000, 8000)(rateIdx)  // MPEG-2.5
        }
        val ch = if (((u8(3) >> 6) & 0x3) == 3) 1 else 2
        Some(("mp3", ch, rate, -1L))
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val audioHeaderSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Compressed-audio metadata over a media frame — mapPartitions batch
    * shape, null-on-unparseable 1:1 contract; duration_ms is null where
    * the header does not carry it (MP3).
    */
  def probeAudioMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioHeaderSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (if (payload == null) None else probeAudioHeader(payload)) match {
          case Some((fmt, ch, rate, ms)) =>
            Row(id, fmt, ch, rate, if (ms >= 0) ms else null)
          case None => Row(id, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Fixture encoder: a spec-valid FLAC signature + STREAMINFO block with
    * the given rate/channels/total samples — header-level, no frames.
    */
  private[graft] def flacHeaderBytes(channels: Int, sampleRate: Int,
      totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](42)
    System.arraycopy("fLaC".getBytes("US-ASCII"), 0, out, 0, 4)
    out(4) = 0x80.toByte  // last block, type 0 (STREAMINFO)
    out(7) = 34           // block length
    val o = 18
    out(o) = ((sampleRate >> 12) & 0xff).toByte
    out(o + 1) = ((sampleRate >> 4) & 0xff).toByte
    out(o + 2) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 0x7) << 1)).toByte
    out(o + 3) = ((totalSamples >> 32) & 0xf).toByte
    out(o + 4) = ((totalSamples >> 24) & 0xff).toByte
    out(o + 5) = ((totalSamples >> 16) & 0xff).toByte
    out(o + 6) = ((totalSamples >> 8) & 0xff).toByte
    out(o + 7) = (totalSamples & 0xff).toByte
    out
  }

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("mean_amp", DoubleType, nullable = true)))

  /** Full audio decode of one payload via `javax.sound.sampled` (the
    * JDK's WAV/AIFF/AU readers): (format, channels, sample_rate, bits,
    * n_frames, mean PCM16 amplitude over all interleaved samples).
    * Only signed 16-bit PCM gets a sample mean (the dominant at-rest
    * encoding; both byte orders handled from the container's declared
    * endianness) — other depths still return their metadata with a null
    * mean. Undecodable bytes are None: decode failure is data, not an
    * exception, at 10^10-row scale.
    */
  private[operators] def decodeAudio(
      payload: Array[Byte]): Option[(String, Int, Int, Int, Long, Option[Double])] = {
    try {
      val bin = new java.io.ByteArrayInputStream(payload)
      val fileType = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(payload))
        .getType.getExtension.toLowerCase
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(bin)
      try {
        val f = in.getFormat
        val ch = f.getChannels
        val bits = f.getSampleSizeInBits
        val frames = in.getFrameLength
        val mean =
          if (bits == 16 && f.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val bytes = in.readAllBytes()
            val n = bytes.length / 2
            var i = 0; var sum = 0L
            while (i < n) {
              val lo = bytes(2 * i) & 0xff; val hi = bytes(2 * i + 1) & 0xff
              val s = if (f.isBigEndian) ((lo << 8) | hi).toShort
                      else ((hi << 8) | lo).toShort
              sum += s; i += 1
            }
            if (n == 0) None else Some(sum.toDouble / n)
          } else None
        Some((fileType, ch, f.getSampleRate.toInt, bits, frames, mean))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio-level decode over a media frame: one `mapPartitions` pass runs
    * the real `javax.sound` codec per payload — the audio twin of
    * [[decodePixelStats]], same null-on-undecodable 1:1 contract, same
    * map-side-only scale shape.
    */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioStatsSchema).asInstanceOf[org.apache.spark.sql.Encoder[Row]]
    media.select("media_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
        val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        (if (payload == null) None else decodeAudio(payload)) match {
          case Some((fmt, ch, rate, bits, frames, mean)) =>
            // AudioSystem.NOT_SPECIFIED (-1) means the container does not
            // declare a frame count — null-on-unknown, like MP3 duration
            Row(id, fmt, ch, rate, bits,
              if (frames >= 0L) frames else null, mean.orNull)
          case None => Row(id, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Fixture encoder: a REAL RIFF/WAVE PCM16 file (canonical 44-byte
    * header + little-endian samples), every sample the same `amp` —
    * constant amplitude keeps the decoded mean exactly integer, the
    * audio analogue of [[solidImageBytes]]'s solid color.
    */
  private[graft] def constWavBytes(channels: Int, sampleRate: Int,
      frames: Int, amp: Int): Array[Byte] = {
    val nSamples = frames * channels
    val dataSize = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) { out.putShort(amp.toShort); i += 1 }
    out.array()
  }

  /** Fixture encoder: a REAL image file (solid color, chosen format)
    * produced by the JDK's own encoders — `decodePixelStats` must run the
    * actual codec to recover dims and channel means from it. Solid color
    * keeps the oracle exact: PNG and BMP are lossless and a
    * single-color GIF palette round-trips exactly (spec-verified in
    * MultimodalSpec).
    */
  private[graft] def solidImageBytes(fmt: String, w: Int, h: Int,
      r: Int, g: Int, b: Int): Array[Byte] = {
    imageIoNoCache
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Fixture encoder: a real spec-valid PNG header (signature + IHDR with
    * correct CRC + IEND) with the given dimensions, 8-bit RGB. Used by the
    * graded query/tests to PLANT dimensions the probe must recover from
    * genuine format bytes; a real image file's first 33 bytes are
    * identical in layout.
    */
  private[graft] def pngHeaderBytes(w: Int, h: Int, colorType: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(0x89504e47); d.writeInt(0x0d0a1a0a)
    val ihdr = new java.io.ByteArrayOutputStream()
    val di = new java.io.DataOutputStream(ihdr)
    di.writeBytes("IHDR"); di.writeInt(w); di.writeInt(h)
    di.writeByte(8); di.writeByte(colorType) // bit depth 8; 2 = RGB, 6 = RGBA
    di.writeByte(0); di.writeByte(0); di.writeByte(0) // compression/filter/interlace
    val ib = ihdr.toByteArray
    d.writeInt(ib.length - 4); d.write(ib); d.writeInt(crc32(ib))
    d.writeInt(0); d.writeBytes("IEND"); d.writeInt(crc32("IEND".getBytes("US-ASCII")))
    out.toByteArray
  }

  /** Fixture encoder: a real JPEG prefix (SOI + SOF0 baseline frame
    * header, 3 components) with the given dimensions.
    */
  private[graft] def jpegHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeShort(0xffd8) // SOI
    d.writeShort(0xffc0); d.writeShort(17) // SOF0, segment length
    d.writeByte(8) // precision
    d.writeShort(h); d.writeShort(w)
    d.writeByte(3) // components
    for (cid <- 1 to 3) { d.writeByte(cid); d.writeByte(0x11); d.writeByte(0) }
    d.writeShort(0xffd9) // EOI
    out.toByteArray
  }

  /** Frame-sampling stub: slice the payload into `n` evenly-spaced
    * "frames" (byte windows) — the video-frame-sample plumbing with a
    * byte-slice standing in for frame decode.
    */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame =
    media.select(col("media_id"),
      explode(transform(sequence(lit(0), lit(n - 1)), i =>
        struct(i.as("frame_idx"),
          substring(col("payload"),
            (i * greatest(length(col("payload")) / n, lit(1)) + 1).cast(IntegerType),
            lit(frameBytes)).as("frame_bytes")))).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame_bytes"))
}
