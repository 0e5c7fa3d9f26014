package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    val sp = spark; import sp.implicits._
    Seq((1L, "hello world"), (2L, "hello world"), (3L, "different payload"))
      .toDF("doc_id", "text")
  }

  test("fromDocuments produces binary payload + typed metadata struct") {
    val m = Multimodal.fromDocuments(docs, "doc_id", "text")
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val r = m.where("media_id = 1").first()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("extractFeatures: deterministic digest, equal payloads equal features") {
    val f = Multimodal.extractFeatures(Multimodal.fromDocuments(docs, "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("byte_size"), r.getAs[Long]("content_digest"),
          r.getAs[scala.collection.Seq[Float]]("feature").toSeq)).toMap
    assert(f(1L) == f(2L))
    assert(f(1L)._1 == 11)
    assert(f(1L)._2 != f(3L)._2)
    assert(f(1L)._3.length == 8)
  }

  test("sampleFrames yields n frames per media row") {
    val frames = Multimodal.sampleFrames(
      Multimodal.fromDocuments(docs, "doc_id", "text"), n = 3)
    assert(frames.count() == 9)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame_bytes"))
  }

  test("probeImage parses PNG IHDR, JPEG SOF, GIF headers; rejects garbage") {
    assert(Multimodal.probeImage(Multimodal.pngHeaderBytes(640, 480))
      .contains(("png", 640, 480, 3)))
    assert(Multimodal.probeImage(Multimodal.pngHeaderBytes(33000, 2, colorType = 6))
      .contains(("png", 33000, 2, 4))) // width past a signed short
    assert(Multimodal.probeImage(Multimodal.jpegHeaderBytes(1920, 1080))
      .contains(("jpeg", 1920, 1080, 3)))
    // JPEG with an APP0/JFIF segment BEFORE the SOF0 — the marker walk
    // must skip non-frame segments by their length field
    val withApp0 = {
      val sof = Multimodal.jpegHeaderBytes(12, 34)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0xff.toByte, 0xd8.toByte, // SOI
        0xff.toByte, 0xe0.toByte, 0x00, 0x04, 0x4a, 0x46)) // APP0 len 4
      out.write(sof, 2, sof.length - 2) // rest after the fixture's SOI
      out.toByteArray
    }
    assert(Multimodal.probeImage(withApp0).contains(("jpeg", 12, 34, 3)))
    // GIF89a 320×200 logical screen, little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xc8.toByte, 0x00, 0, 0, 0)
    assert(Multimodal.probeImage(gif).contains(("gif", 320, 200, 3)))
    assert(Multimodal.probeImage("not an image at all".getBytes).isEmpty)
    assert(Multimodal.probeImage(Array.empty[Byte]).isEmpty)
  }

  test("decodeMedia keeps unparseable rows as null columns, 1:1 with input") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.pngHeaderBytes(100, 50)),
      (2L, "garbage".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeMedia(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3)
    assert(out(1L).getString(1) == "png" && out(1L).getInt(2) == 100)
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1))
  }

  test("decodePixels runs the real imageio codec: solid colors round-trip exactly") {
    for (fmt <- Seq("png", "gif", "bmp"); (r, g, b) <- Seq((7, 200, 13), (255, 0, 128))) {
      val bytes = Multimodal.solidImageBytes(fmt, 5, 3, r, g, b)
      // the payload is a genuine file of that format, not header-only
      assert(Multimodal.probeImage(bytes).map(_._1).contains(fmt))
      val Some((w, h, c, mr, mg, mb)) = Multimodal.decodePixels(bytes)
      assert((w, h, c) == (5, 3, 3), s"$fmt dims")
      assert((mr, mg, mb) == (r.toDouble, g.toDouble, b.toDouble), s"$fmt means")
    }
    // non-image bytes and truncated files decode to None, not an exception
    assert(Multimodal.decodePixels("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodePixels(
      Multimodal.solidImageBytes("png", 5, 3, 1, 2, 3).take(20)).isEmpty)
  }

  test("decodePixels averages real pixel content, not just metadata") {
    // half black / half white 4x2 → mean 127.5 per channel
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val Some((w, h, _, mr, mg, mb)) = Multimodal.decodePixels(out.toByteArray)
    assert((w, h) == (4, 2))
    assert((mr, mg, mb) == (127.5, 127.5, 127.5))
  }

  test("decodePixelStats: 1:1 rows, null columns for undecodable, format agrees with probe") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.solidImageBytes("gif", 6, 4, 10, 20, 30)),
      (2L, "garbage".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val out = Multimodal.decodePixelStats(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.size == 3)
    assert(out(1L).getAs[String]("format") == "gif")
    assert(out(1L).getAs[Int]("width") == 6 && out(1L).getAs[Int]("height") == 4)
    assert(out(1L).getAs[Double]("mean_g") == 20.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("format")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("width")))
  }

  test("probeImage parses BMP headers (dims + bit depth)") {
    val bytes = Multimodal.solidImageBytes("bmp", 31, 17, 1, 2, 3)
    assert(Multimodal.probeImage(bytes).contains(("bmp", 31, 17, 3)))
  }

  test("decodeAudio recovers format, frames, and exact mean from a real WAV") {
    val mono = Multimodal.constWavBytes(1, 8000, 200, -123)
    assert(Multimodal.decodeAudio(mono)
      .contains(("wav", 1, 8000, 16, 200L, Some(-123.0))))
    val stereo = Multimodal.constWavBytes(2, 44100, 50, 999)
    assert(Multimodal.decodeAudio(stereo)
      .contains(("wav", 2, 44100, 16, 50L, Some(999.0))))
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("decodeAudio handles big-endian PCM via the AIFF container") {
    // write the same constant-amplitude signal as AIFF (big-endian PCM16
    // through the JDK's own writer) — exercises the endianness branch
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, true)
    val raw = java.nio.ByteBuffer.allocate(60 * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    (0 until 60).foreach(_ => raw.putShort(777))
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw.array()), fmt, 60)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(Multimodal.decodeAudio(out.toByteArray)
      .contains(("aif", 1, 16000, 16, 60L, Some(777.0))))
  }

  test("decodeAudioStats maps a media frame with null rows intact") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.constWavBytes(2, 16000, 30, 5)),
      (2L, Array[Byte](0, 0, 0)),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeAudioStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("format") == "wav")
    assert(out(1L).getAs[Int]("channels") == 2)
    assert(out(1L).getAs[Long]("n_frames") == 30L)
    assert(out(1L).getAs[Double]("mean_amp") == 5.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("format")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("format")))
  }

  test("probeImage parses all three WebP flavors (VP8X / VP8 / VP8L)") {
    assert(Multimodal.probeImage(Multimodal.webpHeaderBytes(800, 600))
      .contains(("webp", 800, 600, 3)))
    assert(Multimodal.probeImage(Multimodal.webpHeaderBytes(1, 1, alpha = true))
      .contains(("webp", 1, 1, 4)))
    // VP8 lossy: frame tag + 9d 01 2a start code + 14-bit LE dims
    val vp8 = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8.put("RIFF".getBytes("US-ASCII")).putInt(22)
      .put("WEBP".getBytes("US-ASCII")).put("VP8 ".getBytes("US-ASCII"))
      .putInt(10).put(Array[Byte](0, 0, 0))
      .put(Array(0x9d, 0x01, 0x2a).map(_.toByte))
      .putShort(320.toShort).putShort(240.toShort)
    assert(Multimodal.probeImage(vp8.array()).contains(("webp", 320, 240, 3)))
    // VP8L lossless: 0x2f signature then (w-1) | (h-1)<<14 | alpha<<28
    val vp8l = java.nio.ByteBuffer.allocate(25)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8l.put("RIFF".getBytes("US-ASCII")).putInt(17)
      .put("WEBP".getBytes("US-ASCII")).put("VP8L".getBytes("US-ASCII"))
      .putInt(5).put(0x2f.toByte)
      .putInt(16 | (8 << 14) | (1 << 28))
    assert(Multimodal.probeImage(vp8l.array()).contains(("webp", 17, 9, 4)))
  }

  test("probeImage finds AVIF dims in the nested ispe box") {
    assert(Multimodal.probeImage(Multimodal.avifHeaderBytes(3840, 2160))
      .contains(("avif", 3840, 2160, 3)))
    assert(Multimodal.probeImage(Multimodal.avifHeaderBytes(1, 1))
      .contains(("avif", 1, 1, 3)))
    // avif brand but no ispe anywhere → unparseable, not a crash
    val noIspe = java.nio.ByteBuffer.allocate(24)
    noIspe.putInt(16).put("ftypavif".getBytes("US-ASCII")).putInt(0)
      .putInt(8).put("meta".getBytes("US-ASCII"))
    assert(Multimodal.probeImage(noIspe.array()).isEmpty)
  }

  test("decodeAudioStats maps an unknown frame count to null, not -1") {
    val sp = spark; import sp.implicits._
    // AU header with dataSize 0xffffffff (the spec's unknown-length
    // sentinel): the JDK reports AudioSystem.NOT_SPECIFIED frames
    val au = java.nio.ByteBuffer.allocate(32)
    au.put(".snd".getBytes("US-ASCII")).putInt(24).putInt(-1)
      .putInt(3).putInt(8000).putInt(1).putLong(0L)
    val media = Seq((1L, au.array())).toDF("media_id", "payload")
    val out = Multimodal.decodeAudioStats(media).collect()
    assert(out.length == 1)
    val r = out(0)
    // either the JDK reader declined (all-null row) or it must surface
    // null frames — never a negative count
    if (!r.isNullAt(r.fieldIndex("format"))) {
      assert(r.isNullAt(r.fieldIndex("n_frames")))
    }
  }

  test("probeImageFlags reads alpha/animation straight off the headers") {
    // PNG: alpha from IHDR color type; no acTL before IEND => not animated
    assert(Multimodal.probeImageFlags("png", Multimodal.pngHeaderBytes(4, 4, 6))
      == (Some(true), Some(false)))
    assert(Multimodal.probeImageFlags("png", Multimodal.pngHeaderBytes(4, 4, 2))
      == (Some(false), Some(false)))
    // APNG: an acTL chunk before IDAT flips the animation flag
    val png = Multimodal.pngHeaderBytes(4, 4, 2)
    val acTL = {
      val p = java.nio.ByteBuffer.allocate(20)
      p.putInt(8).put("acTL".getBytes("US-ASCII")).putInt(2).putInt(0).putInt(0)
      p.array()
    }
    val apng = png.take(33) ++ acTL ++ png.drop(33) // after IHDR's 25+8 bytes
    assert(Multimodal.probeImageFlags("png", apng) == (Some(false), Some(true)))
    // WebP VP8X feature bits
    assert(Multimodal.probeImageFlags("webp",
      Multimodal.webpHeaderBytes(9, 9, alpha = true, anim = true))
      == (Some(true), Some(true)))
    assert(Multimodal.probeImageFlags("webp",
      Multimodal.webpHeaderBytes(9, 9)) == (Some(false), Some(false)))
    // AVIF: avis brand => animated; auxC alpha urn => alpha
    assert(Multimodal.probeImageFlags("avif",
      Multimodal.avifHeaderBytes(8, 8, alpha = true, animated = false))
      == (Some(true), Some(false)))
    assert(Multimodal.probeImageFlags("avif",
      Multimodal.avifHeaderBytes(8, 8, alpha = false, animated = true))
      == (Some(false), Some(true)))
    // GIF headers cannot answer either question
    assert(Multimodal.probeImageFlags("gif", Array[Byte](1, 2, 3)) == (None, None))
  }

  test("decodeMedia surfaces has_alpha / is_animated columns") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.webpHeaderBytes(10, 10, alpha = true, anim = true)),
      (2L, Multimodal.avifHeaderBytes(10, 10, alpha = false, animated = true)),
      (3L, Multimodal.pngHeaderBytes(10, 10, 6))
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeMedia(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("has_alpha") &&
      out(1L).getAs[Boolean]("is_animated"))
    assert(!out(2L).getAs[Boolean]("has_alpha") &&
      out(2L).getAs[Boolean]("is_animated"))
    assert(out(3L).getAs[Boolean]("has_alpha") &&
      !out(3L).getAs[Boolean]("is_animated"))
  }

  test("probeAudioHeader parses FLAC STREAMINFO and MP3 frame headers") {
    // 2ch 44100 Hz, 44100 samples = exactly 1000 ms
    assert(Multimodal.probeAudioHeader(
      Multimodal.flacHeaderBytes(2, 44100, 44100L))
      .contains(("flac", 2, 44100, 1000L)))
    assert(Multimodal.probeAudioHeader(
      Multimodal.flacHeaderBytes(8, 192000, 96000L))
      .contains(("flac", 8, 192000, 500L)))
    // MPEG-1 Layer III, 44100 Hz, joint stereo: ff fb 90 40
    assert(Multimodal.probeAudioHeader(
      Array(0xff, 0xfb, 0x90, 0x40).map(_.toByte))
      .contains(("mp3", 2, 44100, -1L)))
    // MPEG-2 Layer III, 22050 Hz, mono: ff f3 90 c0
    assert(Multimodal.probeAudioHeader(
      Array(0xff, 0xf3, 0x90, 0xc0).map(_.toByte))
      .contains(("mp3", 1, 22050, -1L)))
    assert(Multimodal.probeAudioHeader("fLaX1234".getBytes("US-ASCII")).isEmpty)
  }

  test("probeAudioMeta maps a media frame; MP3 rows carry null duration") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.flacHeaderBytes(2, 16000, 32000L)),
      (2L, Array(0xff, 0xfb, 0x90, 0x40).map(_.toByte)),
      (3L, Array[Byte](9, 9, 9))
    ).toDF("media_id", "payload")
    val out = Multimodal.probeAudioMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("format") == "flac")
    assert(out(1L).getAs[Long]("duration_ms") == 2000L)
    assert(out(2L).getAs[String]("format") == "mp3")
    assert(out(2L).isNullAt(out(2L).fieldIndex("duration_ms")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("format")))
  }

  test("probeVideo walks real MP4 boxes: dims, timescale math, v0/v1") {
    val b = Multimodal.mp4HeaderBytes(640, 360, 1000, 2500)
    assert(Multimodal.probeVideo(b)
      .contains(("mp4/isom", 640, 360, 2500L, Some("avc1"), None)))
    // timescale 500: 2500 units = 5000 ms
    val b2 = Multimodal.mp4HeaderBytes(1920, 1080, 500, 2500)
    assert(Multimodal.probeVideo(b2)
      .contains(("mp4/isom", 1920, 1080, 5000L, Some("avc1"), None)))
    assert(Multimodal.probeVideo("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.probeVideo(Array[Byte](0, 0, 0, 3)).isEmpty)
  }

  test("probeVideo surfaces the stsd codec fourcc and btrt avg bitrate") {
    val b = Multimodal.mp4HeaderBytes(1280, 720, 1000, 9000, "hev1", 2500000)
    assert(Multimodal.probeVideo(b)
      .contains(("mp4/isom", 1280, 720, 9000L, Some("hev1"), Some(2500000L))))
    val audio = Multimodal.mp4HeaderBytes(0, 0, 1000, 9000, "mp4a", 128000)
    assert(Multimodal.probeVideo(audio)
      .contains(("mp4/isom", 0, 0, 9000L, Some("mp4a"), Some(128000L))))
  }

  test("probeVideo honors ISO-BMFF size==0 and size==1 largesize boxes") {
    val base = Multimodal.mp4HeaderBytes(320, 240, 200, 40)
    // rewrite moov's 32-bit size to 1 + inject the 8-byte largesize
    val moovAt = {
      var i = 0; var at = -1
      while (at < 0 && i + 8 <= base.length) {
        if (new String(base, i + 4, 4, "US-ASCII") == "moov") at = i
        else i += java.nio.ByteBuffer.wrap(base, i, 4).getInt
      }
      at
    }
    assert(moovAt > 0)
    val moovSize = java.nio.ByteBuffer.wrap(base, moovAt, 4).getInt
    val large = java.nio.ByteBuffer.allocate(base.length + 8)
    large.put(base, 0, moovAt)
      .putInt(1).put("moov".getBytes("US-ASCII"))
      .putLong(moovSize.toLong + 8)
      .put(base, moovAt + 8, base.length - moovAt - 8)
    assert(Multimodal.probeVideo(large.array())
      .contains(("mp4/isom", 320, 240, 200L, Some("avc1"), None)))
    // size==0: the final top-level box runs to end-of-buffer
    val toEnd = base.clone()
    java.nio.ByteBuffer.wrap(toEnd, moovAt, 4).putInt(0)
    assert(Multimodal.probeVideo(toEnd)
      .contains(("mp4/isom", 320, 240, 200L, Some("avc1"), None)))
    // hostile: a >= 2^31 size must clamp, not wrap an index negative
    val hostile = base.clone()
    java.nio.ByteBuffer.wrap(hostile, moovAt, 4).putInt(0x80000010)
    assert(Multimodal.probeVideo(hostile)
      .contains(("mp4/isom", 320, 240, 200L, Some("avc1"), None)))
  }

  test("probeVideoMeta maps a media frame with null rows intact") {
    val sp = spark; import sp.implicits._
    val media = Seq(
      (1L, Multimodal.mp4HeaderBytes(320, 240, 200, 40)),
      (2L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    ).toDF("media_id", "payload")
    val out = Multimodal.probeVideoMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("format") == "mp4/isom")
    assert(out(1L).getAs[Int]("width") == 320)
    assert(out(1L).getAs[Long]("duration_ms") == 200L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("format")))
  }

  test("feature schema stable for null payloads") {
    val sp = spark; import sp.implicits._
    val withNull = Seq((9L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "modality", "payload")
    val f = Multimodal.extractFeatures(withNull).first()
    assert(f.isNullAt(f.fieldIndex("byte_size")))
  }
}
