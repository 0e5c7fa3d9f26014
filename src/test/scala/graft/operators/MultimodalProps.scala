package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the image header probe: a byte parser fed from an
  * untrusted binary column must never throw, and must round-trip the
  * dimensions the fixture encoders plant.
  */
object MultimodalProps extends Properties("Multimodal.probeImage") {

  property("never throws on arbitrary bytes") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) { b =>
      Multimodal.probeImage(b)
      true
    }

  // adversarial: arbitrary garbage BEHIND a valid magic prefix — the
  // marker walk / length fields see hostile values
  private val magics = Gen.oneOf(
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    Array(0xff, 0xd8).map(_.toByte),
    "GIF89a".getBytes("US-ASCII"))

  property("never throws on garbage behind a valid magic") =
    forAll(magics, Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      (magic, rest) =>
        Multimodal.probeImage(magic ++ rest)
        true
    }

  property("PNG fixture round-trips any planted dimensions") =
    forAll(Gen.choose(1, 1 << 24), Gen.choose(1, 1 << 24)) { (w, h) =>
      Multimodal.probeImage(Multimodal.pngHeaderBytes(w, h))
        .contains(("png", w, h, 3))
    }

  property("JPEG fixture round-trips any 16-bit dimensions") =
    forAll(Gen.choose(1, 65535), Gen.choose(1, 65535)) { (w, h) =>
      Multimodal.probeImage(Multimodal.jpegHeaderBytes(w, h))
        .contains(("jpeg", w, h, 3))
    }

  property("WebP VP8X fixture round-trips any 14-bit-plus canvas dims") =
    forAll(Gen.choose(1, 1 << 24), Gen.choose(1, 1 << 24), Gen.oneOf(true, false)) {
      (w, h, alpha) =>
        Multimodal.probeImage(Multimodal.webpHeaderBytes(w, h, alpha))
          .contains(("webp", w, h, if (alpha) 4 else 3))
    }

  property("WAV fixture round-trips channels/rate/frames/mean exactly") =
    forAll(Gen.choose(1, 2), Gen.oneOf(8000, 16000, 22050, 44100, 48000),
        Gen.choose(1, 500), Gen.choose(-32768, 32767)) { (ch, rate, frames, amp) =>
      Multimodal.decodeAudio(Multimodal.constWavBytes(ch, rate, frames, amp))
        .contains(("wav", ch, rate, 16, frames.toLong, Some(amp.toDouble)))
    }

  property("MP4 fixture round-trips dims and timescale-correct duration") =
    forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
        Gen.oneOf(200, 500, 1000, 90000), Gen.choose(0, 1 << 24)) {
      (w, h, ts, dur) =>
        Multimodal.probeVideo(Multimodal.mp4HeaderBytes(w, h, ts, dur))
          .contains(("mp4/isom", w, h, dur.toLong * 1000L / ts,
            Some("avc1"), None))
    }

  property("MP4 fixture round-trips codec fourcc and btrt avg bitrate") =
    forAll(Gen.oneOf("avc1", "hev1", "av01", "vp09", "mp4a"),
        Gen.choose(1, Int.MaxValue), Gen.choose(1, 65535)) { (codec, bps, w) =>
      Multimodal.probeVideo(Multimodal.mp4HeaderBytes(w, w, 1000, 1000, codec, bps))
        .contains(("mp4/isom", w, w, 1000L, Some(codec), Some(bps.toLong)))
    }

  property("WebP/AVIF fixtures round-trip the alpha/animation header flags") =
    forAll(Gen.oneOf(true, false), Gen.oneOf(true, false),
        Gen.oneOf(true, false)) { (alpha, anim, avifSide) =>
      if (avifSide)
        Multimodal.probeImageFlags("avif",
          Multimodal.avifHeaderBytes(9, 9, alpha, anim)) ==
          (Some(alpha), Some(anim))
      else
        Multimodal.probeImageFlags("webp",
          Multimodal.webpHeaderBytes(9, 9, alpha, anim)) ==
          (Some(alpha), Some(anim))
    }

  property("probeImageFlags never throws on arbitrary bytes for any format tag") =
    forAll(Gen.oneOf("png", "jpeg", "gif", "bmp", "webp", "avif", "???"),
        Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      (fmt, bytes) =>
        Multimodal.probeImageFlags(fmt, bytes)
        true
    }

  property("probeVideo never throws on hostile box sizes (0, 1, >=2^31)") =
    forAll(Gen.oneOf(0, 1, 8, 16, 0x7fffffff, 0x80000010, -1),
        Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      (sz, rest) =>
        val b = java.nio.ByteBuffer.allocate(16 + rest.length)
        b.putInt(16).put("ftypisom".getBytes("US-ASCII")).putInt(0)
          .position(0)
        val arr = b.array().clone()
        val hostile = arr.take(16) ++ {
          val h = java.nio.ByteBuffer.allocate(8)
          h.putInt(sz).put("moov".getBytes("US-ASCII")); h.array()
        } ++ rest
        Multimodal.probeVideo(hostile)
        true
    }

  property("probeVideo never throws on garbage behind an ftyp magic") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      rest =>
        Multimodal.probeVideo(
          Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++ rest)
        true
    }

  property("FLAC fixture round-trips rate/channels and exact duration math") =
    forAll(Gen.choose(1, 8), Gen.choose(1, (1 << 20) - 1),
        Gen.choose(0L, (1L << 36) - 1)) { (ch, rate, samples) =>
      Multimodal.probeAudioHeader(Multimodal.flacHeaderBytes(ch, rate, samples))
        .contains(("flac", ch, rate, samples * 1000L / rate))
    }

  property("probeAudioHeader never throws on bytes behind either magic") =
    forAll(Gen.oneOf("fLaC".getBytes("US-ASCII"), Array(0xff, 0xfb).map(_.toByte)),
        Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      (magic, rest) =>
        Multimodal.probeAudioHeader(magic ++ rest)
        true
    }

  property("decodeAudio never throws on arbitrary bytes") =
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        Multimodal.decodeAudio("RIFF".getBytes("US-ASCII") ++ bytes)
        true
    }
}
