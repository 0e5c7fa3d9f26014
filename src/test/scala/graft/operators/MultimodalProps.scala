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
}
