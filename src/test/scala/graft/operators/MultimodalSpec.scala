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

  test("feature schema stable for null payloads") {
    val sp = spark; import sp.implicits._
    val withNull = Seq((9L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "modality", "payload")
    val f = Multimodal.extractFeatures(withNull).first()
    assert(f.isNullAt(f.fieldIndex("byte_size")))
  }
}
