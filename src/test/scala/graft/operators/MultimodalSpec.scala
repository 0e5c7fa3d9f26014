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

  test("feature schema stable for null payloads") {
    val sp = spark; import sp.implicits._
    val withNull = Seq((9L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "modality", "payload")
    val f = Multimodal.extractFeatures(withNull).first()
    assert(f.isNullAt(f.fieldIndex("byte_size")))
  }
}
