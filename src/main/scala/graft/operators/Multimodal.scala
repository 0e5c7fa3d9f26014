package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY north-star): image/audio/video
  * payloads are opaque `binary` columns with a typed metadata struct. The
  * actual decode (JPEG → pixels, PCM → spectrogram, …) needs codec
  * libraries this container doesn't ship, so the decode kernel is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is
  * real: schema, batched per-partition processing (`mapPartitions`, the
  * Scala analogue of `mapInPandas` batch shape), partition sizing, and
  * fully-tested column contracts.
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

  /** STUB decode kernel — deterministic fake standing in for a real codec:
    * "decoding" a payload yields its byte length and a stable 60-bit
    * content digest (high 60 bits of MD5 — reproducible by any engine's
    * md5(), which is how the DuckDB oracle checks it). A real deployment
    * swaps `decodeBytes` for the codec call; everything around it
    * (batching, schema, partitioning) stays.
    */
  private[operators] def decodeBytes(payload: Array[Byte]): (Int, Long) = {
    // ??? real codec goes here — deterministic fake below
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

  /** Batched feature extraction over partitions — the `mapInPandas` batch
    * shape in Scala: one iterator pass per partition, no driver collect,
    * output schema declared up front. The fake "feature" is an 8-dim
    * digest-derived vector standing in for an image embedding.
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
          val (len, digest) = decodeBytes(payload)
          val feat = Array.tabulate(8)(i =>
            (((digest >>> (i * 8)) & 0xffL).toFloat / 255.0f))
          Row(id, modality, len, digest, feat.toSeq)
        }
      }
    }(enc)
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
