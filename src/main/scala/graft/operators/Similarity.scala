package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (SURVEY north-star). Baseline: brute-force cosine top-k with a
  * broadcast query side (correct at any corpus size — the corpus is never
  * collected, only the query set is, and it's small by definition).
  * Scale path: sign-LSH bucketed search (probe only matching buckets) and
  * an IVF-style coarse quantizer (probe nearest centroids).
  */
object Similarity {

  /** Brute-force cosine top-k: queries × corpus via broadcast join (no
    * shuffle of the corpus), per-query top-k via window. Deterministic
    * tie-break on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
      .withColumn("cos", V.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cos"), 6).as("cosine"),
        col("rank"))
  }

  /** Sign-LSH bucketed ANN: corpus and queries bucketed by r-bit
    * hyperplane signs; candidates come only from the query's bucket (plus
    * optional multi-probe neighbors at Hamming distance 1), then exact
    * cosine rank within candidates. Recall < 1, cost ~ corpus/2^r per
    * query — the shape that survives 100 TB.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, bits: Int = 8, dim: Int = 64,
      multiProbe: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bkt", V.signLshBucket(col("cv"), bits, dim))
    val probes =
      if (multiProbe)
        array((0 to bits).map {
          case 0 => lit(0L)
          case i => lit(1L << (i - 1))
        }: _*)
      else array(lit(0L))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qb", V.signLshBucket(col("qv"), bits, dim))
      .withColumn("bkt", explode(transform(probes, m => col("qb").bitwiseXOR(m))))
      .drop("qb")
    val joined = c.join(broadcast(q), Seq("bkt"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", V.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    joined.dropDuplicates("query_id", "corpus_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cos"), 6).as("cosine"),
        col("rank"))
  }

  /** IVF-style coarse index: pick nlist deterministic seed centroids (the
    * first nlist corpus vectors by id — deterministic without a kmeans
    * dependency), assign every corpus vector to its nearest centroid (one
    * broadcast pass), and at query time probe the nprobe nearest lists.
    * At scale, `assigned` is written bucketed by `list_id` so a probe
    * reads only its lists' files.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val centroids = c.orderBy(col("corpus_id")).limit(nlist)
      .select(col("corpus_id").as("cent_id"), col("cv").as("centv"))
    val assigned = c.join(broadcast(centroids))
      .withColumn("d", V.l2Distance(col("cv"), col("centv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("corpus_id")).orderBy(col("d").asc, col("cent_id").asc)))
      .where(col("rn") === 1)
      .select(col("corpus_id"), col("cv"), col("cent_id").as("list_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val qLists = q.join(broadcast(centroids))
      .withColumn("d", V.l2Distance(col("qv"), col("centv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d").asc, col("cent_id").asc)))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("list_id"))
    val joined = assigned.join(broadcast(qLists), Seq("list_id"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cos", V.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cos"), 6).as("cosine"),
        col("rank"))
  }
}
