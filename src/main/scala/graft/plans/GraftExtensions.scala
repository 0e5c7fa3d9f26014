package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registrar for the engine's native expressions —
  * lets any session pick them up via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (the idiomatic
  * Catalyst plug-in route), in addition to the per-session
  * `HashExpressions.register` / `VectorExpressions.register` helpers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("minhash_sketch"),
      info("minhash_sketch", "minhash_sketch(shingles, k) - k-min sketch of a string array"),
      (exprs: Seq[Expression]) => MinHashSketch(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a string array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - normalized word n-grams"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        ShingleExpression.literalIntArg(exprs, "word_shingles"))))
    e.injectFunction((FunctionIdentifier("top_shingle_run"),
      info("top_shingle_run",
        "top_shingle_run(text, n) - struct(gram, cnt, norm_len): the most frequent word n-gram"),
      (exprs: Seq[Expression]) => TopShingleRun(exprs.head,
        ShingleExpression.literalIntArg(exprs, "top_shingle_run"))))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of numeric arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of numeric arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - euclidean distance of numeric arrays"),
      (exprs: Seq[Expression]) => L2Distance(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("char_entropy"),
      info("char_entropy", "char_entropy(text) - Shannon entropy (bits) of the code-point distribution"),
      (exprs: Seq[Expression]) => CharEntropy(exprs.head)))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((FunctionIdentifier("mat_vec"),
      info("mat_vec", "mat_vec(vec, flat_matrix) - dense row-major matrix x vector"),
      (exprs: Seq[Expression]) => MatVec(exprs.head, exprs(1))))
  }
}
