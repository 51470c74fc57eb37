package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BitsetIntersectCount, DotProductF64, MinhashSignature, PackedCharBigrams, SimHash64, WinnowFingerprints, WordBigramShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `SELECT dot_f64(a, b)` works from
  * SQL as well as the Column API. Activate with
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductF64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bitset_intersect_count"),
      new ExpressionInfo(classOf[BitsetIntersectCount].getName, "bitset_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BitsetIntersectCount(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("packed_char_bigrams"),
      new ExpressionInfo(classOf[PackedCharBigrams].getName, "packed_char_bigrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PackedCharBigrams(children(0))))
    ext.injectFunction((
      FunctionIdentifier("word_bigram_shingles"),
      new ExpressionInfo(classOf[WordBigramShingles].getName, "word_bigram_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordBigramShingles(children(0))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(children(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSignature(children(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children(0))))
  }
}
