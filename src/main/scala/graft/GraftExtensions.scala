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
  // clean analysis-time arity failure instead of a silent drop of
  // extra args / IndexOutOfBounds on zero args
  private def one(name: String)(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(children.size == 1, s"$name requires exactly 1 argument, got ${children.size}")
    children.head
  }
  private def two(name: String)(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : (org.apache.spark.sql.catalyst.expressions.Expression,
         org.apache.spark.sql.catalyst.expressions.Expression) = {
    require(children.size == 2, s"$name requires exactly 2 arguments, got ${children.size}")
    (children.head, children(1))
  }
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (a, b) = two("dot_f64")(children); DotProductF64(a, b) }))
    ext.injectFunction((
      FunctionIdentifier("bitset_intersect_count"),
      new ExpressionInfo(classOf[BitsetIntersectCount].getName, "bitset_intersect_count"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (a, b) = two("bitset_intersect_count")(children); BitsetIntersectCount(a, b) }))
    ext.injectFunction((
      FunctionIdentifier("packed_char_bigrams"),
      new ExpressionInfo(classOf[PackedCharBigrams].getName, "packed_char_bigrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PackedCharBigrams(one("packed_char_bigrams")(children))))
    ext.injectFunction((
      FunctionIdentifier("word_bigram_shingles"),
      new ExpressionInfo(classOf[WordBigramShingles].getName, "word_bigram_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordBigramShingles(one("word_bigram_shingles")(children))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(one("winnow_fingerprints")(children))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSignature(one("minhash_signature")(children))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(one("simhash64")(children))))
  }
}
