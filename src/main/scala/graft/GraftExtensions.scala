package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BitsetIntersectCount, DotProductF64, PackedCharBigrams, WordBigramShingles}

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
  }
}
