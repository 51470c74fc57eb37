package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BitsetIntersectCount, DotProductF64, HyperplaneSigs, KarpRabinHash, KnnTopkKeys, MinhashSignature, PackedCharBigrams, SimHash64, SimHashPortable, WinnowFingerprints, WordBigramShingles}

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
      FunctionIdentifier("karp_rabin_hash"),
      new ExpressionInfo(classOf[KarpRabinHash].getName, "karp_rabin_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KarpRabinHash(one("karp_rabin_hash")(children))))
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
    ext.injectFunction((
      FunctionIdentifier("simhash_portable"),
      new ExpressionInfo(classOf[SimHashPortable].getName, "simhash_portable"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashPortable(one("simhash_portable")(children))))
    ext.injectFunction((
      FunctionIdentifier("knn_topk_keys"),
      new ExpressionInfo(classOf[KnnTopkKeys].getName, "knn_topk_keys"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 5,
          s"knn_topk_keys requires exactly 5 arguments (corpus, vec, nrm, self_id, k), got ${children.size}")
        // k picks the result arity at plan time — integer literal only
        val kExpr = children(4) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, t)
              if v != null && (t == org.apache.spark.sql.types.IntegerType ||
                               t == org.apache.spark.sql.types.LongType) =>
            v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"knn_topk_keys: k must be an integer literal, got ${other.sql}")
        }
        KnnTopkKeys(children.head, children(1), children(2), children(3), kExpr)
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSigs].getName, "hyperplane_sigs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 5,
          s"hyperplane_sigs requires exactly 5 arguments (vec, seed, tables, bits, dim), got ${children.size}")
        // the plane-set parameters select a deterministic hyperplane
        // family at plan time, so they must be integer literals — a
        // per-row column here would mean a different LSH family per
        // row, which is never meaningful
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, arg: String): Long = {
          import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
          e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, t)
                if v != null && (t == IntegerType || t == LongType || t == ShortType || t == ByteType) =>
              v.toString.toLong
            case other => throw new IllegalArgumentException(
              s"hyperplane_sigs: $arg must be an integer literal, got ${other.sql}")
          }
        }
        // range-checked narrowing: a silent .toInt would truncate an
        // out-of-range BIGINT literal (4294967297 -> 1 table) and run
        // a structurally wrong LSH family without any error
        def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression, arg: String): Int = {
          val v = intLit(e, arg)
          require(v >= Int.MinValue && v <= Int.MaxValue,
            s"hyperplane_sigs: $arg must fit in an Int, got $v")
          v.toInt
        }
        HyperplaneSigs(children.head,
          intLit(children(1), "seed"),
          intArg(children(2), "tables"),
          intArg(children(3), "bits"),
          intArg(children(4), "dim"))
      }))
  }
}
