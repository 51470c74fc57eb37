package graft

import graft.operators.LlmData
import org.apache.spark.sql.functions.{col, greatest, least}

/** Pins the LSH-banded embedding near-dup scale path (the branch
  * qDedupEmbed takes above EmbExactGate) pair-for-pair equal to the
  * exact all-pairs contract path on the fixture corpus, plus layout
  * determinism of the banded join.
  *
  * Fixture-path band parameters: the sf0.001 qualifying pairs sit at
  * cosine ≈ 0.4–0.5 (per-hyperplane collision p ≈ 0.63), so full
  * fixture recall needs 4-bit bands (p⁴ ≈ 0.158) and 64 tables
  * (miss ≈ e^{-64·0.158} ≈ 4e-5 per pair). The production scale path
  * derives its table count from τ and the recall target
  * (lshTablesFor) and is tuned for the ≥0.7-cosine near-dup regime —
  * see the EmbScaleBits scaladoc for the math.
  *
  * One-off sweep (2026-08-13, this build): with these 4-bit/64-table
  * parameters the LSH path is pair-for-pair equal to exact all-pairs
  * at ALL harness scales — 66/66 (sf0.001), 59/59 (sf0.01), 920/920
  * (sf0.1) — not just the sf0.001 fixture this spec pins.
  */
class DedupEmbedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select("a_id", "b_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted

  test("LSH-banded path equals exact all-pairs output pair-for-pair") {
    val exact = pairs(LlmData.qDedupEmbed(spark, dir)) // fixture n=500 ≤ gate → exact path
    assert(exact.nonEmpty, "fixture should contain qualifying cosine pairs")
    val emb = LlmData.embWithNorms(spark, dir)
    val lsh = pairs(LlmData.embNearDupLsh(emb, 0.4, bits = 4, tables = 64, seed = LlmData.EmbLshSeed))
    assert(lsh == exact,
      s"LSH path diverged: missing=${exact.diff(lsh)} extra=${lsh.diff(exact)}")
  }

  test("banded join is deterministic under partition layout changes") {
    val emb = LlmData.embWithNorms(spark, dir)
    val p1 = pairs(LlmData.embNearDupLsh(emb, 0.4, bits = 4, tables = 64, seed = LlmData.EmbLshSeed))
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val p2 = try pairs(LlmData.embNearDupLsh(
      emb.repartition(3), 0.4, bits = 4, tables = 64, seed = LlmData.EmbLshSeed))
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(p1 == p2, "LSH pairs changed under different partitioning")
  }

  test("table-count derivation matches the documented operating points") {
    import LlmData.{lshTablesFor, EmbScaleBits, EmbLshRecallTarget, EmbLshMaxTables}
    assert(lshTablesFor(0.9, EmbScaleBits, EmbLshRecallTarget) === 36L)
    assert(lshTablesFor(0.7, EmbScaleBits, EmbLshRecallTarget) <= EmbLshMaxTables)
    // the registered τ = 0.4 is infeasible for banding — the scale
    // path must refuse it, never run it at a few percent recall
    assert(lshTablesFor(0.4, EmbScaleBits, EmbLshRecallTarget) > EmbLshMaxTables)
  }

  test("production band parameters find planted near-identical pairs") {
    // The fixture's qualifying pairs are all borderline (≈0.4–0.5), so
    // the production-regime guarantee is exercised on planted
    // near-identical vectors instead: at cosine ≈ 0.999 the per-band
    // collision probability is p¹⁶ ≈ 0.77, so even the τ=0.9-derived
    // 36 tables miss a pair with probability (0.23)³⁶ ≈ 1e-23 —
    // every planted pair must appear.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.sqrt
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian())
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    for (i <- 0 until 20) {
      val base = vec()
      val dup = base.zip(vec()).map { case (x, e) => x + 0.05 * e }
      rows += ((2L * i, base)); rows += ((2L * i + 1, dup))
    }
    for (j <- 0 until 160) rows += ((1000L + j, vec()))
    val emb = rows.toSeq.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotF64(col("v"), col("v"))))
    val tables = LlmData.lshTablesFor(0.9, LlmData.EmbScaleBits, LlmData.EmbLshRecallTarget)
    val found = LlmData.embNearDupLsh(
        emb, 0.9, LlmData.EmbScaleBits, tables.toInt, LlmData.EmbLshSeed)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 20)
      assert(found.contains((2L * i, 2L * i + 1)), s"planted pair $i missed")
  }

  test("semantic dedup composes on the ANN kNN graph: clusters equal the exact-graph clusters") {
    // The SemDeDup shape at corpus scale: threshold the kNN graph's
    // edges, connected-components the survivors, keep the min-id
    // representative. Composability contract: running that pipeline on
    // the ANN graph (q_emb_knn_ann) yields the SAME clusters as on
    // the exact graph (q_emb_knn) at the same (k, τ) on the fixture —
    // i.e. the approximation loses no edge that matters to clustering.
    def edges(g: org.apache.spark.sql.DataFrame) = g
      .filter(col("cosine") >= 0.4)
      .select(least(col("vec_id"), col("neighbor_id")).as("a_id"),
        greatest(col("vec_id"), col("neighbor_id")).as("b_id"))
      .distinct()
    def clusters(g: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      LlmData.clusterPairs(edges(g), spark)
        .select("doc_id", "cluster_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = clusters(LlmData.qEmbKnn(spark, dir))
    val ann = clusters(LlmData.qEmbKnnAnn(spark, dir))
    assert(exact.nonEmpty, "fixture should produce at least one cluster edge")
    assert(ann == exact,
      s"ANN-graph clusters diverged: missing=${exact.toSet.diff(ann.toSet)} " +
        s"extra=${ann.toSet.diff(exact.toSet)}")
  }
}
