package graft

import graft.operators.LlmData
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** End-to-end 100 TB-shape pipeline soak: ONE composed run —
  * quality filter → exact text dedup → (minhash text pairs ∪
  * embedding LSH pairs) → multimodal clusters → keep/drop verdict →
  * mixture weights → train/val/test split — with every stage FORCED
  * onto its above-gate scale path (banded minhash, hyperplane LSH,
  * distributed pointer-halving closure) at 50k docs, pinned
  * row-for-row equal to the same composition on the exact below-gate
  * paths. The per-operator equalities exist in ScaleOpsSpec /
  * DedupEmbedSpec; what THIS spec grades is the COMPOSITION — that
  * chaining the gated paths through shared intermediates (quality
  * survivors feed the dedup, dedup winners feed the pair builders,
  * the union graph feeds the closure, the verdict feeds the mixture)
  * introduces no divergence and no corpus-sized operator.
  *
  * Plant layout (all id ranges disjoint unless the overlap is the
  * point):
  *  - text near-dups: (2i, 2i+1) for i < 1000 share 30/32 shingles
  *    (Jaccard ≈ 0.882) — the ScaleOpsSpec banded fixture
  *  - exact text dups: (3000+j, 3500+j) for j < 200 have IDENTICAL
  *    shingles/text — caught by the exact-dedup stage BEFORE the pair
  *    builders, so the pair graph never sees the loser
  *  - embed near-dups: (5000+i, 8000+i) for i < 300 at cosine ≈ 0.999
  *  - MULTIMODAL plants: (2i, 6000+i) for i < 100 are embedding
  *    near-dups of docs that are ALSO text near-dups of 2i+1 — the
  *    union graph must merge {2i, 2i+1, 6000+i} into one cluster,
  *    which only the composed run exercises
  * Everything else is per-doc-unique vocab / independent gaussians,
  * so the expected pair set is exactly the planted set filtered by
  * the quality gate — computed independently below and asserted
  * against BOTH compositions.
  */
class PipelineSpec extends SparkSpec {

  private val nDocs = 50000L
  private val nEmb = 10000L // docs 0..9999 carry embeddings

  /** The synthetic corpus: (doc_id, source, text, shingles, sz). */
  private def corpus(s: SparkSession, nD: Long = nDocs): DataFrame = {
    s.range(nD).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(4))).as("source"),
      expr("""CASE
              |  WHEN id < 2000 THEN concat(
              |    transform(sequence(0, 29), j -> concat('p', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))),
              |    transform(sequence(0, 1),  j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING))))
              |  WHEN id >= 3500 AND id < 3700 THEN
              |    transform(sequence(0, 31), j -> concat('u', CAST(id - 500 AS STRING), '_', CAST(j AS STRING)))
              |  ELSE transform(sequence(0, 31), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING)))
              |END""".stripMargin).as("shingles"))
      .withColumn("sz", size(col("shingles")))
      .withColumn("text", array_join(col("shingles"), " "))
  }

  /** Embeddings for docs 0..9999: seeded gaussians; dup copies add
    * 0.03σ noise to their base vector (cosine ≈ 0.999 in 64-d).
    */
  private def embCorpus(s: SparkSession, nE: Long = nEmb): DataFrame = {
    import s.implicits._
    s.range(nE).as[Long].map { id =>
      val base =
        if (id >= 8000 && id < 8300) 5000 + (id - 8000)
        else if (id >= 6000 && id < 6100) 2 * (id - 6000)
        else id
      val rnd = new java.util.Random(0xC0FFEE ^ base)
      val v = Array.fill(64)(rnd.nextGaussian())
      if (base != id) {
        val nr = new java.util.Random(0xBEEF ^ id)
        var i = 0
        while (i < 64) { v(i) += 0.03 * nr.nextGaussian(); i += 1 }
      }
      (id, v)
    }.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotF64(col("v"), col("v"))))
  }

  /** The quality gate: a deterministic ~4% drop — the screen's SHAPE
    * (a scan-side filter that gates every downstream stage) is what
    * the soak composes; the scoring formulas have their own oracle
    * rows (q_quality_gopher / q_quality_c4).
    */
  private def qualityKeep = pmod(xxhash64(col("doc_id")), lit(25)) =!= 0

  private case class Composed(edges: DataFrame, clusters: DataFrame,
      verdict: DataFrame, mix: DataFrame, split: DataFrame)

  /** The composed pipeline, parameterized by the pair-path forcers so
    * the SAME glue runs above-gate and below-gate. Mirrors the
    * registered operators' own shapes: qDedupExact's min-id window,
    * qDedupMultimodal's union → closure → broadcast-membership join,
    * qDedupApply's two-broadcast verdict, qMixWeights' O(sources)
    * aggregate, qSampleSplit's hash split.
    */
  private def compose(s: SparkSession,
      textPairsF: DataFrame => DataFrame,
      embPairsF: DataFrame => DataFrame,
      driverEdgeMax: Long,
      nD: Long = nDocs, nE: Long = nEmb): Composed = {
    // stage 1: quality gate (everything downstream sees survivors only)
    val docs = corpus(s, nD).filter(qualityKeep)
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val emb = embCorpus(s, nE)
      .join(docs.select(col("doc_id").as("vec_id")), "vec_id")
    // stage 2: exact text dedup — keep each text group's min doc_id
    val wT = Window.partitionBy("text").orderBy("doc_id")
    val ranked = docs.withColumn("rn", row_number().over(wT))
    val losers = ranked.filter(col("rn") > 1).select(col("doc_id"), lit(1).as("l"))
    val winners = ranked.filter(col("rn") === 1)
    // stage 3: near-dup pair graphs on the winner set, both modalities
    val sh = winners.select("doc_id", "shingles", "sz")
    val embW = emb.join(winners.select(col("doc_id").as("vec_id")), "vec_id")
    val edges = textPairsF(sh).select("a_id", "b_id")
      .union(embPairsF(embW).select("a_id", "b_id"))
      .distinct()
    // stage 4: connected components (multimodal clusters)
    val clusters = LlmData.clusterPairs(edges, s, driverEdgeMax)
    // stage 5: keep/drop verdict — corpus joins only the two SMALL
    // tables (losers, cluster membership), both broadcast
    val verdict = docs.select("doc_id", "source", "sz")
      .join(broadcast(losers), Seq("doc_id"), "left")
      .join(broadcast(clusters.select("doc_id", "cluster_id")), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("l").isNotNull, "dup_text")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"), "near_dup")
          .otherwise("keep"))
      .select(col("doc_id"), col("source"), col("sz"),
        (col("reason") === "keep").as("keep"), col("reason"))
    // stage 6: mixture weights over the kept docs (qMixWeights shape,
    // sz as the token count)
    val kept = verdict.filter(col("keep"))
    val per = kept.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("sz")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("nsrc"))
    val mix = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") * lit(1.0) / col("t"), 6).as("tok_share"),
        round(least(col("t") * lit(1.0) / (col("nsrc") * col("n_tokens")), lit(5.0)), 6).as("weight"))
    // stage 7: deterministic train/val/test split of the kept docs
    val split = kept
      .withColumn("split",
        when(pmod(xxhash64(col("doc_id"), lit(7)), lit(10)) < 8, "train")
          .when(pmod(xxhash64(col("doc_id"), lit(7)), lit(10)) === 8, "val")
          .otherwise("test"))
      .groupBy("source", "split").agg(count(lit(1)).as("n_docs"))
    Composed(edges, clusters, verdict, mix, split)
  }

  test("composed above-gate pipeline equals the exact composition at 50k docs") {
    val s = spark
    import s.implicits._
    val embTables = LlmData.lshTablesFor(0.9, LlmData.EmbScaleBits,
      LlmData.EmbLshRecallTarget).toInt
    // ABOVE-GATE: banded minhash text pairs, hyperplane-LSH embed
    // pairs, distributed pointer-halving closure (driver budget 0)
    val t0 = System.nanoTime()
    val above = compose(s,
      sh => LlmData.textPairsBanded(sh, 0.3, s),
      e => LlmData.embNearDupLsh(e, 0.9, LlmData.EmbScaleBits, embTables,
        LlmData.EmbLshSeed),
      driverEdgeMax = 0L)
    val aEdges = above.edges.as[(Long, Long)].collect().sorted.toSeq
    val aClusters = above.clusters.collect().map(_.toString).sorted.toSeq
    val aVerdict = above.verdict.collect().map(_.toString).sorted.toSeq
    val aMix = above.mix.collect().map(_.toString).sorted.toSeq
    val aSplit = above.split.collect().map(_.toString).sorted.toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"above-gate composition over $nDocs docs: ${aEdges.length} edges, " +
      f"${aClusters.length} clustered docs in $secs%.1f s " +
      f"(closure rounds: ${LlmData.lastClosureRounds})")
    assert(LlmData.lastClosureRounds > 0,
      "driverEdgeMax=0 must force the distributed closure")
    // BELOW-GATE: exact shared-shingle Jaccard, exact all-pairs
    // cosine, driver union-find closure
    val below = compose(s,
      sh => LlmData.jaccardPairs(sh, 0.3, s),
      e => LlmData.embIncrementalPairs(e, t = -1L, tau = 0.9, s, nEmb,
        exactGate = Long.MaxValue),
      driverEdgeMax = 1L << 20)
    val bEdges = below.edges.as[(Long, Long)].collect().sorted.toSeq
    assert(aEdges == bEdges, "composed pair graphs diverged " +
      s"(above ${aEdges.length}, below ${bEdges.length})")
    assert(aClusters == below.clusters.collect().map(_.toString).sorted.toSeq,
      "composed cluster tables diverged")
    assert(aVerdict == below.verdict.collect().map(_.toString).sorted.toSeq,
      "composed keep/drop verdicts diverged")
    assert(aMix == below.mix.collect().map(_.toString).sorted.toSeq,
      "composed mixture weights diverged")
    assert(aSplit == below.split.collect().map(_.toString).sorted.toSeq,
      "composed split censuses diverged")

    // INDEPENDENT expectation: the planted pair set filtered by the
    // quality gate — the composition may surface exactly these edges
    // (plants are disjoint and non-planted vocab/vectors are
    // per-doc-unique, so any extra edge is a false positive and any
    // missing edge a lost plant)
    val keptIds = corpus(s).filter(qualityKeep)
      .filter(col("doc_id") < 10000)
      .select("doc_id").as[Long].collect().toSet
    val expText = (0 until 1000)
      .map(i => (2L * i, 2L * i + 1))
      .filter { case (a, b) => keptIds(a) && keptIds(b) }
    val expEmb = ((0 until 300).map(i => (5000L + i, 8000L + i)) ++
        (0 until 100).map(i => (2L * i, 6000L + i)))
      .filter { case (a, b) => keptIds(a) && keptIds(b) }
    val expected = (expText ++ expEmb).sorted
    assert(aEdges == expected,
      s"pair graph is not exactly the quality-surviving planted set " +
        s"(got ${aEdges.length}, expected ${expected.length})")

    // the multimodal merge: for a planted triple that fully survives
    // the gate, text pair (2i, 2i+1) and embed pair (2i, 6000+i) must
    // collapse into ONE cluster
    val triple = (0 until 100).map(i => (2L * i, 2L * i + 1, 6000L + i))
      .find { case (a, b, c) => keptIds(a) && keptIds(b) && keptIds(c) }
      .getOrElse(fail("no planted multimodal triple survived the quality gate"))
    val byDoc = above.clusters.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    assert(byDoc(triple._1) == byDoc(triple._2) &&
        byDoc(triple._2) == byDoc(triple._3),
      s"multimodal triple $triple did not merge into one cluster: " +
        s"${byDoc(triple._1)}, ${byDoc(triple._2)}, ${byDoc(triple._3)}")

    // exact-dedup stage: surviving losers must read dup_text, and a
    // loser whose winner was quality-dropped must have been promoted
    val reasons = above.verdict.select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    val dupPlants = (0 until 200).map(j => (3000L + j, 3500L + j))
    dupPlants.foreach { case (w, l) =>
      if (keptIds(w) && keptIds(l))
        assert(reasons(l) == "dup_text", s"kept exact-dup loser $l: ${reasons(l)}")
      else if (!keptIds(w) && keptIds(l))
        assert(reasons(l) == "keep", s"promoted loser $l must keep: ${reasons(l)}")
    }
    assert(secs < 300, f"above-gate composition too slow: $secs%.1f s")

    // PLAN SHAPE of the composed above-gate run (no extra execution —
    // the plans are read off the already-materialized DataFrames):
    // 1. the edge build must not plan ANY unbounded pair operator —
    //    no cartesian product, no broadcast nested-loop join (the
    //    exact paths' all-pairs theta joins plan as BNLJ)
    def initial(df: DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
    val edgePlan = initial(above.edges)
    val allPairsOps = edgePlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(allPairsOps.isEmpty,
      s"above-gate edge build planned an all-pairs operator:\n$edgePlan")
    // 2. the verdict's corpus-side joins (losers, cluster membership)
    //    must arrive as broadcasts — the corpus never re-shuffles for
    //    pair-graph-sized tables
    val verdictPlan = initial(above.verdict)
    val bcasts = verdictPlan.collect { case e: BroadcastExchangeLike => e }.size
    assert(bcasts >= 2,
      s"verdict must broadcast losers + membership, saw $bcasts:\n$verdictPlan")
    val shuffles = verdictPlan.collect { case e: ShuffleExchangeLike => e }.size
    info(s"composed verdict plan: $shuffles shuffles, $bcasts broadcasts")
    s.catalog.clearCache() // pair builders + closure cache internally
  }

  test("200k-doc soak: above-gate composition scales ~linearly (opt-in, GRAFT_SOAK=1)") {
    // session-budget scale probe, excluded from the regular battery:
    // the SAME above-gate composition at 4x the corpus (plants and the
    // quality gate are id-anchored, so the expected pair set is
    // IDENTICAL — only the unique-doc bulk grows). Pins (a) the edge
    // set still equals the planted expectation at 200k, (b) no
    // all-pairs operator appears in the edge plan, (c) wall time grows
    // sublinearly-in-slack vs the 50k run measured in the same JVM —
    // a superlinear (pairwise) regression would blow the 4x budget.
    assume(sys.env.get("GRAFT_SOAK").contains("1"), "opt-in: set GRAFT_SOAK=1")
    val s = spark
    import s.implicits._
    val embTables = LlmData.lshTablesFor(0.9, LlmData.EmbScaleBits,
      LlmData.EmbLshRecallTarget).toInt
    def runAt(nD: Long, nE: Long): (Double, Seq[(Long, Long)]) = {
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val c = compose(s,
        sh => LlmData.textPairsBanded(sh, 0.3, s),
        e => LlmData.embNearDupLsh(e, 0.9, LlmData.EmbScaleBits, embTables,
          LlmData.EmbLshSeed),
        driverEdgeMax = 0L, nD = nD, nE = nE)
      val edges = c.edges.as[(Long, Long)].collect().sorted.toSeq
      // materialize every stage the 50k test materializes, so the
      // timing pair compares the same amount of work
      c.clusters.count(); c.verdict.count(); c.mix.count(); c.split.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val edgePlan = c.edges.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val allPairsOps = edgePlan.collect {
        case cp: org.apache.spark.sql.execution.joins.CartesianProductExec => cp
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(allPairsOps.isEmpty,
        s"edge build at $nD docs planned an all-pairs operator:\n$edgePlan")
      (secs, edges)
    }
    val (t50, e50) = runAt(50000L, 10000L)
    val (t200, e200) = runAt(200000L, 40000L)
    info(f"soak timing pair: 50k = $t50%.1f s, 200k = $t200%.1f s " +
      f"(ratio ${t200 / t50}%.2f vs linear 4.0)")
    assert(e200 == e50,
      s"planted edge set drifted with corpus growth (${e200.length} vs ${e50.length})")
    // independent expectation, same as the 50k test's
    val keptIds = corpus(s).filter(qualityKeep)
      .filter(col("doc_id") < 10000)
      .select("doc_id").as[Long].collect().toSet
    val expected = ((0 until 1000).map(i => (2L * i, 2L * i + 1)) ++
        (0 until 300).map(i => (5000L + i, 8000L + i)) ++
        (0 until 100).map(i => (2L * i, 6000L + i)))
      .filter { case (a, b) => keptIds(a) && keptIds(b) }.sorted
    assert(e200 == expected, s"200k edge set != planted expectation " +
      s"(got ${e200.length}, expected ${expected.length})")
    // linear budget with fixed-overhead slack: 4x data in <= 6x time
    assert(t200 <= 6.0 * t50 + 30.0,
      f"200k composition superlinear: $t50%.1f s -> $t200%.1f s")
    s.catalog.clearCache()
  }
}
