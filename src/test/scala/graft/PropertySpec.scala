package graft

import graft.lime.{Lime, RidgeAggregator, RidgeSample}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property suite (SURVEY.md §5.4). Driver-side properties
  * of the LIME numerics — the distributed forms are exercised by
  * LimeSpec/DeterminismSpec; these pin the math over random inputs.
  * Also hosts the degenerate-input battery for the round-9 statistics
  * rows (gini / wmedian / zscore_peer), which needs the shared
  * session.
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("kernel: π(0)=1, π ∈ (0,1], monotonically decreasing in distance") {
    check("kernel", Prop.forAll(Gen.choose(0.0, 50.0), Gen.choose(0.1, 10.0)) { (d0, w0) =>
      // shrinking may step outside the generator ranges; clamp back
      val d = math.abs(d0)
      val w = math.max(math.abs(w0), 1e-3)
      def k(dist: Double) = math.sqrt(math.exp(-dist * dist / (w * w)))
      // k(d) can underflow to exactly 0.0 for d >> w — that's correct
      k(0.0) == 1.0 && k(d) >= 0.0 && k(d) <= 1.0 && k(d + 0.5) <= k(d)
    })
  }

  test("rng mix: u01 lands in [0,1) for arbitrary seed/instance/sample") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    check("u01", Prop.forAll(Gen.long, Gen.choose(0L, 1000000L), Gen.choose(0, 10000)) {
      (seed, inst, sample) =>
        val h = XxHash64Function.hash(inst * 100003L + sample, LongType, seed)
        val h2 = XxHash64Function.hash(inst * 100003L + sample, LongType, seed)
        val u = (h >>> 11).toDouble / (1L << 53).toDouble
        h == h2 && u >= 0.0 && u < 1.0
    })
  }

  test("ridge: recovers random noise-free linear models on binary corners") {
    val gen = for {
      d <- Gen.choose(2, 6)
      coefs <- Gen.listOfN(d, Gen.choose(-5.0, 5.0))
      icpt <- Gen.choose(-3.0, 3.0)
    } yield (coefs, icpt)
    check("ridge", Prop.forAll(gen) { case (coefs, icpt) =>
      val d = coefs.size
      val agg = new RidgeAggregator(d, 1e-6)
      var buf = agg.zero
      // all 2^d corners, repeated so ridge shrinkage is negligible
      for (_ <- 1 to 50; mask <- 0 until (1 << d)) {
        val z = Array.tabulate(d)(j => if ((mask >> j & 1) == 1) 1.0 else 0.0)
        val y = icpt + z.zip(coefs).map { case (a, b) => a * b }.sum
        buf = agg.reduce(buf, RidgeSample(z, y, 1.0))
      }
      val fit = agg.finish(buf)
      coefs.zip(fit.coefs).forall { case (truth, got) => math.abs(truth - got) < 1e-3 } &&
        math.abs(fit.intercept - icpt) < 1e-3
    }, n = 30)
  }

  test("hyperplane sigs: kernel bits equal naive sign-of-dot reference") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.VecKernels
    check("hyperplaneSigs", Prop.forAll(
      Gen.listOfN(8, Gen.choose(-5.0, 5.0)), Gen.choose(1L, 1000L)) { (vs, seed) =>
      val dim = 8; val tables = 3; val bits = 4
      val v = new GenericArrayData(vs.map(x => x: Any).toArray)
      val sigs = VecKernels.hyperplaneSigs(v, seed, tables, bits, dim)
      // naive reference: regenerate the same plane family and compare
      // each packed bit against the plain sign-of-dot computation
      val rnd = new java.util.Random(seed)
      val planes = Array.fill(tables * bits * dim)(rnd.nextGaussian())
      val ok = (0 until tables).forall { t =>
        val sig = sigs.getInt(t)
        (0 until bits).forall { b =>
          val off = (t * bits + b) * dim
          var d = 0.0
          var i = 0
          while (i < dim) { d += vs(i) * planes(off + i); i += 1 }
          ((sig >> b) & 1) == (if (d > 0) 1 else 0)
        }
      }
      // and the memoized plane cache must be deterministic across calls
      val again = VecKernels.hyperplaneSigs(v, seed, tables, bits, dim)
      ok && (0 until tables).forall(t => again.getInt(t) == sigs.getInt(t))
    }, n = 50)
  }

  test("bin edges: binOf counts edges strictly below, stays in [0,3]") {
    val cases = for {
      edgesRaw <- Gen.listOfN(3, Gen.choose(-100.0, 100.0))
      x <- Gen.choose(-150.0, 150.0)
    } yield (edgesRaw.sorted, x)
    // evaluate the Column expression in one batched Spark job
    val sampled = Iterator.continually(cases.sample).flatten.take(60).toSeq
    val s = SparkSpec.session
    sampled.grouped(20).foreach { grp =>
      val exprs = grp.zipWithIndex.map { case ((edges, x), i) =>
        Lime.binOf(lit(x), edges).as(s"b$i")
      }
      val row = s.range(1).select(exprs: _*).head()
      grp.zipWithIndex.foreach { case ((edges, x), i) =>
        val expected = edges.count(e => x > e)
        assert(row.getInt(i) == expected, s"x=$x edges=$edges")
      }
    }
  }

  test("degenerate-input battery: gini / wmedian / zscore_peer stay defined") {
    import graft.operators.Relational
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("degen").toString
    // customer: nation 1 is a SINGLETON peer group (σ = 0/0 without
    // the guard); segment EQ is all-equal balances (gini must be 0);
    // segment ZERO sums to zero (gini undefined → NULL, never NaN/∞)
    Seq(
      (1L, 1L, "EQ", BigDecimal("100.00")),
      (2L, 2L, "EQ", BigDecimal("100.00")),
      (3L, 2L, "EQ", BigDecimal("100.00")),
      (4L, 2L, "EQ", BigDecimal("100.00")),
      (5L, 2L, "ZERO", BigDecimal("5.00")),
      (6L, 2L, "ZERO", BigDecimal("-5.00")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$dir/customer.parquet")
    // lineitem: flag A has ZERO TOTAL WEIGHT (the cumw·2 ≥ totw filter
    // keeps every row → wmedian = min price, both engines); flag B is
    // all-equal prices (wmedian = the value)
    Seq(
      ("A", BigDecimal("30.00"), 1L, 1, BigDecimal("0.00")),
      ("A", BigDecimal("10.00"), 1L, 2, BigDecimal("0.00")),
      ("A", BigDecimal("20.00"), 2L, 1, BigDecimal("0.00")),
      ("B", BigDecimal("50.00"), 3L, 1, BigDecimal("2.00")),
      ("B", BigDecimal("50.00"), 3L, 2, BigDecimal("1.00")))
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")

    val gini = Relational.qAggGini(s, dir).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(gini("EQ").contains(0.0), s"all-equal gini must be 0, got ${gini("EQ")}")
    assert(gini("ZERO").isEmpty, s"zero-sum gini must be NULL, got ${gini("ZERO")}")

    val wm = Relational.qAggWeightedMedian(s, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(wm("B") == ((50.0, 3.0)), s"all-equal wmedian: ${wm("B")}")
    assert(wm("A") == ((10.0, 0.0)),
      s"zero-total-weight contract is min price + weight 0: ${wm("A")}")

    val z = Relational.qWinZscorePeer(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
    assert(z.values.forall(v => !v.isNaN && !v.isInfinite),
      s"z-scores must stay finite on degenerate groups: $z")
    assert(z((1L, 1L)) == 0.0,
      s"singleton peer group must z-score 0, got ${z((1L, 1L))}")
    // all-equal nation 2 balances vary, but the all-equal SEGMENT rows
    // within it are symmetric; just require every row defined
    assert(z.size == 4, s"top-3 per nation over {1:1 row, 2:5 rows}: $z")
  }
}
