package graft

import graft.lime.SpLime

/** SP-LIME submodular pick at production-shaped B (round-4 verdict
  * item 6): the driver loop is exactly B aggregation jobs (one per
  * greedy round — all remaining candidates scored in a single agg),
  * driver state O(B + d'); this spec pins the B=32 cost on a 10×
  * instance set under a wall-clock bound plus the submodularity
  * invariant (non-increasing marginal gains).
  */
class SpLimeSpec extends SparkSpec {

  test("B=32 pick over 2560 instances: B rounds, bounded wall clock, submodular gains") {
    val s = spark
    import s.implicits._
    // 2560 instances × 5 distinct features each from a 200-feature
    // pool, deterministic weights — ~10× the harness explanation set
    val rows = (0 until 2560).flatMap { i =>
      (0 until 5).map { k =>
        val f = (i * 7 + k) % 200
        (i.toLong, s"f$f", ((i % 17) + 1) * 0.1 + k * 0.01)
      }
    }
    val expl = rows.toDF("instance_id", "feature", "weight")
    val t0 = System.nanoTime()
    val picked = SpLime.pick(expl, 32)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"SP-LIME B=32 over 2560 instances: $secs%.1f s (${32} agg jobs)")
    assert(picked.length == 32, s"expected exactly B picks, got ${picked.length}")
    assert(picked.map(_._2).distinct.length == 32, "an instance was picked twice")
    assert(picked.map(_._1) == (0 until 32), "round numbering broken")
    // greedy coverage is submodular: marginal gains never increase
    val gains = picked.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"marginal gains increased across rounds: $gains")
    assert(secs < 150, f"SP-LIME too slow at B=32: $secs%.1f s")
  }

  test("coverage weights are sqrt of global importance (paper Algorithm 2, known optimum)") {
    val s = spark
    import s.implicits._
    // Fixture built so the PAPER's weighting (I_j = √Σᵢ|W_ij|) and a
    // naive unweighted feature count pick DIFFERENT first instances —
    // pinning the √-importance parity mechanically:
    //   f1 appears in instances 1 and 2 with Σ|W| = 100  → I = 10
    //   f2, f3, f4 appear only in instance 3, Σ|W| = 4 each → I = 2
    // Instance 3 covers three features (count coverage would pick it
    // first) but its weighted gain is 6 < 10, so Algorithm 2 must open
    // with instance 1 or 2 (tie broken by id → 1), then instance 3
    // (gain 6 — f1 already covered), then 2 (gain 0: nothing new).
    val expl = Seq(
      (1L, "f1", 60.0), (2L, "f1", 40.0),
      (3L, "f2", 4.0), (3L, "f3", 4.0), (3L, "f4", 4.0))
      .toDF("instance_id", "feature", "weight")
    val picked = SpLime.pick(expl, 3)
    assert(picked.map(_._2) == Seq(1L, 3L, 2L),
      s"greedy order diverged from the known optimum: $picked")
    val gains = picked.map(_._3)
    assert(math.abs(gains(0) - 10.0) < 1e-9 && math.abs(gains(1) - 6.0) < 1e-9 &&
      math.abs(gains(2)) < 1e-9,
      s"marginal gains diverged from the √-importance values: $gains")
    // negative weights contribute their magnitude to importance — the
    // paper's global importance is over |W|
    val withNeg = Seq((1L, "f1", -60.0), (2L, "f1", 40.0), (3L, "f2", 4.0),
      (3L, "f3", 4.0), (3L, "f4", 4.0)).toDF("instance_id", "feature", "weight")
    val p2 = SpLime.pick(withNeg, 1)
    assert(p2.map(_._2) == Seq(1L) && math.abs(p2.head._3 - 10.0) < 1e-9,
      s"|W| magnitude not used for importance: $p2")
  }
}
