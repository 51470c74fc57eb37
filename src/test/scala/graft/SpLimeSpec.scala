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
}
