package graft.lime

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Counter-based deterministic RNG as Catalyst column expressions.
  *
  * LIME perturbation must be a pure function of
  * (seed, instance_id, sample_id, feature) — never of partition
  * layout. Spark's rand(seed) is partition-dependent (SURVEY.md §7.3),
  * so we derive uniforms from xxhash64 over the counter tuple and map
  * them through Acklam's inverse-normal-CDF approximation (public
  * algorithm, relative error < 1.15e-9). Everything stays inside
  * whole-stage codegen — no UDFs.
  */
object Rng {

  /** U(0,1) in [2^-54, 1): top 53 bits of xxhash64 over the counter
    * columns, never exactly 0 so ln(u) is safe.
    */
  def u01(counters: Column*): Column =
    (shiftrightunsigned(xxhash64(counters: _*), 11).cast("double") + lit(0.5)) / lit(9007199254740992.0) // 2^53

  private def horner(x: Column, coefs: Seq[Double]): Column =
    coefs.tail.foldLeft(lit(coefs.head): Column)((acc, c) => acc * x + lit(c))

  private val A = Seq(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
    1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
  private val B = Seq(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
    6.680131188771972e+01, -1.328068155288572e+01)
  private val C = Seq(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
    -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
  private val D = Seq(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
    3.754408661907416e+00)

  /** Acklam's Φ⁻¹(u): rational approximations on three regions. */
  def phiInv(u: Column): Column = {
    val pLow = 0.02425
    val qc = u - lit(0.5)
    val rc = qc * qc
    val central = horner(rc, A) * qc / (horner(rc, B) * rc + lit(1.0))
    val ql = sqrt(lit(-2.0) * log(u))
    val lower = horner(ql, C) / (horner(ql, D) * ql + lit(1.0))
    val qh = sqrt(lit(-2.0) * log(lit(1.0) - u))
    val upper = -(horner(qh, C) / (horner(qh, D) * qh + lit(1.0)))
    when(u < pLow, lower).when(u > lit(1.0 - pLow), upper).otherwise(central)
  }

  /** Standard normal draw for a counter tuple. */
  def gaussian(counters: Column*): Column = phiInv(u01(counters: _*))
}
