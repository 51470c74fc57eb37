package graft.functions

/** DuckDB replay of Spark's `xxhash64` — shared by every oracle that
  * needs to re-derive a Spark hash bit-for-bit in SQL (the
  * `lime_perturb` RNG chain, the ANN family's hash-sampled centroid
  * picks). Spark's XXH64 (XxHash64Function, public Apache Spark
  * source; algorithm: Collet's xxHash, public domain) is ~10 wrapping
  * 64-bit ops per value, so DuckDB can replay it exactly: unsigned
  * 64-bit state lives in HUGEINT ∈ [0, 2⁶⁴), wrap-multiply is the
  * 32-bit-split identity a·b mod 2⁶⁴ = (a_lo·b + (a_hi·b mod 2³²)·2³²)
  * mod 2⁶⁴ (all intermediates < 2⁹⁷ — inside HUGEINT), rotations are
  * two exact power-of-two shifts, and xor round-trips through signed
  * BIGINT. Each step becomes ONE chained-CTE column, so the expression
  * tree stays linear (inlining would double per step through the split
  * multiply). Constant subchains (seed hashes, constant-string word /
  * tail values) fold at generation time in Scala BigInt — the same
  * public algorithm, executed once.
  */
private[graft] object XxSql {
  val MASK: BigInt = (BigInt(1) << 64) - 1
  val P1 = BigInt("9E3779B185EBCA87", 16); val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  val P3 = BigInt("165667B19E3779F9", 16); val P4 = BigInt("85EBCA77C2B2AE63", 16)
  val P5 = BigInt("27D4EB2F165667C5", 16)
  private val M64 = "18446744073709551616::HUGEINT"
  private val M32 = "4294967296::HUGEINT"
  def rotlC(x: BigInt, r: Int): BigInt = ((x << r) | (x >> (64 - r))) & MASK
  def mulC(a: BigInt, b: BigInt): BigInt = (a * b) & MASK

  /** hashLong folded entirely at generation time (both operands known). */
  def hashLongConst(v: BigInt, seed: BigInt): BigInt = {
    def fmixC(h0: BigInt): BigInt = {
      var h = h0
      h ^= h >> 33; h = mulC(h, P2); h ^= h >> 29; h = mulC(h, P3); h ^= h >> 32
      h
    }
    val h0 = (seed + P5 + 8) & MASK
    val k1 = mulC(rotlC(mulC(v, P2), 31), P1)
    fmixC(mulC(rotlC(h0 ^ k1, 27), P1) + P4 & MASK)
  }

  class Chain {
    val defs = scala.collection.mutable.ArrayBuffer[String]() // defs(i) defines column xi
    private def add(expr: String): String = { defs += expr; s"x${defs.size - 1}" }
    def mulmod(a: String, b: BigInt): String =
      add(s"((($a) % $M32) * $b::HUGEINT + ((($a) // $M32) * $b::HUGEINT % $M32) * $M32) % $M64")
    def addmod(a: String, c: BigInt): String = add(s"(($a) + $c::HUGEINT) % $M64")
    def rotl(a: String, r: Int): String =
      add(s"(($a) * ${BigInt(1) << r}::HUGEINT % $M64 + ($a) // ${BigInt(1) << (64 - r)}::HUGEINT)")
    def shr(a: String, r: Int): String = add(s"(($a) // ${BigInt(1) << r}::HUGEINT)")
    private def sgn(a: String): String =
      s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN CAST(($a) - $M64 AS BIGINT) ELSE CAST(($a) AS BIGINT) END)"
    private def unsgn(a: String): String =
      add(s"(CASE WHEN ($a) < 0 THEN CAST(($a) AS HUGEINT) + $M64 ELSE CAST(($a) AS HUGEINT) END)")
    def xor(a: String, b: String): String = unsgn(add(s"xor(${sgn(a)}, ${sgn(b)})"))
    def xorC(a: String, c: BigInt): String = {
      val lit = if (c >= (BigInt(1) << 63)) (c - (BigInt(1) << 64)).toString else c.toString
      unsgn(add(s"xor(${sgn(a)}, $lit::BIGINT)"))
    }
    def const(c: BigInt): String = add(s"$c::HUGEINT")
    def fmix(h0: String): String = {
      val a = xor(h0, shr(h0, 33)); val b = mulmod(a, P2)
      val c = xor(b, shr(b, 29)); val d = mulmod(c, P3)
      xor(d, shr(d, 32))
    }
    /** Spark XXH64.hashLong of a non-negative BIGINT column, constant seed. */
    def hashLongC(v: String, seed: BigInt): String = {
      val h0 = const((seed + P5 + 8) & MASK)
      val k1 = mulmod(rotl(mulmod(v, P2), 31), P1)
      fmix(addmod(mulmod(rotl(xor(h0, k1), 27), P1), P4))
    }
    /** Spark XXH64.hashInt of a column in [0, 2³²), dynamic seed. */
    def hashInt(v: String, seed: String): String = {
      val h0 = addmod(seed, P5 + 4)
      fmix(addmod(mulmod(rotl(xor(h0, mulmod(v, P1)), 23), P2), P3))
    }
    /** Spark XXH64.hashUnsafeBytes of a CONSTANT byte string (< 32 B),
      * dynamic seed — word/tail constants folded at generation time.
      */
    def hashConstBytes(bytes: Array[Byte], seed: String): String = {
      val n = bytes.length
      require(n < 32, "constant-string hash supports < 32 bytes")
      var h = addmod(seed, P5 + n)
      var off = 0
      while (off + 8 <= n) {
        val w = BigInt(1, bytes.slice(off, off + 8).reverse) // little-endian
        h = addmod(mulmod(rotl(xorC(h, mulC(rotlC(mulC(w, P2), 31), P1)), 27), P1), P4)
        off += 8
      }
      if (off + 4 <= n) {
        val w = BigInt(1, bytes.slice(off, off + 4).reverse)
        h = addmod(mulmod(rotl(xorC(h, mulC(w, P1)), 23), P2), P3)
        off += 4
      }
      while (off < n) {
        h = mulmod(rotl(xorC(h, mulC(BigInt(bytes(off) & 0xff), P5)), 11), P1)
        off += 1
      }
      fmix(h)
    }
    /** Rng.u01: top-53-bits uniform, identical association. */
    def u01(h: String): String =
      add(s"(CAST(${shr(h, 11)} AS DOUBLE) + 0.5) / 9007199254740992.0")
    /** Reinterpret the final unsigned state as Spark's SIGNED BIGINT
      * (xxhash64 returns LongType; `ORDER BY h` in a Spark plan is a
      * signed order, so replays must order by this form).
      */
    def signed(a: String): String =
      s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN CAST(($a) - $M64 AS BIGINT) ELSE CAST(($a) AS HUGEINT)::BIGINT END)"
    /** The chained CTEs: <p>0 AS (SELECT *, e0 AS x0 FROM base), ... */
    def ctes(base: String, prefix: String = "t"): (String, String) = {
      val parts = defs.zipWithIndex.map { case (e, i) =>
        val src = if (i == 0) base else s"$prefix${i - 1}"
        s"$prefix$i AS (SELECT *, $e AS x$i FROM $src)"
      }
      (parts.mkString(",\n"), s"$prefix${defs.size - 1}")
    }
  }
}
