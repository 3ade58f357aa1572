package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distinct-count sketch column builders (HyperLogLog over an
  * md5-derived hash), engineered so an independent SQL engine can
  * replay every step bit-for-bit:
  *
  *  - the hash is `md5(cast(x as string))` — a public, engine-neutral
  *    function (xxhash64 exists only in Spark);
  *  - bucket/rho come from hex-string arithmetic (conv / leading-zero
  *    count), all integer-exact;
  *  - the harmonic denominator sum(2^-rho) is computed as an EXACT
  *    integer numerator sum(2^(57-rho)) in DECIMAL(38,0), so no
  *    floating-point fold order is involved — the only double ops are
  *    one division and (on the small-range branch) one ln, both
  *    deterministic IEEE round-to-nearest in any engine.
  *
  * The per-group state is the [[graft.plans.HllRegisters]] bank
  * (m bytes, map-side combined) — `count(distinct)` at 100 TB without
  * shuffling distinct values.
  */
object Sketches {

  /** Register count (2^8) — est. standard error 1.04/sqrt(m) ≈ 6.5%. */
  val M = 256

  /** Max rho: 56 hashed bits after the bucket byte, all-zero → 57. */
  val MaxRho = 57

  /** Lowercase-hex md5 of any column, the sketch's hash source. */
  def hashHex(x: Column): Column = md5(x.cast("string"))

  /** The (bucket, rho) struct [[graft.plans.HllRegisters]] consumes,
    * computed natively off the md5 digest bytes in one call
    * ([[graft.plans.Md5BucketRho]]) — bit-identical to
    * `struct(hllBucket(hashHex(x)), hllRho(hashHex(x)))` (same md5
    * bits, same arithmetic; the hex chain stays the ORACLE's replay
    * form) without materializing the 32-char hex string per row, and
    * cheap even when evaluated interpreted as an aggregate child. */
  def bucketRho(x: Column): Column =
    graft.plans.Md5BucketRho.md5BucketRho(x.cast("string"))

  /** DRIVER-SIDE twin of [[hashHex]] / Spark's `md5(binary)` on a
    * string's UTF-8 bytes — lowercase hex, byte-identical to DuckDB's
    * `md5(varchar)`. The ONE md5-to-hex definition shared by every
    * driver-side consumer (bucket routing, synthetic vocabulary,
    * specs), so oracle parity cannot drift between copies. */
  def md5HexLocal(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** HLL bucket = first 8 hash bits (2 hex chars) → [0, 256). */
  def hllBucket(hx: Column): Column =
    conv(substring(hx, 1, 2), 16, 10).cast("long")

  /** rho = 1 + number of leading zero BITS in hash bits 9..64
    * (14 hex chars), computed by hex-char arithmetic: 4 bits per
    * leading '0' char plus 0–3 bits from the first non-zero char. */
  def hllRho(hx: Column): Column = {
    val s14 = substring(hx, 3, 14)
    // leading-zero count via ltrim, not regexp_extract: value-identical
    // ('0'-stripping IS the leading-zero count) and an order of
    // magnitude cheaper per row — this sits on every row of every
    // sketched column
    val t = ltrim(s14, "0")
    val lz = lit(14) - length(t)
    val fc = substring(t, 1, 1)
    val extra = when(fc === "1", 3)
      .when(fc.isin("2", "3"), 2)
      .when(fc.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(lz === 14, MaxRho).otherwise(lz * 4 + extra + 1).cast("long")
  }

  /** Number of non-empty registers in a register bank. */
  def nonZero(regs: Column): Column =
    size(filter(regs, r => r > 0)).cast("long")

  /** Exact-integer harmonic numerator: sum over all m registers of
    * 2^(57-rho). An empty register (rho=0) contributes 2^(57-0) = 2^57
    * from the fold itself, so the fold starts at 0 — no separate
    * empty-register term (a prior revision added one AND folded over
    * empties, double-counting them whenever any register was empty).
    * DECIMAL(38,0) addition is exact, so accumulation order cannot
    * matter. */
  def harmonicNumerator(regs: Column): Column =
    aggregate(regs,
      lit(0).cast(DecimalType(38, 0)),
      (acc, r) => acc + pow(lit(2.0), lit(MaxRho) - r).cast(DecimalType(38, 0)))

  /** HLL cardinality estimate from a register bank: raw harmonic
    * estimate with the standard small-range linear-counting branch,
    * rounded to 4 decimals. */
  def hllEstimate(regs: Column): Column = {
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val zeros = lit(M) - nonZero(regs)
    val raw = alpha * lit(65536.0) * pow(lit(2.0), lit(MaxRho)) /
      harmonicNumerator(regs).cast("double")
    val est = when(zeros > 0 && raw <= lit(2.5 * M),
      lit(256.0) * log(lit(256.0) / zeros)).otherwise(raw)
    round(est, 4)
  }
}
