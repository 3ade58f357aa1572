package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (`zip_with`/`aggregate`) so the whole
  * computation stays inside whole-stage codegen. All math in double
  * precision and strictly sequential element order — this makes results
  * bit-identical to a sequential engine (the DuckDB oracle).
  */
object VectorFunctions {

  /** Dot product of two array<numeric> columns (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot of two already-double arrays (skips the per-element cast —
    * use after projecting vectors with [[asDouble]]). Native loop
    * (graft.plans.VecDot); sequential order keeps oracle bit-parity. */
  def dotD(a: Column, b: Column): Column = graft.plans.VecDot.vecDot(a, b)

  /** Cast an array<float> to array<double> once, at projection time.
    * Pair-wise ops then avoid 2×dim casts per comparison. */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine from pre-projected double vectors and their pre-computed
    * norms: dot(a,b)/(na*nb) — identical arithmetic to [[cosine]]
    * (same sqrt-per-vector factorization), ~3× less work per pair. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dotD(a, b) / (na * nb)

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a
    * long. Hyperplane j's component d is a deterministic pseudo-random
    * value derived from xxhash64(j, d) mapped to [-1, 1] — no stored
    * model, reproducible across the cluster, and computed per-row
    * entirely in codegen'd expressions.
    */
  def hyperplaneSignature(vec: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { j =>
      // dot(vec, h_j) where h_j[d] = hash01(j, d) - 0.5
      val contrib = (0 until dim).map { d =>
        val h = xxhash64(lit(j), lit(d)).cast("double") / lit(Long.MaxValue.toDouble)
        element_at(vec, d + 1).cast("double") * (h)
      }.reduce(_ + _)
      when(contrib > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, c) => a.bitwiseOR(c))
  }
}
