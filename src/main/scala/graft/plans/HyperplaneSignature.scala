package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH signature of an array<double> vector: `nBits`
  * sign bits packed into a long. Hyperplane j's component d is a
  * deterministic pseudo-random value in [-1, 1] derived from
  * `XXH64.hashInt(d, XXH64.hashInt(j, 42))` — exactly the value the
  * previous `xxhash64(lit(j), lit(d))` expression-tree formulation
  * produced, so signatures (and every LSH bucket) are unchanged.
  *
  * Why native: the expression-tree version materialized bits×dim
  * expression nodes (≈1 MiB task binaries at dim=64, and a janino
  * method-size blowup waiting to happen at real embedding dims of
  * 768–4096). Here the plan carries ONE node regardless of dim; the
  * hyperplane matrix is built lazily once per executor from the same
  * hash recurrence (deterministic — no model to store or broadcast)
  * and each row pays a plain nBits×dim dot-product loop.
  *
  * Implements `doGenCode` so LSH signing stays inside the scan's
  * whole-stage-codegen span (pattern: VecDot.scala).
  */
case class HyperplaneSignature(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1, 64], got $nBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  // (dim, matrix) cached per JVM; volatile pair-read keeps the benign
  // rebuild race safe when tasks share the expression instance.
  @transient @volatile private var cached: (Int, Array[Array[Double]]) = _

  private def planesFor(dim: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == dim) return c._2
    val p = Array.ofDim[Double](nBits, dim)
    var j = 0
    while (j < nBits) {
      val seedJ = XXH64.hashInt(j, 42L)
      var d = 0
      while (d < dim) {
        p(j)(d) = XXH64.hashInt(d, seedJ).toDouble / Long.MaxValue.toDouble
        d += 1
      }
      j += 1
    }
    cached = (dim, p)
    p
  }

  /** Called from both interpreted eval and generated code. */
  def signature(vec: ArrayData): Long = {
    val dim = vec.numElements()
    val planes = planesFor(dim)
    var sig = 0L
    var j = 0
    while (j < nBits) {
      val row = planes(j)
      var acc = 0.0
      var d = 0
      while (d < dim) { acc += vec.getDouble(d) * row(d); d += 1 }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(signature(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.signature($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  import org.apache.spark.sql.graftbridge.Bridge

  def hyperplaneSignature(vec: Column, nBits: Int): Column =
    Bridge.toColumn(HyperplaneSignature(Bridge.toExpression(vec), nBits))
}
