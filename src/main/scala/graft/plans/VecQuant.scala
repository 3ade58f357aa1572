package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types._

/** Symmetric int8 quantization statistics for an embedding vector in
  * one native pass — the storage-compression primitive of an
  * embedding pipeline (a 4-byte-float corpus quantized to int8 is 4×
  * smaller on disk and in shuffle).
  *
  *   scale = max|v| / 127        (0 for the all-zero vector)
  *   q_i   = floor(v_i/scale + 0.5)   (explicit half-up — engine-
  *           independent, unlike banker's-rounding `rint`)
  *   out   = struct(scale, sum_q, max_abs_err)
  *
  * `sum_q` (integer checksum of the quantized codes) and
  * `max_abs_err` (worst reconstruction error |v_i − q_i·scale|) make
  * every code verifiable by an external oracle: both are
  * order-independent reductions of exact double arithmetic, so a
  * sequential engine reproduces them bit-for-bit.
  *
  * Map-only, no shuffle; one loop per row, whole-stage-codegen via the
  * reference-object pattern. The interpreted-HOF formulation
  * (aggregate + transform + zip_with) walks the array four times with
  * per-element lambda dispatch.
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[ArrayData])

  /** Called from both interpreted eval and generated code. */
  def stats(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > amax) amax = a
      i += 1
    }
    if (amax == 0.0) return InternalRow(0.0, 0L, 0.0)
    val scale = amax / 127.0
    var sumQ = 0L
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val q = math.floor(x / scale + 0.5)
      sumQ += q.toLong
      val err = math.abs(x - q * scale)
      if (err > maxErr) maxErr = err
      i += 1
    }
    InternalRow(scale, sumQ, maxErr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecQuant", this, classOf[Int8QuantStats].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.stats($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object VecQuant {
  import org.apache.spark.sql.graftbridge.Bridge

  def int8QuantStats(vec: Column): Column =
    Bridge.toColumn(Int8QuantStats(Bridge.toExpression(vec)))
}
