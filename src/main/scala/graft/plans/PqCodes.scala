package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization encoder: for an array<double> vector split
  * into `blocks` contiguous sub-vectors of `blockDim` dims, emit per
  * block the index of the nearest codebook entry (squared L2 on the
  * sub-vector, ties to the lower index) — the vec's PQ code word.
  *
  * The codebook rides as CONSTRUCTOR DATA (the [[NearestCells]]
  * pattern): nCentroids×dim doubles in the task binary, one native
  * loop per row — a nested transform/aggregate HOF formulation would
  * run blocks×nCentroids INTERPRETED sub-vector distances per corpus
  * row, the hot-path trap the native tier exists to avoid. Distances
  * accumulate in ascending-dim order (single IEEE ops) so an
  * independent engine replays code assignment exactly. */
case class PqCodes(child: Expression, codebook: Seq[Seq[Double]],
                   blocks: Int, blockDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.nonEmpty, "PqCodes needs at least one codebook entry")
  require(blocks >= 1 && blockDim >= 1, "blocks and blockDim must be >= 1")
  require(codebook.forall(_.length >= blocks * blockDim),
    s"every codebook entry must have >= ${blocks * blockDim} dims " +
      s"(blocks=$blocks × blockDim=$blockDim); got lengths " +
      codebook.map(_.length).distinct.mkString(","))

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cents: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  /** Called from both interpreted eval and generated code. */
  def encode(vec: ArrayData): ArrayData = {
    val m = cents.length
    val out = new Array[Long](blocks)
    var b = 0
    while (b < blocks) {
      val off = b * blockDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < m) {
        val cv = cents(c)
        var acc = 0.0
        var i = 0
        while (i < blockDim) {
          val d = vec.getDouble(off + i) - cv(off + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(b) = best.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encode($x);")
  }

  override protected def withNewChildInternal(c: Expression): PqCodes = copy(child = c)
}

/** Asymmetric-distance (ADC) lookup: given a PQ code word
  * (array<long>, one code per block) and a probe's precomputed
  * distance table (array<array<double>>, table[b][c] = distance from
  * the probe's block-b sub-vector to codebook entry c), return
  * Σ_b table[b][code_b] — the PQ-estimated distance, summed in
  * ascending-block order. One native loop per (corpus, probe) pair;
  * the probe table is computed ONCE per probe, which is the entire
  * point of ADC: pair scoring never touches the raw vectors. */
case class PqAdc(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  def adc(codes: ArrayData, table: ArrayData): Double = {
    val n = codes.numElements()
    // Same fail-loudly stance as the per-code range check below: a
    // block-count mismatch would otherwise yield a quietly wrong
    // partial distance.
    if (n != table.numElements())
      throw new IllegalArgumentException(
        s"pq_adc: code word has $n blocks but distance table has " +
          s"${table.numElements()} rows")
    var acc = 0.0
    var b = 0
    while (b < n) {
      val row = table.getArray(b)
      val code = codes.getLong(b)
      // pq_adc is SQL-exposed: fail loudly on a code outside its
      // block's table row instead of an opaque index error
      if (code < 0 || code >= row.numElements())
        throw new IllegalArgumentException(
          s"pq_adc: code $code at block $b is outside the distance " +
            s"table row (${row.numElements()} entries)")
      acc += row.getDouble(code.toInt)
      b += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.adc($x, $y);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqCodes {
  import org.apache.spark.sql.graftbridge.Bridge

  def pqCodes(vec: Column, codebook: Seq[Seq[Double]], blocks: Int, blockDim: Int): Column =
    Bridge.toColumn(PqCodes(Bridge.toExpression(vec), codebook, blocks, blockDim))

  def pqAdc(codes: Column, table: Column): Column =
    Bridge.toColumn(PqAdc(Bridge.toExpression(codes), Bridge.toExpression(table)))
}
