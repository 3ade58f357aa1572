package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types._

/** Elementwise INTEGER vector-sum aggregate — [[VecSum]]'s exact
  * sibling over array<long>. Long addition is associative and
  * commutative, so the result is BIT-IDENTICAL whatever partition
  * fold order Spark picks — the property that makes quantized k-means
  * training (Similarity.refineCents / refinePqCodebook) reproducible
  * and therefore oracle-able. Same bounded-state contract as VecSum:
  * one dim-length buffer per group, map-side combined.
  *
  * Overflow bound: with coordinates quantized at 2^20 scale and
  * |x| ≲ 8, a cell needs ~2^40 members before a component nears 2^63
  * — far beyond any single group's realistic population; exceeded
  * sums would wrap silently, so keep the scale × group-size product
  * under 2^62 when choosing parameters. */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumLong.Buf] with ExpectsInputTypes {

  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def createAggregationBuffer(): VecSumLong.Buf = new VecSumLong.Buf(null, 0L)

  private def addInto(buf: VecSumLong.Buf, v: ArrayData): Unit = {
    val m = v.numElements()
    if (buf.sum == null) buf.sum = new Array[Long](m)
    else require(buf.sum.length == m,
      s"vec_sum_long: dimension mismatch, got $m after ${buf.sum.length}")
    var i = 0
    while (i < m) { buf.sum(i) += v.getLong(i); i += 1 }
    buf.n += 1
  }

  override def update(buf: VecSumLong.Buf, input: InternalRow): VecSumLong.Buf = {
    val v = child.eval(input)
    if (v != null) addInto(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: VecSumLong.Buf, b2: VecSumLong.Buf): VecSumLong.Buf = {
    if (b2.sum != null) {
      if (b1.sum == null) { b1.sum = b2.sum; b1.n += b2.n }
      else {
        require(b1.sum.length == b2.sum.length,
          s"vec_sum_long: dimension mismatch in merge, ${b1.sum.length} vs ${b2.sum.length}")
        var i = 0
        while (i < b1.sum.length) { b1.sum(i) += b2.sum(i); i += 1 }
        b1.n += b2.n
      }
    }
    b1
  }

  override def eval(buf: VecSumLong.Buf): Any =
    InternalRow(
      new GenericArrayData(if (buf.sum == null) Array.empty[Long] else buf.sum),
      buf.n)

  override def serialize(buf: VecSumLong.Buf): Array[Byte] = {
    val m = if (buf.sum == null) -1 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * math.max(m, 0))
    bb.putInt(m)
    bb.putLong(buf.n)
    var i = 0
    while (i < m) { bb.putLong(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumLong.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val n = bb.getLong
    if (m < 0) new VecSumLong.Buf(null, n)
    else {
      val s = new Array[Long](m)
      var i = 0
      while (i < m) { s(i) = bb.getLong; i += 1 }
      new VecSumLong.Buf(s, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSumLong =
    copy(child = newChildren.head)
}

object VecSumLong {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Mutable aggregation buffer: running elementwise sum + row count. */
  final class Buf(var sum: Array[Long], var n: Long)

  /** Aggregate Column over an array<long> column. */
  def vecSumLong(vec: Column): Column =
    Bridge.toColumn(VecSumLong(Bridge.toExpression(vec)).toAggregateExpression())
}
