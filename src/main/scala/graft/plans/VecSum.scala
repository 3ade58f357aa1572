package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types._

/** Elementwise vector-sum aggregate: struct(sum: array<double>, n) per
  * group — the centroid/mean-embedding building block (class
  * centroids, cluster summaries, embedding drift monitors).
  *
  * Scale shape: the composed alternative (posexplode to (group, pos,
  * val) then groupBy) multiplies the corpus row count by the embedding
  * dimension BEFORE the shuffle; this aggregate keeps one
  * dim-length buffer per group, combines map-side, and the shuffle
  * carries one array per group per partition — the same bounded-state
  * contract as [[MinHashUnion]] (elementwise min) but for sums.
  *
  * Null rows are skipped; the first non-null row fixes the dimension
  * and a later mismatched row fails loudly (a silent truncation would
  * corrupt the centroid). Empty groups return (empty array, 0).
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSum.Buf] with ExpectsInputTypes {

  override def children: Seq[Expression] = child :: Nil
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))

  override def createAggregationBuffer(): VecSum.Buf = new VecSum.Buf(null, 0L)

  private def addInto(buf: VecSum.Buf, v: ArrayData): Unit = {
    val m = v.numElements()
    if (buf.sum == null) buf.sum = new Array[Double](m)
    else require(buf.sum.length == m,
      s"vec_sum: dimension mismatch, got $m after ${buf.sum.length}")
    var i = 0
    while (i < m) { buf.sum(i) += v.getDouble(i); i += 1 }
    buf.n += 1
  }

  override def update(buf: VecSum.Buf, input: InternalRow): VecSum.Buf = {
    val v = child.eval(input)
    if (v != null) addInto(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: VecSum.Buf, b2: VecSum.Buf): VecSum.Buf = {
    if (b2.sum != null) {
      if (b1.sum == null) { b1.sum = b2.sum; b1.n += b2.n }
      else {
        require(b1.sum.length == b2.sum.length,
          s"vec_sum: dimension mismatch in merge, ${b1.sum.length} vs ${b2.sum.length}")
        var i = 0
        while (i < b1.sum.length) { b1.sum(i) += b2.sum(i); i += 1 }
        b1.n += b2.n
      }
    }
    b1
  }

  override def eval(buf: VecSum.Buf): Any =
    InternalRow(
      new GenericArrayData(if (buf.sum == null) Array.empty[Double] else buf.sum),
      buf.n)

  override def serialize(buf: VecSum.Buf): Array[Byte] = {
    val m = if (buf.sum == null) -1 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + 8 * math.max(m, 0))
    bb.putInt(m)
    bb.putLong(buf.n)
    var i = 0
    while (i < m) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSum.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val n = bb.getLong
    if (m < 0) new VecSum.Buf(null, n)
    else {
      val s = new Array[Double](m)
      var i = 0
      while (i < m) { s(i) = bb.getDouble; i += 1 }
      new VecSum.Buf(s, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren.head)
}

object VecSum {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Mutable aggregation buffer: running elementwise sum + row count. */
  final class Buf(var sum: Array[Double], var n: Long)

  /** Aggregate Column over an array<double> column. */
  def vecSum(vec: Column): Column =
    Bridge.toColumn(VecSum(Bridge.toExpression(vec)).toAggregateExpression())
}
