package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregate union of MinHash signatures: elementwise min over the
  * group — the MinHash sketch of the UNION of the underlying shingle
  * sets. Lets near-dup machinery run at coarser grain (per source, per
  * partition, per day) without re-touching documents: signatures
  * combine associatively, so partial aggregation (map-side combine)
  * applies and the shuffle carries one numPerms-long array per group.
  *
  * Spark has no elementwise array-min aggregate; this is a
  * TypedImperativeAggregate with a primitive long[] buffer.
  */
case class MinHashUnion(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = math.min(numPerms, arr.numElements())
      var i = 0
      while (i < n) {
        val v = arr.getLong(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashUnion =
    copy(child = newChildren.head)
}

object MinHashUnion {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column over a signature column (array<long>). */
  def minhashUnion(sig: Column, numPerms: Int): Column =
    Bridge.toColumn(MinHashUnion(Bridge.toExpression(sig), numPerms).toAggregateExpression())
}
