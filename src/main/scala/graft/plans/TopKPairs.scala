package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Top-k (value, id) pairs per group as an aggregate — the scalable
  * alternative to window-rank top-k: a window formulation sorts and
  * shuffles EVERY row of the group; this aggregate's buffer holds at
  * most k pairs, partial aggregation combines map-side, and the
  * shuffle carries k pairs per group per partition. Order: value desc,
  * id asc (deterministic).
  *
  * Duplicate (value, id) pairs are preserved (the buffer is a heap,
  * not a set) and rows with a null value or id are skipped — matching
  * the window-rank formulation over non-null inputs exactly.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  // the buffer reads getDouble/getLong positionally — a mistyped
  // struct (e.g. decimal value) must be an analysis error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(f1, f2))
          if f1.dataType == DoubleType && f2.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k requires struct<double, bigint> input, got ${other.sql}")
    }

  // heap head is the worst kept pair: ascending by (value, then id desc)
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (v, -id) }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k.max(1), ord)

  private def add(buf: java.util.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (ord.compare(p, buf.peek()) > 0) { buf.poll(); buf.add(p) }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)], input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val row = child.eval(input)
    if (row != null) {
      val r = row.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) add(buf, (r.getDouble(0), r.getLong(1)))
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[(Double, Long)], b2: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    // emit best → worst
    val sorted = buf.toArray(new Array[(Double, Long)](buf.size)).sorted(ord.reverse)
    val out = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) { out(i) = InternalRow(sorted(i)._1, sorted(i)._2); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (v, id) = it.next(); bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(child = newChildren.head)
}

object TopKPairs {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column over struct(value: double, id: long). */
  def topK(pair: Column, k: Int): Column =
    Bridge.toColumn(TopKPairs(Bridge.toExpression(pair), k).toAggregateExpression())
}
