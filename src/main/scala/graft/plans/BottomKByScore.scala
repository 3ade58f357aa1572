package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k (score, id) pairs per group by (score asc, id asc) — the
  * bounded-state selector behind weighted sampling
  * ([[graft.operators.Sample.weighted]], Efraimidis–Spirakis A-ES keys).
  *
  * Same scale story as [[BottomKIds]] (which keys on a string hash):
  * a window-rank formulation serializes each group's population on one
  * reducer; this aggregate buffers at most k pairs, combines map-side,
  * and the shuffle carries k pairs per group per partition. The DOUBLE
  * score key is what A-ES needs — its keys are -ln(u)/w, not hashes.
  *
  * Rows with null score/id are skipped; NaN scores are skipped too
  * (a NaN key would be unordered — callers guard weights, this guards
  * the aggregate). Returns array<struct<key double, id bigint>> in
  * (key asc, id asc) order.
  */
case class BottomKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  // the buffer reads getDouble/getLong positionally — a mistyped
  // struct must be an analysis error, not silent garbage
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StructType(Array(f1, f2))
          if f1.dataType == DoubleType && f2.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bottom_k_by_score requires struct<double, bigint> input, got ${other.sql}")
    }

  private def asc: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  // heap head is the LARGEST kept pair (eviction candidate)
  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k.max(1), asc.reverse)

  private def add(buf: java.util.PriorityQueue[(Double, Long)], p: (Double, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (asc.compare(p, buf.peek()) < 0) { buf.poll(); buf.add(p) }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)], input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val row = child.eval(input)
    if (row != null) {
      val r = row.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1) && !r.getDouble(0).isNaN)
        add(buf, (r.getDouble(0), r.getLong(1)))
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[(Double, Long)], b2: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray(new Array[(Double, Long)](buf.size)).sorted(asc)
    new GenericArrayData(sorted.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val pairs = buf.toArray(new Array[(Double, Long)](buf.size))
    val bb = ByteBuffer.allocate(4 + 16 * pairs.length)
    bb.putInt(pairs.length)
    pairs.foreach { p => bb.putDouble(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKByScore =
    copy(child = newChildren.head)
}

object BottomKByScore {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column over struct(key: double, id: long). */
  def bottomKByScore(pair: Column, k: Int): Column =
    Bridge.toColumn(BottomKByScore(Bridge.toExpression(pair), k).toAggregateExpression())
}
