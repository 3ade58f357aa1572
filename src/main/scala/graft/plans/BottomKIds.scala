package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k ids per group by a deterministic (key: string, id: long)
  * ordering — the bounded-state building block for hash-rank sampling.
  *
  * A window-rank formulation (`row_number over partitionBy(strata)`)
  * puts each stratum's ENTIRE population on one reducer: with 5 strata
  * that is 5-way parallelism regardless of cluster size. This aggregate
  * buffers at most k (key, id) pairs, combines map-side, and the
  * shuffle carries k pairs per group per partition — parallelism stays
  * at the scan, only k×strata rows move.
  *
  * Rows with a null key or id are skipped; duplicates are preserved
  * (heap, not a set). Returns the k smallest ids ordered by
  * (key asc, id asc).
  */
case class BottomKIds(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(UTF8String, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the buffer reads getUTF8String/getLong positionally — a mistyped
  // struct must be an analysis error, not silent garbage
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(f1, f2))
          if f1.dataType == StringType && f2.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k requires struct<string, bigint> input, got ${other.sql}")
    }

  private def asc: Ordering[(UTF8String, Long)] =
    new Ordering[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = a._1.compareTo(b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  // heap head is the LARGEST kept pair (eviction candidate)
  override def createAggregationBuffer(): java.util.PriorityQueue[(UTF8String, Long)] =
    new java.util.PriorityQueue[(UTF8String, Long)](k.max(1), asc.reverse)

  private def add(buf: java.util.PriorityQueue[(UTF8String, Long)], p: (UTF8String, Long)): Unit = {
    if (buf.size < k) buf.add(p)
    else if (asc.compare(p, buf.peek()) < 0) { buf.poll(); buf.add(p) }
  }

  override def update(buf: java.util.PriorityQueue[(UTF8String, Long)], input: InternalRow): java.util.PriorityQueue[(UTF8String, Long)] = {
    val row = child.eval(input)
    if (row != null) {
      val r = row.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1))
        add(buf, (r.getUTF8String(0).clone(), r.getLong(1)))
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[(UTF8String, Long)], b2: java.util.PriorityQueue[(UTF8String, Long)]): java.util.PriorityQueue[(UTF8String, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(UTF8String, Long)]): Any = {
    val sorted = buf.toArray(new Array[(UTF8String, Long)](buf.size)).sorted(asc)
    new GenericArrayData(sorted.map(_._2))
  }

  override def serialize(buf: java.util.PriorityQueue[(UTF8String, Long)]): Array[Byte] = {
    val pairs = buf.toArray(new Array[(UTF8String, Long)](buf.size))
    val keyBytes = pairs.map(_._1.getBytes)
    val bb = ByteBuffer.allocate(4 + keyBytes.map(_.length + 12).sum)
    bb.putInt(pairs.length)
    var i = 0
    while (i < pairs.length) {
      bb.putInt(keyBytes(i).length)
      bb.put(keyBytes(i))
      bb.putLong(pairs(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(UTF8String, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.add((UTF8String.fromBytes(kb), bb.getLong))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKIds =
    copy(child = newChildren.head)
}

object BottomKIds {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column over struct(key: string, id: long). */
  def bottomK(pair: Column, k: Int): Column =
    Bridge.toColumn(BottomKIds(Bridge.toExpression(pair), k).toAggregateExpression())
}
