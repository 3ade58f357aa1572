package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register bank: elementwise MAX of (bucket, rho) pairs —
  * the mergeable distinct-count sketch (Flajolet et al., AofA 2007).
  *
  * This is the operator that replaces `count(distinct x)` at 100 TB:
  * exact distinct shuffles every distinct value; this aggregate's
  * state is m bytes PER GROUP (m=256 → 256 bytes), combines map-side,
  * and the shuffle carries one register bank per group per partition.
  * Registers from different days/shards union by elementwise max, so
  * sketches can be stored and re-aggregated without re-reading data —
  * the same associativity story as [[MinHashUnion]].
  *
  * The caller supplies (bucket, rho) — bucket = leading log2(m) hash
  * bits, rho = 1 + leading-zero count of the remaining bits — so the
  * hash stays a plain codegen'd column expression and the aggregate is
  * hash-agnostic. Rows with null bucket/rho or bucket outside [0, m)
  * are skipped. Output: array<long> of length m (0 = empty register).
  *
  * Reference semantics: the dedup/count surfaces in consumer.py count
  * distinct users/titles per key; this is the bounded-state form.
  */
case class HllRegisters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(m > 0 && m <= 65536, s"register count must be in (0, 65536], got $m")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the buffer reads getLong positionally — a mistyped struct must be
  // an analysis error, not silent garbage
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StructType(Array(f1, f2))
          if f1.dataType == LongType && f2.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"hll_registers requires struct<bigint, bigint> input, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val row = child.eval(input)
    if (row != null) {
      val r = row.asInstanceOf[InternalRow]
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val bucket = r.getLong(0)
        if (bucket >= 0 && bucket < m) {
          val rho = math.min(r.getLong(1), 127L).toByte
          if (rho > buf(bucket.toInt)) buf(bucket.toInt) = rho
        }
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
}

object HllRegisters {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Aggregate Column over struct(bucket: long, rho: long). */
  def hllRegisters(pair: Column, m: Int): Column =
    Bridge.toColumn(HllRegisters(Bridge.toExpression(pair), m).toAggregateExpression())
}
