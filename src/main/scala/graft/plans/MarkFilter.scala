package graft.plans

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Surviving tokens after duplicate-span mark removal, in ONE native
  * pass — semantically identical to the higher-order chain
  * `filter(w, (_, j) => !exists(ms, m => j >= m && j <= m + win - 1))`
  * (token j survives iff NO mark interval [m, m+win-1] covers it) but
  * without the interpreted token×mark scan: higher-order functions are
  * CodegenFallback nodes, so the HOF pair evaluated an interpreted
  * `exists` over the whole mark list once per TOKEN — O(|tokens| ×
  * |marks|) per doc, interpreter overhead on every step (the last
  * interpreted lambda in the span-ops family, q110).
  *
  * Here: sort the marks once, sweep tokens and intervals together —
  * O(|tokens| + |marks| log |marks|) per doc, whole-stage-codegen
  * friendly (the loop is a single JVM method on array data, the
  * ShingleHashes pattern). Equality with the HOF form is pinned by
  * OperatorsSpec (same docs, both paths, identical output). */
case class MarkFilter(left: Expression, right: Expression, win: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(win >= 1, s"window size must be >= 1, got $win")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(IntegerType))

  // surviving tokens: same element type as the token array input
  override def dataType: DataType = left.dataType

  override def nullSafeEval(tokens: Any, marks: Any): Any =
    keep(tokens.asInstanceOf[ArrayData], marks.asInstanceOf[ArrayData])

  def keep(toks: ArrayData, marks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val m = marks.numElements()
    if (m == 0) {
      val all = new Array[Any](n)
      var i = 0
      while (i < n) { all(i) = toks.getUTF8String(i); i += 1 }
      return new GenericArrayData(all)
    }
    val ms = new Array[Int](m)
    var k = 0
    while (k < m) { ms(k) = marks.getInt(k); k += 1 }
    Arrays.sort(ms)
    val out = new Array[AnyRef](n)
    var nOut = 0
    var p = 0            // next mark to enter the sweep
    var coveredTo = -1   // rightmost token index covered so far
    var j = 0
    while (j < n) {
      while (p < m && ms(p) <= j) {
        val hi = ms(p) + win - 1
        if (hi > coveredTo) coveredTo = hi
        p += 1
      }
      if (j > coveredTo) { out(nOut) = toks.getUTF8String(j); nOut += 1 }
      j += 1
    }
    new GenericArrayData(
      if (nOut == n) out.asInstanceOf[Array[Any]]
      else Arrays.copyOf(out, nOut).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markFilter", this, classOf[MarkFilter].getName)
    nullSafeCodeGen(ctx, ev, (t, ms) => s"${ev.value} = $ref.keep($t, $ms);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MarkFilter =
    copy(left = newLeft, right = newRight)
}

object MarkFilter {
  import org.apache.spark.sql.graftbridge.Bridge

  def markFilter(tokens: Column, marks: Column, win: Int): Column =
    Bridge.toColumn(MarkFilter(
      Bridge.toExpression(tokens), Bridge.toExpression(marks), win))
}
