package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.BridgeTypes.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns in a native loop —
  * strictly sequential element order, so results are bit-identical to
  * the interpreted `aggregate(zip_with(...))` formulation and to a
  * sequential engine (the DuckDB oracle), just without per-element
  * lambda dispatch.
  *
  * Implements `doGenCode` (not CodegenFallback): this is the hottest
  * expression in the similarity family — evaluated once per candidate
  * pair — and a fallback would split the whole-stage-codegen span of
  * every scoring stage at its boundary.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Declared input types make SQL/un-cast misuse an analysis error
  // (implicit cast to array<double>) instead of a runtime
  // ClassCastException on float ArrayData.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  // Length mismatch is a caller bug (a dot product over differing dims
  // has no meaning) — fail loudly rather than silently truncate.
  private def mismatch(nx: Int, ny: Int): Nothing =
    throw new IllegalArgumentException(
      s"vec_dot: arrays must have equal length, got $nx vs $ny")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) mismatch(n, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val ref = ctx.addReferenceObj("vecDot", this, classOf[VecDot].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) $ref.genMismatch($n, $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  /** Codegen entry for the mismatch error (keeps generated code tiny). */
  def genMismatch(nx: Int, ny: Int): Unit = mismatch(nx, ny)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {
  import org.apache.spark.sql.graftbridge.Bridge

  def vecDot(a: Column, b: Column): Column =
    Bridge.toColumn(VecDot(Bridge.toExpression(a), Bridge.toExpression(b)))
}
