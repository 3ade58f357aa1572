package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles ("w1 w2 w3") from a token-array column, built in one
  * native loop (UTF8String.concatWs) instead of interpreted
  * transform/slice/concat_ws lambdas. Output matches the SQL
  * formulation `w[i] || ' ' || w[i+1] || ...` byte-for-byte. */
case class ShingleTokens(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[ArrayData])

  /** Called from both interpreted eval and generated code. */
  def shingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[ShingleTokens].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.shingles($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleTokens =
    copy(child = newChild)
}

object ShingleTokens {
  import org.apache.spark.sql.graftbridge.Bridge

  def shingleTokens(tokens: Column, k: Int): Column =
    Bridge.toColumn(ShingleTokens(Bridge.toExpression(tokens), k))
}
