package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL 64-bit shingle hashes of a token array, in ONE native
  * loop — semantically
  * `transform(shingle_tokens(toks, k), xxhash64)` (window order, one
  * hash per window, duplicates KEPT) but without materializing the
  * window strings as an interpreted higher-order pass: the
  * duplicate-span operators (q75/q110) only ever consume the hash, so
  * building each "w1 w2 ... wk" string as a column value, shipping it
  * through the explode and re-reading it in a separate xxhash64 node
  * was pure overhead (~2× the span-stats scan at sf0.1).
  *
  * [[SortedShingleHashes]] is the DISTINCT/sorted sibling (posting
  * lists, Jaccard); this keeps every occurrence in window order so
  * `posexplode` yields (position, hash) — the span operators' shape.
  *
  * Hash parity: each window hashes as XXH64 seed 42 over the
  * space-joined tokens — exactly Spark's `xxhash64` over the same
  * string, so occurrence counts group identically to the
  * window-text oracle replay. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[ArrayData])

  def hashes(input: ArrayData): GenericArrayData = {
    val toks = input
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(sep, window: _*)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.hashes($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.graftbridge.Bridge

  def shingleHashes(tokens: Column, k: Int): Column =
    Bridge.toColumn(ShingleHashes(Bridge.toExpression(tokens), k))
}
