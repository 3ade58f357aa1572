package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit shingle hashes of a token array, in ONE
  * native loop — semantically
  * `sort_array(array_distinct(transform(shingle_tokens(toks, k), xxhash64)))`
  * but without four interpreted higher-order passes, and without the
  * CollapseProject trap: when a projected shingle array is referenced
  * more than once downstream (size + slice, filter + project),
  * Catalyst inlines the defining expression into EVERY reference —
  * with the HOF chain each reference re-ran shingling, dedup and sort
  * interpreted; here each inlined copy is a single tight JVM loop.
  *
  * Hash parity: each shingle is the space-joined token window
  * (ShingleTokens semantics) hashed with XXH64 seed 42 — exactly
  * Spark's `xxhash64` over the same string, so posting lists and
  * Jaccard counts are bit-identical to the HOF formulation. */
case class SortedShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any =
    hashes(input.asInstanceOf[ArrayData])

  /** Called from both interpreted eval and generated code — this
    * expression feeds the scan projection of the two heaviest queries
    * (q24/q54), so it must not split their whole-stage-codegen span. */
  def hashes(input: ArrayData): GenericArrayData = {
    val toks = input
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, (n - k + 1) * 2))
    val out = new Array[Long](n - k + 1)
    val window = new Array[UTF8String](k)
    var c = 0
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { window(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(sep, window: _*)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      if (seen.add(h)) { out(c) = h; c += 1 }
      i += 1
    }
    val arr = java.util.Arrays.copyOf(out, c)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[SortedShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.hashes($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedShingleHashes =
    copy(child = newChild)
}

object SortedShingleHashes {
  import org.apache.spark.sql.graftbridge.Bridge

  def sortedShingleHashes(tokens: Column, k: Int): Column =
    Bridge.toColumn(SortedShingleHashes(Bridge.toExpression(tokens), k))
}
