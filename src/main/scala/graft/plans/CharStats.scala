package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-histogram statistics in one native pass over the raw
  * string: n (total chars), distinct_chars, and the entropy numerator
  * Σ c·ln(c) folded over counts in ASCENDING CHARACTER order — the
  * same IEEE op sequence as sorting the histogram and left-folding it
  * (and as DuckDB's `list_sum(list(c*ln(c) ORDER BY ch))` replay), so
  * the downstream entropy stays engine-exact.
  *
  * This replaces an explode-per-character + two-level aggregation
  * plan: the explode multiplied every row by its length BEFORE the
  * map-side combine could see it. Here the histogram (alphabet-sized,
  * not document-sized) lives in one JVM map per row and the query
  * becomes map-only. */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("sum_cln", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Called from both interpreted eval and generated code.
    *
    * Iterates by Unicode CODEPOINT (not UTF-16 code unit) so that
    * supplementary characters (emoji, rare CJK) count once and sort by
    * codepoint — matching the oracle's `string_split(text, '')`
    * character semantics. Codepoint-ascending order equals UTF-8
    * byte order, so the fold sequence matches DuckDB's binary
    * collation exactly. */
  def stats(u: UTF8String): InternalRow = {
    val s = u.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val key = Integer.valueOf(cp)
      val prev: java.lang.Long = counts.get(key)
      counts.put(key, if (prev eq null) 1L else prev + 1L)
      i += Character.charCount(cp)
      n += 1L
    }
    var sum = 0.0
    val it = counts.values().iterator() // TreeMap: ascending codepoint order
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * java.lang.Math.log(c)
    }
    InternalRow(n, counts.size.toLong, sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charStats", this, classOf[CharStats].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.stats($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  import org.apache.spark.sql.graftbridge.Bridge

  def charStats(text: Column): Column =
    Bridge.toColumn(CharStats(Bridge.toExpression(text)))
}
