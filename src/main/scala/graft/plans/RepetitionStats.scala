package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repetition / boilerplate statistics in ONE native pass per document
  * (the Gopher-style repetition filters — Rae et al. 2021 §A1.1 —
  * re-expressed for a columnar engine):
  *
  *  - `n_tokens`     whitespace tokens (same semantics as
  *                   `filter(split(text,' '), _ != '')`)
  *  - `n_distinct`   distinct tokens
  *  - `top_bigram`   occurrences of the most frequent word 2-gram
  *  - `top_trigram`  occurrences of the most frequent word 3-gram
  *
  * Callers derive the filter ratios (duplicate-token fraction,
  * top-n-gram fraction) as plain column arithmetic — integer ratios,
  * so an engine-independent oracle replays them bit-for-bit.
  *
  * Scale shape: the composed formulation (explode tokens → two
  * groupBys per n-gram size) shuffles every token instance of the
  * corpus; this expression is MAP-ONLY — per-row hash maps, no
  * shuffle at all, and the scan stays in whole-stage codegen via the
  * reference-object pattern. At 100 TB the composed version moves
  * ~the corpus size through three exchanges; this moves nothing.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("top_trigram", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Called from both interpreted eval and generated code. */
  def stats(u: UTF8String): InternalRow = {
    val s = u.toString
    // tokenize once (same split-on-single-space, drop-empty semantics
    // as TextFunctions.tokens)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        toks.add(s.substring(i, j))
        i = j
      } else i += 1
    }
    val n = toks.size
    val uni = new java.util.HashMap[String, Integer]()
    val bi = new java.util.HashMap[String, Integer]()
    val tri = new java.util.HashMap[String, Integer]()
    def bump(m: java.util.HashMap[String, Integer], k: String): Int = {
      val c = m.get(k)
      val nc = if (c == null) 1 else c + 1
      m.put(k, nc)
      nc
    }
    var topBi = 0L
    var topTri = 0L
    var k = 0
    while (k < n) {
      bump(uni, toks.get(k))
      if (k + 1 < n) {
        val c = bump(bi, toks.get(k) + " " + toks.get(k + 1))
        if (c > topBi) topBi = c
      }
      if (k + 2 < n) {
        val c = bump(tri, toks.get(k) + " " + toks.get(k + 1) + " " + toks.get(k + 2))
        if (c > topTri) topTri = c
      }
      k += 1
    }
    InternalRow(n.toLong, uni.size.toLong, topBi, topTri)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStats].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.stats($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  import org.apache.spark.sql.graftbridge.Bridge

  def repetitionStats(text: Column): Column =
    Bridge.toColumn(RepetitionStats(Bridge.toExpression(text)))
}
