package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Subword (BPE-style) token count over a token-array column, against
  * a TRAINED merge table — one native loop per row.
  *
  * Whitespace tokens under-count what an LLM tokenizer would produce;
  * this expression makes packing/chunking layouts (q62/q68 shapes)
  * representative without shipping a full tokenizer. The model is
  * single-level BPE: the merge table holds character PAIRS (2-char
  * strings) ranked by training priority; application walks ranks in
  * order and, within a rank, merges leftmost-first non-overlapping
  * occurrences; a character participates in at most one merge (pairs
  * are base characters, so merged symbols cannot cascade — the
  * honest, SQL-replayable core of the BPE family). A word of n chars
  * with m merges yields n − m subword tokens; the row's value is the
  * sum over its tokens.
  *
  * The table is data-trained (global adjacent-pair frequencies, top-M
  * by count desc then pair asc — one aggregate, no RNG), so the whole
  * path is deterministic and the DuckDB oracle replays training AND
  * application exactly (q92). */
case class BpeTokenCount(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.forall(_.length == 2),
    s"merge table entries must be 2-char pairs, got ${merges.filter(_.length != 2)}")

  override def dataType: DataType = LongType

  @transient private lazy val pairA: Array[Char] = merges.map(_.charAt(0)).toArray
  @transient private lazy val pairB: Array[Char] = merges.map(_.charAt(1)).toArray

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  /** Called from both interpreted eval and generated code. */
  def count(toks: ArrayData): Long = {
    var total = 0L
    val nToks = toks.numElements()
    var t = 0
    while (t < nToks) {
      val s = toks.getUTF8String(t).toString
      val n = s.length
      var cnt = 0
      if (n >= 2) {
        // used(i): char i is already part of a merge
        val used = new Array[Boolean](n)
        var r = 0
        while (r < pairA.length) {
          val a = pairA(r); val b = pairB(r)
          var i = 0
          while (i < n - 1) {
            if (!used(i) && !used(i + 1) && s.charAt(i) == a && s.charAt(i + 1) == b) {
              used(i) = true; used(i + 1) = true; cnt += 1
            }
            i += 1
          }
          r += 1
        }
      }
      total += n - cnt
      t += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.count($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  import org.apache.spark.sql.graftbridge.Bridge

  def bpeTokenCount(tokens: Column, merges: Seq[String]): Column =
    Bridge.toColumn(BpeTokenCount(Bridge.toExpression(tokens), merges))
}
