package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** CASCADING (multi-level) BPE over a token-array column against a
  * TRAINED merge table — the real-tokenizer semantics the single-level
  * [[BpeTokenCount]] approximated: a merge's output symbol is itself
  * mergeable at a later rank (`e+r→er`, then `m+er→mer`), so the
  * trained table is a true subword vocabulary, not a char-pair list.
  *
  * Application is the RANK-MAJOR SWEEP (the reference GPT-2 `bpe()`
  * order on consistency-trained tables): for each rank in training
  * order, merge every leftmost-first non-overlapping occurrence of
  * that rank's pair in the word's current symbol sequence. Training
  * ([[graft.operators.Bpe.train]]) applies each new merge with
  * exactly this rule, so application replays training bit-for-bit and
  * the DuckDB oracle replays both with one `replace()` per rank.
  *
  * Cost shape: the sweep is O(ranks × word-length) per DISTINCT word;
  * a bounded concurrent memo (word → token count, capped so a
  * pathological corpus cannot grow it unbounded) makes repeated words
  * O(1), which at 100 TB is the dominant case — natural-language
  * corpora are Zipfian, so the cache hit rate approaches 1. The
  * expression stays inside whole-stage codegen via
  * [[org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext#addReferenceObj]].
  */
case class BpeSweepTokenCount(child: Expression,
                              mergesA: Seq[String], mergesB: Seq[String])
    extends UnaryExpression {
  require(mergesA.length == mergesB.length,
    "merge table halves must align")

  override def dataType: DataType = LongType

  @transient private lazy val pairA: Array[String] = mergesA.toArray
  @transient private lazy val pairB: Array[String] = mergesB.toArray

  // word → token count; bounded so an adversarial high-cardinality
  // corpus degrades to recompute, never to memory growth
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MemoCap = 1 << 16

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  private def tokensOf(w: String): Long = {
    val cached = memo.get(w)
    if (cached != null) return cached.longValue()
    // symbol sequence starts as characters; each rank sweeps once
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var n = syms.length
    var r = 0
    while (r < pairA.length && n > 1) {
      val a = pairA(r); val b = pairB(r)
      // leftmost-first, non-overlapping (SQL replace semantics)
      var rd = 0; var wr = 0
      while (rd < n) {
        if (rd < n - 1 && syms(rd) == a && syms(rd + 1) == b) {
          syms(wr) = a + b; rd += 2
        } else { syms(wr) = syms(rd); rd += 1 }
        wr += 1
      }
      n = wr
      r += 1
    }
    if (memo.size < MemoCap) memo.put(w, java.lang.Long.valueOf(n.toLong))
    n.toLong
  }

  /** Called from both interpreted eval and generated code. */
  def count(toks: ArrayData): Long = {
    var total = 0L
    val nToks = toks.numElements()
    var t = 0
    while (t < nToks) {
      total += tokensOf(toks.getUTF8String(t).toString)
      t += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe2", this, classOf[BpeSweepTokenCount].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.count($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSweepTokenCount =
    copy(child = newChild)
}

object BpeSweepTokenCount {
  import org.apache.spark.sql.graftbridge.Bridge

  def bpeSweepTokenCount(tokens: Column, merges: Seq[(String, String)]): Column =
    Bridge.toColumn(BpeSweepTokenCount(Bridge.toExpression(tokens),
      merges.map(_._1), merges.map(_._2)))
}
