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
  * Application semantics are the RANK-MAJOR SWEEP (the reference
  * GPT-2 `bpe()` order on consistency-trained tables): for each rank
  * in training order, merge every leftmost-first non-overlapping
  * occurrence of that rank's pair in the word's current symbol
  * sequence. Training ([[graft.operators.Bpe.train]]) applies each
  * new merge with exactly this rule, so application replays training
  * bit-for-bit and the DuckDB oracle replays both with one
  * `replace()` per rank.
  *
  * Evaluation is the CANDIDATE-RANK sweep — same result, production
  * cost: instead of scanning all R ranks per word (O(R × len), ~700×
  * the useful work at a 32k-merge table), a min-heap of the ranks
  * whose pairs are PRESENT in the word drives the loop — pairs are
  * looked up in a rank index, newly created pairs push their next
  * applicable rank — so per-word cost is O(len · k) for k ranks
  * actually applied, INDEPENDENT of table size. Equivalence to the
  * naive full-rank sweep is structural (a rank whose pair is absent
  * sweeps as a no-op; present ranks are discovered in increasing
  * order, and a pair re-created by a rank-m merge re-enters at its
  * first rank AFTER m — exactly the ranks the naive sweep still has
  * ahead of it) and spec-pinned against a reference implementation on
  * both the small and the ≥1k-merge table. A bounded concurrent memo
  * (word → count) makes repeated words O(1) — the dominant case on a
  * Zipfian corpus. The expression stays inside whole-stage codegen
  * via `addReferenceObj`.
  */
case class BpeSweepTokenCount(child: Expression,
                              mergesA: Seq[String], mergesB: Seq[String])
    extends UnaryExpression {
  require(mergesA.length == mergesB.length,
    "merge table halves must align")

  override def dataType: DataType = LongType

  @transient private lazy val pairA: Array[String] = mergesA.toArray
  @transient private lazy val pairB: Array[String] = mergesB.toArray

  /** pair → ASCENDING ranks at which the table merges it. A pair can
    * train at several ranks (merged exhaustively at r, re-created by
    * a later merge, trained again), so the index keeps them all —
    * the candidate sweep picks the first rank past the current one.
    * Keys are length-prefixed (`<lenA>:<a><b>`) so symbol boundaries
    * are unambiguous for any symbol content. */
  @transient private lazy val rankOf: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]](pairA.length * 2)
    var r = 0
    while (r < pairA.length) {
      val k = key(pairA(r), pairB(r))
      val old = m.get(k)
      m.put(k, if (old == null) Array(r) else old :+ r)
      r += 1
    }
    m
  }

  private def key(a: String, b: String): String =
    s"${a.length}:$a$b"

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
    val syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var n = syms.length
    if (n > 1) {
      val queue = new java.util.PriorityQueue[Integer]()
      val queued = new java.util.HashSet[Integer]()
      // the first rank of (a, b) STRICTLY AFTER `after` — the only
      // rank the naive sweep could still apply to a pair present now
      def push(a: String, b: String, after: Int): Unit = {
        val rs = rankOf.get(key(a, b))
        if (rs != null) {
          var j = 0
          while (j < rs.length && rs(j) <= after) j += 1
          if (j < rs.length) {
            val r = Integer.valueOf(rs(j))
            if (queued.add(r)) queue.add(r)
          }
        }
      }
      var j = 0
      while (j < n - 1) { push(syms(j), syms(j + 1), -1); j += 1 }
      while (!queue.isEmpty && n > 1) {
        val r = queue.poll().intValue()
        val a = pairA(r); val b = pairB(r)
        // leftmost-first, non-overlapping — the sweep's exact rule
        var rd = 0; var wr = 0; var merged = false
        while (rd < n) {
          if (rd < n - 1 && syms(rd) == a && syms(rd + 1) == b) {
            syms(wr) = a + b; rd += 2; merged = true
          } else { syms(wr) = syms(rd); rd += 1 }
          wr += 1
        }
        if (merged) {
          n = wr
          // merging created new adjacencies (and may have re-created
          // this very pair for a later rank): rescan — O(n), the same
          // order as the sweep that just ran
          var k = 0
          while (k < n - 1) { push(syms(k), syms(k + 1), r); k += 1 }
        }
      }
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

  /** REFERENCE naive full-rank sweep — O(ranks × len) per word, the
    * semantics oracle the candidate-rank evaluation is spec-pinned
    * against (and the DuckDB replay's literal form). Test harness and
    * equivalence proofs only; production evaluation never calls it. */
  private[graft] def naiveSweepTokens(w: String,
      merges: Seq[(String, String)]): Long = {
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var n = syms.length
    var r = 0
    while (r < merges.length && n > 1) {
      val (a, b) = merges(r)
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
    n.toLong
  }
}
