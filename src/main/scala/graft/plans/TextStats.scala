package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token stats in one native pass over the raw string:
  * n_tokens (non-empty single-space-separated segments — same
  * semantics as `filter(split(text, ' '), _ != '')`) and n_stop
  * (tokens whose lowercase form is in the stopword list). Feeds the
  * quality-score query without materializing token arrays. */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  private val stops: Set[UTF8String] =
    stopwords.map(s => UTF8String.fromString(s.toLowerCase)).toSet

  override def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  /** Called from both interpreted eval and generated code. */
  def stats(u: UTF8String): InternalRow = {
    val s = u.toString
    var nTokens = 0L
    var nStop = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      if (s.charAt(i) != ' ') {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        nTokens += 1
        if (stops.contains(UTF8String.fromString(s.substring(i, j).toLowerCase))) nStop += 1
        i = j
      } else i += 1
    }
    InternalRow(nTokens, nStop)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.stats($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** Rabin–Karp rolling fingerprints of the character stream: polynomial
  * hash (base 31, mod 2^31-1) of every `win`-char window; returns
  * struct(fp_min, n_distinct) — the document fingerprint summary.
  *
  * Genuinely rolling: the first window pays O(win), every subsequent
  * position is O(1) — drop the outgoing char's 31^(win-1) term,
  * multiply by the base, add the incoming char, re-normalize mod p.
  * Modular arithmetic makes the rolled value bit-identical to a full
  * recomputation, so fingerprints are unchanged from the (previous)
  * per-position O(win) form. Total cost O(n) per row instead of
  * O(n·win) — flat in the window size. */
case class RollingFingerprint(child: Expression, win: Int)
    extends UnaryExpression {

  private val Mod = 2147483647L

  /** 31^(win-1) mod p — the outgoing character's positional weight. */
  private lazy val outPow: Long = {
    var p = 1L
    var k = 1
    while (k < win) { p = p * 31L % Mod; k += 1 }
    p
  }

  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    fingerprints(input.asInstanceOf[UTF8String])

  /** Called from both interpreted eval and generated code. */
  def fingerprints(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    if (n < win) return InternalRow(0L, 0L)
    val seen = new java.util.HashSet[Long]()
    var h = 0L
    var j = 0
    while (j < win) {
      h = java.lang.Math.floorMod(h * 31L + s.charAt(j).toLong, Mod)
      j += 1
    }
    var minFp = h
    seen.add(h)
    var i = 1
    while (i <= n - win) {
      // h < p and char*outPow < 2^16 * 2^31: the intermediate stays
      // well inside a long before the floorMod re-normalizes
      h = java.lang.Math.floorMod(
        (h - s.charAt(i - 1).toLong * outPow) * 31L + s.charAt(i + win - 1).toLong, Mod)
      if (h < minFp) minFp = h
      seen.add(h)
      i += 1
    }
    InternalRow(minFp, seen.size.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingFp", this, classOf[RollingFingerprint].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.fingerprints($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Both q30 token counts in ONE native pass — no regex engine, no
  * token-array materialization: `ws_tokens` (non-empty single-space
  * segments, the `filter(split(text, ' '), _ != '')` semantics) and
  * `rx_tokens` (the BPE-ish lexer `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
  * replayed as a char-class scan). Java's regex matches per CODE
  * POINT, so the "other" class steps over surrogate pairs as one
  * token; letter/digit/\s classes are ASCII-only, exactly as the
  * pattern spells them. `size(regexp_extract_all(...))` builds the
  * full token array per document just to take its length — at corpus
  * scale that is allocation + regex-engine CPU for data nobody
  * reads. */
case class LexTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("rx_tokens", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[UTF8String])

  // Java regex \s (no UNICODE_CHARACTER_CLASS) = [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
  private def isLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Called from both interpreted eval and generated code. */
  def counts(u: UTF8String): InternalRow = {
    val s = u.toString
    val len = s.length
    var ws = 0L
    var i = 0
    while (i < len) {
      if (s.charAt(i) != ' ') {
        var j = i
        while (j < len && s.charAt(j) != ' ') j += 1
        ws += 1
        i = j
      } else i += 1
    }
    var rx = 0L
    i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (isLetter(c)) {
        var j = i + 1
        while (j < len && isLetter(s.charAt(j))) j += 1
        rx += 1
        i = j
      } else if (isDigit(c)) {
        var j = i + 1
        while (j < len && isDigit(s.charAt(j))) j += 1
        rx += 1
        i = j
      } else if (isWs(c)) {
        i += 1
      } else {
        rx += 1
        i += (if (Character.isHighSurrogate(c) && i + 1 < len &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    InternalRow(ws, rx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexTokenCount", this, classOf[LexTokenCount].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.counts($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexTokenCount =
    copy(child = newChild)
}

object TextStats {
  import org.apache.spark.sql.graftbridge.Bridge

  def textStats(text: Column, stopwords: Seq[String]): Column =
    Bridge.toColumn(TextStats(Bridge.toExpression(text), stopwords))

  def rollingFingerprint(text: Column, win: Int): Column =
    Bridge.toColumn(RollingFingerprint(Bridge.toExpression(text), win))

  def lexTokenCount(text: Column): Column =
    Bridge.toColumn(LexTokenCount(Bridge.toExpression(text)))
}
