package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token stats in one native pass over the raw string:
  * n_tokens (non-empty single-space-separated segments — same
  * semantics as `filter(split(text, ' '), _ != '')`) and n_stop
  * (tokens whose lowercase form is in the stopword list). Feeds the
  * quality-score query without materializing token arrays. */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  private val stops: Set[UTF8String] =
    stopwords.map(s => UTF8String.fromString(s.toLowerCase)).toSet

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
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

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** Rabin–Karp rolling fingerprints of the character stream: polynomial
  * hash (base 31, mod 2^31-1) of every `win`-char window; returns
  * struct(fp_min, n_distinct) — the document fingerprint summary.
  * One native loop; the HOF formulation (transform × aggregate over a
  * split-to-chars array) re-walks the window per position interpreted
  * and is ~1000× slower at corpus scale. */
case class RollingFingerprint(child: Expression, win: Int)
    extends UnaryExpression with CodegenFallback {

  private val Mod = 2147483647L

  override def dataType: DataType = StructType(Seq(
    StructField("fp_min", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < win) return InternalRow(0L, 0L)
    val seen = new java.util.HashSet[Long]()
    var minFp = Long.MaxValue
    var i = 0
    while (i <= n - win) {
      var h = 0L
      var j = 0
      while (j < win) {
        h = java.lang.Math.floorMod(h * 31L + s.charAt(i + j).toLong, Mod)
        j += 1
      }
      if (h < minFp) minFp = h
      seen.add(h)
      i += 1
    }
    InternalRow(minFp, seen.size.toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object TextStats {
  import org.apache.spark.sql.graftbridge.Bridge

  def textStats(text: Column, stopwords: Seq[String]): Column =
    Bridge.toColumn(TextStats(Bridge.toExpression(text), stopwords))

  def rollingFingerprint(text: Column, win: Int): Column =
    Bridge.toColumn(RollingFingerprint(Bridge.toExpression(text), win))
}
