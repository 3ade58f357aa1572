package graft.operators

/** Cascading BPE TRAINER over a word-frequency table.
  *
  * Real BPE trainers (the GPT-2 reference code, HuggingFace
  * `tokenizers`, SentencePiece's BPE mode) do not iterate over the
  * corpus: they iterate over the DISTINCT-WORD frequency table, which
  * is vocabulary-sized — Zipf-bounded no matter how many tokens the
  * corpus has. The Spark side therefore computes `(word, count)` with
  * one distributed aggregate and collects THAT (O(vocab) driver rows,
  * the same boundedness argument as the IVF centroid election), and
  * this trainer runs the merge loop locally:
  *
  *  - state: each distinct word as a symbol sequence (initially its
  *    characters), weighted by its corpus count;
  *  - step: count adjacent symbol pairs (per position, weighted),
  *    pick the max by (count desc, bracketed-pair-string asc — a
  *    total, engine-replayable order), merge every leftmost-first
  *    non-overlapping occurrence, record the rank;
  *  - stop: at `budget` merges, or when no adjacent pair remains
  *    (saturation — every word is one symbol).
  *
  * The merged symbol participates in later pair counts, so ranks
  * CASCADE (`e+r→er`, `m+er→mer`, `mer+ge→merge`) — the property that
  * makes the table a real subword vocabulary. Application semantics
  * are [[graft.plans.BpeSweepTokenCount]]'s rank-major sweep, which
  * is exactly the rule each training step applies — so application
  * replays training bit-for-bit, and the q92 DuckDB oracle replays
  * BOTH with one `replace()` per rank over a bracketed-symbol string
  * form.
  *
  * Honest scale note: this corpus's vocabulary is 31 words / 138
  * characters, so cascading training SATURATES at 89 merges (a table
  * of size ≥ vocab-total-chars − vocab-size is unreachable on any
  * corpus); production tables of 32k–100k merges need a corpus whose
  * vocabulary supports them, and this trainer's budget knob and
  * vocabulary-sized state are exactly that path. */
object Bpe {

  /** Train up to `budget` cascading merges. Deterministic for a fixed
    * input multiset (input order is irrelevant — counting is
    * commutative and the argmax order is total). */
  def train(wordCounts: Seq[(String, Long)], budget: Int): Seq[(String, String)] = {
    // mutable symbol sequences, one per distinct word
    val syms = wordCounts.map { case (w, _) =>
      val a = new Array[String](w.length)
      var i = 0
      while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
      scala.collection.mutable.ArrayBuffer.from(a)
    }
    val counts = wordCounts.map(_._2)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < budget && continue) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val c = counts(wi)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          j += 1
        }
        wi += 1
      }
      if (pc.isEmpty) continue = false
      else {
        // max by count, ties by the bracketed pair string — the same
        // ORDER BY pc DESC, sp ASC the oracle replays
        val best = pc.minBy { case ((a, b), n) => (-n, s"($a)($b)") }._1
        merges += best
        val (a, b) = best
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          // leftmost-first non-overlapping, in place
          var rd = 0; var wr = 0
          while (rd < s.length) {
            if (rd < s.length - 1 && s(rd) == a && s(rd + 1) == b) {
              s(wr) = a + b; rd += 2
            } else { s(wr) = s(rd); rd += 1 }
            wr += 1
          }
          s.takeInPlace(wr)
          wi += 1
        }
      }
    }
    merges.toSeq
  }
}
