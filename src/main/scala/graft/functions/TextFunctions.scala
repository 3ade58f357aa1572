package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-compatible) — no Scala UDFs in the hot path.
  * These generalize the reference's text handling (title/plot fields,
  * `web_api.py:207-216` projections) to corpus-scale document ops.
  */
object TextFunctions {

  /** Whitespace tokens, empty tokens removed. One native loop
    * ([[graft.plans.Tokens]]) — value-identical to
    * `filter(split(text, " "), t => t != "")`, whose higher-order
    * filter ran interpreted per element on every text scan. */
  def tokens(text: Column): Column =
    graft.plans.Tokens.tokens(text)

  /** BPE-ish lexer tokens: runs of letters, runs of digits, or a single
    * other non-space char. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Word k-shingles ("a b c") from a token array column. */
  def shingles(toks: Column, k: Int): Column = {
    // shingle i (1-based) = toks[i..i+k-1] joined by ' '
    val n = size(toks)
    when(n >= k,
      transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  // token-count / stopword-ratio quality features live in the native
  // graft.plans.TextStats expression (one pass over the raw string)

  /** 64-bit SimHash fingerprint of a token array (classic Charikar
    * simhash). Delegates to the native [[graft.plans.SimHashTokens]]
    * expression — the equivalent 64-interpreted-aggregates expression
    * tree re-walks the token array per bit and is ~100× slower. */
  def simhash64(toks: Column): Column =
    graft.plans.SimHashTokens.simhashTokens(toks)

  /** PII scrubbing: redact email-like and phone-like spans with typed
    * placeholder tokens — the standard pre-training privacy pass.
    * Plain `regexp_replace` chains (codegen'd, no UDF); patterns are
    * deliberately dialect-neutral (character classes and bounded
    * quantifiers only) so an engine-independent oracle can replay
    * them. Real deployments extend the chain with locale-specific
    * patterns the same way. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
      "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>")

  /** Language ID via stopword/character heuristics. The synthetic corpus
    * carries a `lang` label; this recomputes a deterministic n-gram-
    * frequency score per candidate language and picks the argmax.
    * (Heuristic profile approach — see reference `documents` handling;
    * scoring is a plain expression tree.) */
  def langIdScore(text: Column, profile: Seq[String]): Column = {
    // score = number of profile n-grams contained in the text
    val arr = array(profile.map(lit): _*)
    size(filter(arr, g => text.contains(g)))
  }
}
