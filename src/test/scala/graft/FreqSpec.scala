package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Entropy, Freq, Similarity}

/** Semantics of the round-7 operators: count-min sketch, Bloom-filter
  * decontamination, PQ-ANN, char entropy. */
class FreqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- count-min sketch ----------------------------------------------

  test("cms estimates never undercount and are exact without collisions") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val got = Freq.cmsHeavyHitters(docs, "text", depth = 4, width = 1024, topN = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 20)
    got.foreach { case (term, exact, est) =>
      assert(est >= exact, s"$term: est $est < exact $exact")
    }
    // with a huge width there are effectively no collisions at this
    // corpus size in at least one of the 4 rows → estimates are exact
    val wide = Freq.cmsHeavyHitters(docs, "text", depth = 4, width = 1 << 22, topN = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    wide.foreach { case (term, exact, est) =>
      assert(est === exact, s"$term: est $est != exact $exact at width 2^22")
    }
  }

  test("cms counter grids merge by addition across shards") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def grid(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      Freq.cmsSketch(df, "text", depth = 4, width = 256).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = grid(docs)
    val merged = (grid(a).toSeq ++ grid(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(whole === merged)
  }

  // ---- bloom decontamination -----------------------------------------

  test("bloom guard has no false negatives and bounds hits by shingles") {
    val evalDocs = Seq(
      (910L, "the quick brown fox jumps over the lazy dog today"),
      (1820L, "entirely different benchmark content for the eval set")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then the quick brown fox jumps over the lazy dog today"),
      (2L, "no overlap with anything in that set at all"),
      (3L, "entirely different benchmark content for the eval set verbatim copy")
    ).toDF("doc_id", "text")
    val got = Freq.bloomContamination(corpus, evalDocs, "doc_id", "text",
        k = 3, hashes = 3, mBits = 65536)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 1 and 3 share shingles with the eval set: MUST be flagged,
    // with bloom_hits covering every true hit (no false negatives)
    for (id <- Seq(1L, 3L)) {
      val (n, bloomHits, trueHits) = got(id)
      assert(trueHits > 0 && bloomHits >= trueHits && bloomHits <= n, s"doc $id")
    }
    // doc 2 has zero true hits; it may appear only via false positives
    got.get(2L).foreach { case (_, bloomHits, trueHits) =>
      assert(trueHits === 0L && bloomHits > 0L)
    }
  }

  test("bloom flags agree with the exact guard on the corpus") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val corpus = docs.filter(col("doc_id") % 91 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 91 === 0)
    val rows = Freq.bloomContamination(corpus, evalSet, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.foreach { case (id, bloomHits, trueHits) =>
      assert(bloomHits >= trueHits, s"doc $id lost a true hit")
    }
    // every doc with a real shared shingle is present in the output
    val exactContaminated = corpus
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("s"))
      .distinct()
      .join(evalSet.select(
        explode(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 3)).as("s")).distinct(), "s")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(exactContaminated.subsetOf(rows.map(_._1).toSet))
  }

  test("bloom probe is map-only: one corpus-side shuffle, no per-position explode-join") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val got = Freq.bloomContamination(
      docs.filter(col("doc_id") % 91 =!= 0),
      docs.filter(col("doc_id") % 91 === 0), "doc_id", "text",
      uniqueIds = true)
    got.collect() // materialize so executedPlan is final (AQE)
    // AQE's toString prints Final AND Initial plans — count the final
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the whole flow has exactly TWO hash exchanges: the eval-side
    // shingle distinct (inside the broadcast build) and the per-doc
    // reduce. The pre-rewrite plan also shuffled the exploded
    // (doc, shingle, pos) set and re-aggregated it — the bitmap
    // literal makes membership a forall over plan constants instead.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"bloom probe regressed to $shuffles shuffles:\n$plan")
    assert(!plan.contains("pos#"),
      "bloom membership must not explode hash positions into the plan")
  }

  test("bloom default counts a shingle shared between an id's rows ONCE") {
    // doc 1 split over two rows that REPEAT the same text: every
    // shingle is shared between the rows. The default (cross-row
    // dedup) must count each once — identical to the one-row frame;
    // the uniqueIds fast path over the same split frame double counts
    // (which is exactly why the flag is an attestation).
    val text = "the quick brown fox jumps over the lazy dog today"
    val evalDocs = Seq((9L, text)).toDF("doc_id", "text")
    val split = Seq((1L, text), (1L, text)).toDF("doc_id", "text")
    val one = Seq((1L, text)).toDF("doc_id", "text")
    def counts(df: org.apache.spark.sql.DataFrame, unique: Boolean) =
      Freq.bloomContamination(df, evalDocs, "doc_id", "text",
          uniqueIds = unique)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(counts(split, unique = false) === counts(one, unique = true))
    val (nDup, bDup, tDup) = counts(split, unique = true)
    val (n1, b1, t1) = counts(one, unique = true)
    assert((nDup, bDup, tDup) === ((2 * n1, 2 * b1, 2 * t1)),
      "attestation misuse should double count — if not, the fast path " +
        "started deduping and the default's extra exchange is dead weight")
  }

  // ---- PQ ANN --------------------------------------------------------

  test("pq retrieves exact-match vectors first with zero ADC distance") {
    // corpus = 4 anchors repeated; every vector quantizes exactly onto
    // its anchor, so same-anchor neighbors have adc = 0 and rank first
    val r = new scala.util.Random(7)
    val anchors = Array.fill(4)(Array.fill(64)(r.nextFloat() * 2 - 1))
    val corpus = (0 until 40).map(i => (i.toLong, anchors(i % 4).clone()))
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 0) // anchor 0
    val got = Similarity.pqTopK(corpus, probes, k = 9, nCentroids = 16, blockDim = 8)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.length === 9)
    // the 9 other anchor-0 copies (ids 4,8,...,36) come first, at 0
    assert(got.map(_._1).toSet === (4L to 36L by 4).toSet)
    assert(got.forall(_._2 === 0.0))
  }

  test("pq is deterministic and ranks within-probe by distance") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val probes = emb.filter(col("vec_id") < 5)
    def run() = Similarity.pqTopK(emb, probes, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val a = run(); val b = run()
    assert(a.toSet === b.toSet && a.length === 50)
    a.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
    }
  }

  test("ivfpq candidates come from probe cells and score identically to pq") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val probes = emb.filter(col("vec_id") < 5)
    val ivfpq = Similarity.ivfPqTopK(emb, probes, k = 10, nCentroids = 16,
        nProbe = 4, blockDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivfpq.nonEmpty)
    // ADC is a function of (probe table, corpus codes) only — pruning
    // must not change any pair's score, merely which pairs exist
    val full = Similarity.pqTopK(emb, probes, k = 2000, blockDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivfpq.foreach { case (pair, adc) =>
      assert(full(pair) === adc, s"pair $pair scored differently under pruning")
    }
  }

  // ---- source KL divergence ------------------------------------------

  test("source KL divergence is non-negative, zero for a single source") {
    val one = Seq((1L, "alpha beta beta"), (2L, "alpha gamma")).map { case (i, t) => (i, "s0", t) }
      .toDF("doc_id", "source", "text")
    val gotOne = graft.operators.Terms.sourceDivergence(one, "source", "text").collect()
    assert(gotOne.length === 1 && gotOne.head.getDouble(3) === 0.0)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val got = graft.operators.Terms.sourceDivergence(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (src, n, kl) => assert(kl >= 0.0 && n > 0, s"$src kl=$kl") }
  }

  test("source KL divergence matches a JVM reference model") {
    val docs = Seq(
      (1L, "a", "x x y"), (2L, "a", "x z"),
      (3L, "b", "y y y z"), (4L, "b", "w")
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.Terms.sourceDivergence(docs, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val corpus = Map("x" -> 3L, "y" -> 4L, "z" -> 2L, "w" -> 1L)
    val bySource = Map(
      "a" -> Map("x" -> 3L, "y" -> 1L, "z" -> 1L),
      "b" -> Map("y" -> 3L, "z" -> 1L, "w" -> 1L))
    val nTotal = corpus.values.sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((src, cs) <- bySource) {
      val ns = cs.values.sum.toDouble
      val kl = cs.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (t, c)) =>
        val p = c / ns; val q = corpus(t) / nTotal
        acc + p * math.log(p / q)
      }
      assert(got(src) === ((ns.toLong, cs.size.toLong, r6(kl))), s"source $src")
    }
  }

  // ---- funnel / retention --------------------------------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel counts only strictly-ordered step sequences") {
    val rows = Seq(
      // user 1: full ordered journey
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      // user 2: purchase BEFORE click → drops at stage 3
      (4L, ts("2024-01-02 10:00:00"), 2L, "view"),
      (5L, ts("2024-01-02 12:00:00"), 2L, "purchase"),
      (6L, ts("2024-01-02 13:00:00"), 2L, "click"),
      // user 3: click before any view → drops at stage 2
      (7L, ts("2024-01-03 09:00:00"), 3L, "click"),
      (8L, ts("2024-01-03 10:00:00"), 3L, "view"),
      // user 4: view only
      (9L, ts("2024-01-04 10:00:00"), 4L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.Funnel.funnel(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "1_view", 4L, 1.0),
      (2L, "2_click", 2L, 0.5),      // users 1, 2
      (3L, "3_purchase", 1L, 0.5))) // user 1 only
  }

  test("weekly retention cohorts by first-event week") {
    val w0 = ts("2024-01-01 00:00:00") // within some epoch week W
    def plus(days: Int) = new java.sql.Timestamp(w0.getTime + days * 86400000L)
    val rows = Seq(
      (1L, plus(0), 10L, "click"),   // user 10: weeks W, W+2
      (2L, plus(15), 10L, "view"),
      (3L, plus(1), 11L, "click"),   // user 11: week W only
      (4L, plus(8), 12L, "view")     // user 12: first event week W+1
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.operators.Funnel.weeklyRetention(rows, "user_id", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // offsets relative to each user's own first week; 2024-01-01 falls
    // mid-epoch-week so day+1 may or may not share user 10's week —
    // assert on the structural cells instead of absolute weeks
    val byOffset = got.groupBy(_._1)
    assert(byOffset(0L).map(_._3).sum === 3L)          // everyone at offset 0
    assert(got.filter(_._1 > 0L).forall(_._4 <= 1.0))  // rates bounded
    assert(got.map(_._1).max === 2L || got.map(_._1).max === 1L)
  }

  test("rate anomalies flag an injected spike, not the steady state") {
    // 80 hours of exactly-3-events steady state... except hour 60
    // carries a 40-event burst. Variance of the trailing window is 0
    // until the burst enters it, so only the burst hour can flag.
    val base = ts("2024-01-01 00:00:00").getTime
    def at(hour: Int, i: Int) =
      (hour * 100L + i, new java.sql.Timestamp(base + hour * 3600000L + i * 1000L),
        5L, "click")
    val rows = (for (h <- 0 until 80; i <- 0 until (if (h == 60) 40 else 3))
      yield at(h, i)).toDF("event_id", "ts", "user_id", "event_type")
    val h0 = base / 3600000L // hour_start is the ABSOLUTE epoch hour
    val got = graft.operators.Funnel.rateAnomalies(rows, "event_type", "ts",
        lookback = 24, zThresh = 2.0)
      .collect().map(r => (r.getLong(1) - h0, r.getLong(2), r.getDouble(4)))
    // the steady window before the burst has zero variance → no rows
    // until hour 60; the burst itself z-scores against mean 3, var 0 →
    // filtered (variance > 0 guard), so flags can only appear AFTER
    // the burst enters the trailing window
    assert(got.forall(_._1 > 60L), s"unexpected flags: ${got.toSeq}")
    // re-run with a noisy baseline so the burst itself flags
    val noisy = (for (h <- 0 until 80;
                      i <- 0 until (if (h == 60) 40 else 3 + (h % 3)))
      yield at(h, i)).toDF("event_id", "ts", "user_id", "event_type")
    val flagged = graft.operators.Funnel.rateAnomalies(noisy, "event_type", "ts",
        lookback = 24, zThresh = 2.0)
      .collect().map(_.getLong(1) - h0)
    assert(flagged.contains(60L), s"burst hour not flagged: ${flagged.toSeq}")
  }

  // ---- dataset diff --------------------------------------------------

  test("dataset diff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, "same"), (2L, "gone"), (3L, "was this"), (4L, "stable"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (3L, "now this"), (4L, "stable"), (5L, "brand new"))
      .toDF("doc_id", "text")
    val got = graft.operators.Versioning.datasetDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "removed", 3L -> "changed", 5L -> "added"))
    val summary = graft.operators.Versioning.diffSummary(v1, v2, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 2L))
  }

  test("dataset diff treats null content as empty (no spurious changes)") {
    val v1 = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("doc_id", "text")
    val v2 = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = graft.operators.Versioning.datasetDiff(v1, v2, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSet === Set(2L)) // null ≡ "" unchanged; "x"→null changed
  }

  // ---- char entropy --------------------------------------------------

  test("char entropy matches closed-form values") {
    val df = Seq(
      (1L, "aaaa"),            // single symbol: H = 0
      (2L, "abcd"),            // uniform over 4: H = ln 4
      (3L, "aab")              // H = ln 3 - (2 ln 2)/3
    ).toDF("doc_id", "text")
    val got = Entropy.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((4L, 1L, 0.0)))
    assert(got(2L) === ((4L, 4L, r6(math.log(4)))))
    assert(got(3L) === ((3L, 2L, r6(math.log(3) - 2 * math.log(2) / 3))))
  }

  test("char entropy counts supplementary characters as one codepoint") {
    // "😀😀a" = 2× U+1F600 (surrogate PAIRS in UTF-16) + 'a':
    // codepoint semantics → n=3, distinct=2, H = ln 3 - (2 ln 2)/3
    val df = Seq((1L, "😀😀a")).toDF("doc_id", "text")
    val got = Entropy.charEntropy(df, "doc_id", "text").collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length === 1)
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getLong(2) === 2L)
    assert(got(0).getDouble(3) === r6(math.log(3) - 2 * math.log(2) / 3))
  }

  test("char entropy drops null and empty docs") {
    val df = Seq((1L, "ab"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Entropy.charEntropy(df, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
  }
}
