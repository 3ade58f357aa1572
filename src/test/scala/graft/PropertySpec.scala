package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks: the custom bounded aggregates and the as-of
  * join must agree with brute-force formulations on RANDOM inputs —
  * duplicates, ties, negative values, skewed group sizes — not just on
  * the well-behaved test corpus. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic forAll: sample the generator at fixed seeds (no
    * scalatestplus bridge in the offline dependency set). */
  private def forSamples[T](gen: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed at seed $i")))
    }

  private val rowsGen: Gen[List[(String, Double, Long)]] =
    Gen.listOfN(60, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-100.0, 100.0)
      // a small id space forces duplicate ids and (value, id) ties
      id <- Gen.chooseNum(0L, 20L)
    } yield (g, math.rint(v * 4) / 4, id)) // quarter-steps force value ties

  test("TopKPairs equals window-rank top-k on random data with ties") {
    import spark.implicits._
    forSamples(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("g", "v", "id")
        val agged = df.groupBy("g")
          .agg(graft.plans.TopKPairs.topK(struct(col("v"), col("id")), 5).as("top"))
          .select(col("g"), posexplode(col("top")))
          .select(col("g"), (col("pos") + 1).as("rn"), col("col.value").as("v"), col("col.id").as("id"))
        val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
        val windowed = df.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5).select("g", "rn", "v", "id")
        assert(agged.exceptAll(windowed).count() === 0)
        assert(windowed.exceptAll(agged).count() === 0)
      }
    }
  }

  test("BottomKIds equals window-rank bottom-k on random data") {
    import spark.implicits._
    forSamples(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("g", "v", "id")
          .withColumn("key", md5(col("id").cast("string").cast("binary")))
        val agged = df.groupBy("g")
          .agg(graft.plans.BottomKIds.bottomK(struct(col("key"), col("id")), 4).as("ids"))
          .select(col("g"), explode(col("ids")).as("id"))
        val w = Window.partitionBy("g").orderBy(col("key"), col("id"))
        // the aggregate keeps k smallest (key, id) pairs INCLUDING
        // duplicate ids — compare against the same multiset semantics
        val windowed = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4).select("g", "id")
        assert(agged.exceptAll(windowed).count() === 0)
        assert(windowed.exceptAll(agged).count() === 0)
      }
    }
  }

  test("AsOfJoin equals per-row brute force on random event/state data (incl. null ts)") {
    import spark.implicits._
    val tsGen: Gen[Option[Long]] =
      Gen.frequency(9 -> Gen.chooseNum(0L, 50L).map(Some(_)), 1 -> Gen.const(None))
    val gen = for {
      events <- Gen.listOfN(25, for {
        k <- Gen.chooseNum(0L, 4L); t <- tsGen
      } yield (k, t))
      states <- Gen.listOfN(15, for {
        k <- Gen.chooseNum(0L, 4L); t <- tsGen
        v <- Gen.chooseNum(1.0, 9.0)
      } yield (k, t, math.rint(v)))
    } yield (events, states)
    forSamples(gen) { case (events, states) =>
      if (events.nonEmpty) {
        val l = events.zipWithIndex
          .map { case ((k, t), i) =>
            (i.toLong, k, t.map(x => new java.sql.Timestamp(x * 1000)).orNull) }
          .toDF("eid", "k", "ts")
        val r = states.zipWithIndex
          .map { case ((k, t, v), i) =>
            (i.toLong, k, t.map(x => new java.sql.Timestamp(x * 1000)).orNull, v) }
          .toDF("sid", "k", "sts", "v")
        val out = graft.operators.AsOfJoin
          .asof(l, r, "k", "ts", "sts", "v", "sid", "eid")
          .select(col("eid"), col("asof_value")).collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
        // the custom physical operator must agree row-for-row,
        // including on null-timestamp rows (both treat null ts as
        // "before all events" on the state side, and a null-ts event
        // sees only null-ts state)
        val outNative = graft.operators.AsOfJoin
          .asofNative(l, r, "k", "ts", "sts", "v", "sid")
          .select(col("eid"), col("asof_value")).collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
        assert(outNative === out)
        // brute force: null state ts sorts before everything; a
        // null-ts event admits only null-ts state
        val expect = events.zipWithIndex.map { case ((k, t), i) =>
          val visible = states.zipWithIndex.filter { case ((sk, st, _), _) =>
            sk == k && (st.isEmpty || (t.nonEmpty && st.get <= t.get))
          }
          // null ts ranks below every concrete ts (NULLS FIRST);
          // note -Long.MinValue overflows, hence the explicit MaxValue
          val best = visible.sortBy { case ((_, st, _), si) =>
            (st.map(x => -x).getOrElse(Long.MaxValue), -si) }.headOption
          i.toLong -> best.map(_._1._3)
        }.toMap
        assert(out === expect)
      }
    }
  }

  private val docGen: Gen[List[String]] =
    Gen.listOfN(25, for {
      n <- Gen.chooseNum(0, 40)
      // a 6-word vocab forces heavy token/bigram/trigram repetition
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee", "f"))
    } yield toks.mkString(" "))

  test("RepetitionStats equals the composed explode+groupBy formulation") {
    import spark.implicits._
    forSamples(docGen, n = 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = df.select(col("doc_id"),
          graft.plans.RepetitionStats.repetitionStats(col("text")).as("r"))
        .select(col("doc_id"), col("r.n_tokens"), col("r.n_distinct"),
          col("r.top_bigram"), col("r.top_trigram"))
      import graft.functions.{TextFunctions => TF}
      def topNgram(k: Int) = df
        .select(col("doc_id"), explode(TF.shingles(TF.tokens(col("text")), k)).as("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id").agg(max("count").as(s"top$k"))
      val composed = df.select(col("doc_id"),
          size(TF.tokens(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(TF.tokens(col("text")))).cast("long").as("n_distinct"))
        .join(topNgram(2), Seq("doc_id"), "left")
        .join(topNgram(3), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          coalesce(col("top2"), lit(0L)).as("top_bigram"),
          coalesce(col("top3"), lit(0L)).as("top_trigram"))
      assert(native.exceptAll(composed).count() === 0)
      assert(composed.exceptAll(native).count() === 0)
    }
  }

  test("Chunker covers every token position with the exact stride pattern") {
    import spark.implicits._
    val cfgGen = for {
      n <- Gen.chooseNum(0, 50)
      size <- Gen.chooseNum(1, 12)
      stride <- Gen.chooseNum(1, 12)
    } yield (n, size, stride)
    forSamples(cfgGen, n = 12) { case (n, size, stride) =>
      val df = Seq((1L, (0 until n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out = graft.operators.Chunker
        .tokenChunks(df, "doc_id", "text", size, stride)
        .orderBy("chunk_id").collect()
      val expectStarts = (0 until n by stride).toSeq
      assert(out.map(_.getLong(1)).toSeq === expectStarts.indices.map(_.toLong))
      out.zip(expectStarts).foreach { case (r, start) =>
        val want = (start until math.min(start + size, n)).map(i => s"t$i")
        assert(r.getLong(2) === want.length.toLong)
        assert(r.getString(3) === want.mkString(" "))
      }
    }
  }

  test("Int8QuantStats matches an interpreted reference on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-50.0, 50.0))
    forSamples(vecGen, n = 10) { v =>
      val r = Seq(Tuple1(v.toArray)).toDF("v")
        .select(graft.plans.VecQuant.int8QuantStats(col("v")).as("q"))
        .select(col("q.scale"), col("q.sum_q"), col("q.max_abs_err")).head
      val amax = v.map(math.abs).foldLeft(0.0)(math.max)
      if (amax == 0.0) {
        assert(r.getDouble(0) === 0.0 && r.getLong(1) === 0L && r.getDouble(2) === 0.0)
      } else {
        val scale = amax / 127.0
        val qs = v.map(x => math.floor(x / scale + 0.5))
        assert(r.getDouble(0) === scale)
        assert(r.getLong(1) === qs.map(_.toLong).sum)
        assert(r.getDouble(2) ===
          v.zip(qs).map { case (x, q) => math.abs(x - q * scale) }.foldLeft(0.0)(math.max))
        // every code fits int8 by construction
        assert(qs.forall(q => q >= -127 && q <= 127))
      }
    }
  }

  test("wide simhash banding: pair-identical to narrow for hamming<=3, far fewer collisions") {
    import spark.implicits._
    import graft.operators.Dedup
    // deterministic fingerprints: LCG randoms + planted near-pairs at
    // hamming 1, 2, 3 (must be found — both schemes are exhaustive
    // there) and 4 (must be excluded by the hamming filter)
    var s = 88172645463325252L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val base = Seq.fill(500)(next())
    def flip(h: Long, bits: Seq[Int]) = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    val planted = base.take(40).zipWithIndex.flatMap { case (h, i) =>
      Seq(flip(h, Seq(i % 64)),                                  // hamming 1
          flip(h, Seq(i % 64, (i + 21) % 64)),                   // hamming 2
          flip(h, Seq(i % 64, (i + 21) % 64, (i + 43) % 64)),    // hamming 3
          flip(h, Seq(i % 64, (i + 7) % 64, (i + 29) % 64, (i + 51) % 64))) // 4
    }
    val hashes = (base ++ planted).distinct.toDF("simhash")
    def pairSet(wide: Boolean): Set[(Long, Long)] =
      Dedup.bandedHashPairs(hashes, maxHamming = 3, wide = wide)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force hamming join is the ground truth both must equal
    val truth = hashes.toDF("h1").crossJoin(hashes.toDF("h2"))
      .filter(col("h1") < col("h2"))
      .withColumn("d", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("d") <= 3 && col("d") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = pairSet(wide = false)
    val wide = pairSet(wide = true)
    assert(narrow === truth, "narrow banding must be exhaustive for hamming <= 3")
    assert(wide === truth, "wide banding must be exhaustive for hamming <= 3")
    assert(truth.nonEmpty, "planted near-pairs must appear")
    // collision work: Σ f·(f−1)/2 over (band, block) buckets — the
    // rows each scheme's candidate self-join must produce. Measured on
    // PURELY RANDOM fingerprints at n=20000 (no planted pairs), where
    // work is all spurious collisions: narrow expects ≈ 4·n²/2/2^16
    // ≈ 12k rows, wide ≈ 10·n²/2/2^26 ≈ 30 — the 100× gap is the
    // whole point of the wider keys. (On the small planted set above
    // the counts are dominated by TRUE pairs, which legitimately
    // share more of wide's 10 bands.)
    val randoms = Seq.fill(20000)(next()).distinct.toDF("simhash")
    def work(wide: Boolean): Long = {
      val cols =
        if (!wide) (0 until 4).map(b =>
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)))
        else {
          val offs = Seq((0, 13), (13, 13), (26, 13), (39, 13), (52, 12))
          def piece(i: Int) = shiftright(col("simhash"), offs(i)._1)
            .bitwiseAND(lit((1L << offs(i)._2) - 1))
          for { i <- 0 until 5; j <- i + 1 until 5 }
            yield shiftleft(piece(i), 14).bitwiseOR(piece(j))
        }
      randoms.select(posexplode(array(cols: _*))).toDF("band", "block")
        .groupBy("band", "block").agg(count(lit(1)).as("f"))
        .agg(sum(expr("f * (f - 1)"))).collect()(0).getLong(0) / 2
    }
    val (wNarrow, wWide) = (work(false), work(true))
    info(s"random-collision work at n=20000: narrow(4x16) = $wNarrow, wide(10x~26) = $wWide")
    assert(wWide * 50 <= wNarrow,
      s"wide banding should collapse spurious collisions: $wWide vs $wNarrow")
  }

  test("prefix-filtered Jaccard stays exact AND bounds candidates under a hot shingle") {
    import spark.implicits._
    import graft.operators.Dedup
    // Zipf-shaped web-corpus pathology: EVERY doc opens with the same
    // boilerplate (a maximally hot shingle), then unique content; a
    // few near-dup pairs share their tails too. On this shape the
    // naive inverted-index join pays f·(f−1)/2 per hot shingle
    // (f = corpus size); the PPJoin prefix filter must (a) return the
    // IDENTICAL pair set and (b) do asymptotically less join work.
    val boiler = "terms of service apply to all content on this site"
    val docs = (0 until 400).map { i =>
      val tail =
        if (i % 50 == 0) "shared tail alpha beta gamma delta epsilon zeta eta theta"
        else s"unique u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val t = 0.8
    val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = t)
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", k = 3, threshold = t)
    // (a) exactness under skew: row-identical output
    assert(naive.exceptAll(prefix).count() === 0)
    assert(prefix.exceptAll(naive).count() === 0)
    assert(prefix.count() > 0, "stress corpus must actually contain near-dup pairs")
    // (b) the cost shapes, computed from the same shingle tables the
    // operators build: join work = Σ_s f_s·(f_s−1)/2 over the postings
    // each formulation feeds its self-join
    def joinWork(postings: org.apache.spark.sql.DataFrame, shingleCol: String): Long =
      postings.groupBy(col(shingleCol)).agg(count(lit(1)).as("f"))
        .agg(sum(expr("f * (f - 1)"))).collect()(0).getLong(0) / 2
    val sh = Dedup.shingleHashTable(docs, "doc_id", "text", 3)
    val naiveWork = joinWork(sh, "shingle")
    // replicate the operator's rarest-first prefix to count ITS postings
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val lists = sh.join(dfreq, "shingle").groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("sharr"))
    val plen = (size(col("sharr")) - ceil(lit(t) * size(col("sharr"))) + 1).cast("int")
    val prefixWork = joinWork(
      lists.select(explode(slice(col("sharr"), lit(1), plen)).as("s"))
        .select(col("s.shingle").as("s")), "s")
    info(s"join work: naive = $naiveWork pair-rows, prefix = $prefixWork")
    // every boilerplate shingle costs the naive join ~400·399/2 rows;
    // at t=0.8 the rarest-first prefixes hold only df=1/df=8 shingles,
    // excluding boilerplate entirely — the gap is orders of magnitude
    // (measured ~700k vs ~300); assert a conservative 100×
    assert(prefixWork * 100 <= naiveWork,
      s"prefix filtering should bound hot-shingle join work: $prefixWork vs $naiveWork")
  }

  test("BpeSweepTokenCount cascades merges rank-major, leftmost-first") {
    import spark.implicits._
    def count(words: Seq[String], merges: Seq[(String, String)]): Long =
      Seq(Tuple1(words)).toDF("toks")
        .select(graft.plans.BpeSweepTokenCount
          .bpeSweepTokenCount(col("toks"), merges).as("n"))
        .head.getLong(0)
    // CASCADE: a rank's output symbol merges again at later ranks —
    // (e,r)→er then (m,er)→mer then (mer,g)→merg: "merge" → merg|e = 2
    assert(count(Seq("merge"),
      Seq(("e", "r"), ("m", "er"), ("mer", "g"))) === 2L)
    // rank priority beats left-to-right: rank-0 (h,e) consumes the h
    // of "the" first, so rank-1 (t,h) cannot fire → t|he = 2
    assert(count(Seq("the"), Seq(("h", "e"), ("t", "h"))) === 2L)
    // leftmost-first non-overlap within a rank sweep
    assert(count(Seq("aaa"), Seq(("a", "a"))) === 2L)
    assert(count(Seq("aaaa"), Seq(("a", "a"))) === 2L) // (0,1) and (2,3)
    // and the merged symbol cascades on the NEXT rank: (aa,aa) → 1
    assert(count(Seq("aaaa"), Seq(("a", "a"), ("aa", "aa"))) === 1L)
    // empty inputs and 1-char words pass through
    assert(count(Seq.empty, Seq(("a", "b"))) === 0L)
    assert(count(Seq("a", "b"), Seq(("a", "b"))) === 2L)
  }

  test("Bpe.train cascades to a true subword vocabulary, deterministically, and saturates safely") {
    import graft.operators.Bpe
    // hand-checkable corpus: 'abab'×4 dominates, 'abc'×1
    // it0: (a,b) count 8+1 → merge ab everywhere
    // it1: (ab,ab) count 4 beats (ab,c) count 1 → merge abab
    // it2: (ab,c) count 1 → merge abc; saturation: no pairs remain
    val m = Bpe.train(Seq(("abab", 4L), ("abc", 1L)), budget = 100)
    assert(m === Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    // input order must not matter (counting is commutative, the
    // argmax order is total)
    assert(Bpe.train(Seq(("abc", 1L), ("abab", 4L)), budget = 100) === m)
    // budget caps the table
    assert(Bpe.train(Seq(("abab", 4L), ("abc", 1L)), budget = 2) === m.take(2))
    // tie-break is the bracketed pair string ascending: equal counts
    // (x,y)=1 and (p,q)=1 → '(p)(q)' < '(x)(y)'
    assert(Bpe.train(Seq(("xy", 1L), ("pq", 1L)), budget = 1) ===
      Seq(("p", "q")))
    // application (the sweep expression's rule) replays training: the
    // trained table re-tokenizes every training word to ONE symbol
    // here (this corpus saturated), matching the state train() left
    import spark.implicits._
    val toks = Seq(Tuple1(Seq("abab", "abc"))).toDF("toks")
      .select(graft.plans.BpeSweepTokenCount
        .bpeSweepTokenCount(org.apache.spark.sql.functions.col("toks"), m).as("n"))
      .head.getLong(0)
    assert(toks === 2L) // one symbol per word
  }

  test("BPE at production scale: >=1k merges train; candidate-rank sweep == naive full-rank sweep") {
    import graft.operators.Bpe
    import graft.plans.BpeSweepTokenCount
    import spark.implicits._
    // the q92-family augmented vocabulary: 512 md5-hex words behind a
    // U+0001 sentinel — rich enough that a >=1k-merge table TRAINS
    // instead of saturating (a 31-word corpus drains at 89 merges)
    def md5hex(s: String) = graft.functions.Sketches.md5HexLocal(s)
    val synth = (0 until 512).map(i =>
      ("\u0001" + md5hex(i.toString), 1L + (i % 7)))
    val corpus = Seq(("the", 900L), ("quick", 300L), ("brown", 250L),
      ("fox", 200L))
    val big = Bpe.train(corpus ++ synth, budget = 1200)
    assert(big.length === 1200,
      s"trained only ${big.length} merges — the synthetic vocabulary " +
        "must support the production budget without saturating")
    // the cascade runs deep: late ranks merge long composite symbols
    assert(big.drop(1000).exists { case (a, b) => (a + b).length >= 8 },
      "late ranks should merge multi-char cascade symbols")
    // EQUIVALENCE: the candidate-rank evaluation must equal the naive
    // full-rank sweep word-for-word — on the big table AND a small
    // one, over seen, unseen, and adversarial words (repeats, the
    // sentinel char, same-pair-retrained shapes)
    val small = Bpe.train(corpus, budget = 48)
    val probes = (corpus.map(_._1) ++ synth.take(8).map(_._1) ++
      (600 until 640).map(i => "\u0001" + md5hex(i.toString)) ++
      Seq("", "a", "aaaa", "thequickbrown", "\u0001\u0001aa",
        "ababababab", "0123456789abcdef")).distinct
    for (t <- Seq(small, big)) {
      val got = probes.toDF("w")
        .select(col("w"), BpeSweepTokenCount
          .bpeSweepTokenCount(array(col("w")), t).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      probes.foreach { w =>
        assert(got(w) === BpeSweepTokenCount.naiveSweepTokens(w, t),
          s"candidate sweep diverged from naive on '$w' " +
            s"(${t.length}-merge table)")
      }
    }
    // randomized stress on the hex alphabet (hits many trained pairs,
    // including re-trained same-pair ranks): fast == naive, always
    val hexWord: Gen[String] = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, Gen.oneOf("0123456789abcdef".toSeq))
    } yield cs.mkString
    forSamples(Gen.listOfN(40, hexWord), n = 5) { words =>
      val expr = graft.plans.BpeSweepTokenCount(
        org.apache.spark.sql.graftbridge.Bridge.toExpression(lit("x")),
        big.map(_._1), big.map(_._2))
      // drive tokensOf through the public count() on 1-element arrays
      words.foreach { w =>
        val arr = org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(Array(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
        assert(expr.count(arr) === BpeSweepTokenCount.naiveSweepTokens(w, big),
          s"random hex word '$w' diverged")
      }
    }
  }

  test("cluster dedup composite stays exact and skew-bounded over the prefix generator") {
    import spark.implicits._
    import graft.operators.{Cluster, Dedup}
    // the q59/q67 composite under the same universal-boilerplate skew:
    // canonicalize(connected components) over the pair set. The prefix
    // generator is hash-proved pair-identical to the naive join, so the
    // CLUSTER output must be identical too — and the composite's
    // candidate work inherits the prefix bound (the previous test
    // measures the ~100× gap on this corpus shape), which is what makes
    // q59/q67 survive a hot shingle at corpus scale.
    val boiler = "terms of service apply to all content on this site"
    val docs = (0 until 400).map { i =>
      val tail =
        if (i % 50 == 0) "shared tail alpha beta gamma delta epsilon zeta eta theta"
        else s"unique u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    def canon(pairs: org.apache.spark.sql.DataFrame) =
      Cluster.canonicalize(pairs, "d1", "d2")
    val viaPrefix = canon(
      Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", k = 3, threshold = 0.8))
    val viaNaive = canon(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8))
    assert(viaPrefix.exceptAll(viaNaive).count() === 0)
    assert(viaNaive.exceptAll(viaPrefix).count() === 0)
    // the planted shared-tail docs (every 50th) form one real cluster:
    // 8 members, 7 non-canonical
    assert(viaPrefix.count() === 8)
    assert(viaPrefix.filter(!col("is_canonical")).count() === 7)
  }

  /** random (id, content) tables + random mutation sets */
  private val manifestGen: Gen[(List[(Long, String)], Set[Long], Set[Long])] =
    for {
      n <- Gen.chooseNum(5, 80)
      rows <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 200L)
        s <- Gen.oneOf("x", "yy", "zzz", "", "abc def")
      } yield (id, s))
      distinct = rows.toMap.toList // unique ids
      rm <- Gen.someOf(distinct.map(_._1))
      ch <- Gen.someOf(distinct.map(_._1))
    } yield (distinct, rm.toSet, ch.toSet -- rm.toSet)

  test("manifest delta algebra ≡ fresh rebuild on random tables and random deltas") {
    import spark.implicits._
    import graft.operators.Versioning
    val cols = Seq("content")
    forSamples(manifestGen, n = 8) { case (rows, removedIds, changedIds) =>
      if (rows.nonEmpty) {
        val base = rows.toDF("id", "content")
        val removed = base.filter(col("id").isin(removedIds.toSeq: _*))
        val chOld = base.filter(col("id").isin(changedIds.toSeq: _*))
        val chNew = chOld.withColumn("content", concat(col("content"), lit("!")))
        val adds = base.limit(3)
          .withColumn("id", col("id") + lit(100000L))
        val v2 = base
          .filter(!col("id").isin((removedIds ++ changedIds).toSeq: _*))
          .unionByName(chNew).unionByName(adds)
        val updated = Versioning.updateManifest(
          Versioning.manifest(base, "id", cols, 8),
          removed.unionByName(chOld), chNew.unionByName(adds), "id", cols, 8)
        val fresh = Versioning.manifest(v2, "id", cols, 8)
        assert(updated.exceptAll(fresh).count() === 0 &&
          fresh.exceptAll(updated).count() === 0,
          s"delta ≠ rebuild for ${rows.size} rows, rm=${removedIds.size}, ch=${changedIds.size}")
      }
    }
  }
}
