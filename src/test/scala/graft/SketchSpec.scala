package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches
import graft.plans.HllRegisters.hllRegisters

/** Semantics of the round-6 sketch operators (HLL distinct). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def regsOf(xs: Seq[Long]): Array[Long] = {
    val hx = Sketches.hashHex(col("x"))
    xs.toDF("x")
      .select(Sketches.hllBucket(hx).as("bucket"), Sketches.hllRho(hx).as("rho"))
      .agg(hllRegisters(struct(col("bucket"), col("rho")), Sketches.M).as("regs"))
      .collect()(0).getSeq[Long](0).toArray
  }

  private def estimateOf(xs: Seq[Long]): Double = {
    val hx = Sketches.hashHex(col("x"))
    xs.toDF("x")
      .select(Sketches.hllBucket(hx).as("bucket"), Sketches.hllRho(hx).as("rho"))
      .agg(hllRegisters(struct(col("bucket"), col("rho")), Sketches.M).as("regs"))
      .select(Sketches.hllEstimate(col("regs")).as("est"))
      .collect()(0).getDouble(0)
  }

  test("hll estimate tracks exact cardinality across ranges") {
    for (n <- Seq(50, 500, 5000)) {
      val est = estimateOf((1L to n.toLong).toSeq)
      assert(math.abs(est - n) <= 0.2 * n,
        s"n=$n est=$est off by more than 20% (sketch sigma is ~6.5%)")
    }
  }

  test("hll estimate is bit-exact vs an integer JVM replay (raw branch, empty registers)") {
    // n≈1500 with m=256: some registers stay empty AND the raw harmonic
    // branch is taken (raw > 2.5m) — exactly the regime where a
    // double-counted empty-register term inflates the denominator
    // (the round-6 ADVICE bug; sf0.1 q70 regime)
    val n = 1500L
    val xs = (1L to n).toSeq
    val regs = Array.fill(256)(0L)
    xs.foreach { x =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(hex.substring(2, 16), 16)
      val rho = if (v == 0) 57L else (java.lang.Long.numberOfLeadingZeros(v) - 8 + 1).toLong
      regs(bucket) = math.max(regs(bucket), rho)
    }
    val nz = regs.count(_ > 0)
    assert(nz < 256, "test must exercise the empty-register path")
    val numer = regs.map(r => BigInt(2).pow(57 - r.toInt)).sum
    val raw = (0.7213 / (1 + 1.079 / 256.0)) * 65536.0 * math.pow(2.0, 57) / numer.toDouble
    assert(raw > 2.5 * 256, "test must exercise the raw-estimate branch")
    val expected = BigDecimal(raw)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(estimateOf(xs) === expected)
  }

  test("hll registers are duplicate-insensitive") {
    val once = regsOf((1L to 300L).toSeq)
    val dup = regsOf((1L to 300L) ++ (1L to 300L) ++ (1L to 100L))
    assert(once.sameElements(dup))
  }

  test("hll register banks union by elementwise max (mergeable sketch)") {
    val whole = regsOf((1L to 1000L).toSeq)
    val left = regsOf((1L to 700L).toSeq)     // overlapping halves: union
    val right = regsOf((400L to 1000L).toSeq) // must still equal the whole
    val merged = left.zip(right).map { case (a, b) => math.max(a, b) }
    assert(whole.sameElements(merged))
  }

  test("hll_registers is callable from SQL") {
    graft.plans.GraftFunctions.register(spark)
    (1L to 100L).toDF("x").createOrReplaceTempView("hll_in")
    val est = spark.sql(
      """SELECT hll_registers(struct(
           CAST(conv(substring(md5(CAST(x AS STRING)),1,2),16,10) AS BIGINT),
           CAST(58 - length(regexp_extract(substring(md5(CAST(x AS STRING)),3,14),'^0*',0))*0 - 1 AS BIGINT)), 256) AS regs
         FROM hll_in""").collect()(0).getSeq[Long](0)
    assert(est.length === 256 && est.exists(_ > 0))
  }

  // ---- weighted sampling (A-ES) --------------------------------------

  private def aesModel(ids: Seq[Long], w: Long => Double, k: Int): Set[Long] = {
    def key(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(13), 16)
      val eff = if (w(id) <= 0 || w(id).isNaN) 1.0 else w(id)
      -math.log((v + 1).toDouble / 4503599627370496.0) / eff
    }
    ids.sortBy(id => (key(id), id)).take(k).toSet
  }

  test("weighted sample matches the A-ES reference model exactly") {
    val rows = for (g <- 0 until 4; i <- 0 until 50)
      yield (s"g$g", g * 1000L + i, (i % 7 + 1) * 10L)
    val df = rows.toDF("grp", "id", "w")
    val got = graft.operators.Sample.weighted(df, Seq("grp"), "id", col("w"), 5)
      .select(col("grp"), col("id")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    for (g <- 0 until 4) {
      val ids = rows.filter(_._1 == s"g$g").map(_._2)
      val wOf = rows.map(r => r._2 -> r._3.toDouble).toMap
      assert(got(s"g$g") === aesModel(ids, wOf, 5), s"group g$g")
    }
  }

  test("weighted sample maps NaN weights to the degenerate fallback of 1") {
    val rows = (0L until 40L).map(id =>
      ("g", id, if (id % 5 == 0) Double.NaN else (id % 7 + 1).toDouble * 10.0))
    val df = rows.toDF("grp", "id", "w")
    val got = graft.operators.Sample.weighted(df, Seq("grp"), "id", col("w"), 8)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val wOf = rows.map(r => r._2 -> r._3).toMap
    assert(got === aesModel(rows.map(_._2), wOf, 8))
  }

  test("weighted sample is exactly-k and favors heavy weights") {
    // one item per group carries 10000x the weight of the other 19:
    // it must appear in (nearly) every group's sample of 3
    val rows = for (g <- 0 until 50; i <- 0 until 20)
      yield (s"g$g", g * 100L + i, if (i == 0) 100000L else 10L)
    val df = rows.toDF("grp", "id", "w")
    val picked = graft.operators.Sample.weighted(df, Seq("grp"), "id", col("w"), 3)
      .select(col("grp"), col("id")).collect()
    val byGroup = picked.groupBy(_.getString(0))
    assert(byGroup.size === 50 && byGroup.forall(_._2.length === 3))
    val heavyHits = byGroup.count { case (g, rs) =>
      rs.map(_.getLong(1)).contains(g.drop(1).toLong * 100L)
    }
    assert(heavyHits >= 45, s"heavy item picked in only $heavyHits/50 groups")
  }

  test("weighted sample honors fractional weights (A-ES is scale-free)") {
    // normalized weights in (0,1]: one item per group carries 1000x the
    // others' weight. The old greatest(w, 1) clamp collapsed ALL of
    // these to 1 (uniform sampling) — with true A-ES the heavy item
    // must appear in nearly every group's sample of 3.
    val rows = for (g <- 0 until 50; i <- 0 until 20)
      yield (s"g$g", g * 100L + i, if (i == 0) 0.5 else 0.0005)
    val df = rows.toDF("grp", "id", "w")
    val byGroup = graft.operators.Sample.weighted(df, Seq("grp"), "id", col("w"), 3)
      .select(col("grp"), col("id")).collect().groupBy(_.getString(0))
    assert(byGroup.size === 50 && byGroup.forall(_._2.length === 3))
    val heavyHits = byGroup.count { case (g, rs) =>
      rs.map(_.getLong(1)).contains(g.drop(1).toLong * 100L)
    }
    assert(heavyHits >= 45, s"heavy item picked in only $heavyHits/50 groups")
    // and the fractional keys must match the A-ES reference model exactly
    val wOf = rows.map(r => r._2 -> r._3).toMap
    for (g <- Seq(0, 17, 49)) {
      val ids = rows.filter(_._1 == s"g$g").map(_._2)
      assert(byGroup(s"g$g").map(_.getLong(1)).toSet === aesModel(ids, wOf, 3), s"g$g")
    }
  }

  // ---- bigram LM scoring ---------------------------------------------

  test("bigram LM scores fluent repetition above word soup") {
    // "the cat sat" repeated trains high bigram counts; the soup doc's
    // bigrams occur once each → much lower mean log-prob
    val fluent = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val soup = Seq((100L, "zq xv wk jm yt rb nc"))
    val df = (fluent ++ soup).toDF("doc_id", "text")
    val got = graft.operators.LanguageModel.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(100L) + 1.0,
      s"fluent=${got(1L)} soup=${got(100L)}")
  }

  test("bigram LM counts n-1 bigrams and drops sub-bigram docs") {
    val df = Seq((1L, "a b c d"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.LanguageModel.bigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L))
  }

  // ---- semantic dedup ------------------------------------------------

  test("semDedup keeps one exemplar per duplicate group, singletons intact") {
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextFloat() * 2 - 1)
    }
    val base = vec(1); val other = vec(2)
    val rows =
      // group A: ids 1,2,3 identical; group B: ids 10,11 identical
      Seq(1L, 2L, 3L).map(id => (id, base.clone())) ++
      Seq(10L, 11L).map(id => (id, other.clone())) ++
      // 5 mutually-far singletons
      (20L to 24L).map(id => (id, vec(100 + id.toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.SemDedup.semDedup(df, nCentroids = 3, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    val byCluster = out.groupBy(_._2)
    // every cluster keeps exactly one exemplar
    assert(byCluster.forall(_._2.count(_._3) === 1))
    // identical groups collapse to one cluster each, min-id kept on ties
    val a = out.filter(r => Seq(1L, 2L, 3L).contains(r._1))
    assert(a.map(_._2).distinct.length === 1 && a.filter(_._3).map(_._1).toSeq === Seq(1L))
    val b = out.filter(r => Seq(10L, 11L).contains(r._1))
    assert(b.map(_._2).distinct.length === 1 && b.filter(_._3).map(_._1).toSeq === Seq(10L))
    // singletons are their own kept cluster
    assert(out.filter(r => r._1 >= 20L).forall(r => r._2 === r._1 && r._3))
  }

  // ---- BM25 retrieval ------------------------------------------------

  test("bm25 ranks term coverage and rarity sensibly") {
    val docs = (
      Seq((1L, "alpha beta gamma"),          // all three query terms
          (2L, "alpha beta filler filler"),  // two
          (3L, "alpha filler filler filler filler")) ++ // one, longer doc
      (10L to 29L).map(id => (id, "filler common words here"))
    ).toDF("doc_id", "text")
    val got = graft.operators.Search.bm25TopK(
        docs, "doc_id", "text", Seq((1L, "alpha beta gamma")), k = 5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).take(3).toSeq === Seq(1L, 2L, 3L))
    assert(got.length === 3) // only docs matching >=1 term appear
    assert(got(0)._2 > got(1)._2 && got(1)._2 > got(2)._2)
  }

  test("bm25 returns at most k per query and is deterministic") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val qs = Seq((1L, "hash join merge"), (2L, "window sort order"))
    val a = graft.operators.Search.bm25TopK(docs, "doc_id", "text", qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = graft.operators.Search.bm25TopK(docs, "doc_id", "text", qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(a.groupBy(_._1).forall(_._2.size <= 10) && a.nonEmpty)
  }

  // ---- duplicate-substring spans -------------------------------------

  test("duplicateSpanStats flags shared and self-repeated windows") {
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")      // 20 tokens
    val block = (1 to 16).map(i => s"b$i").mkString(" ")       // 16 tokens
    val docs = Seq(
      (1L, shared),                                  // 5 windows, all shared with doc 2
      (2L, shared + " t1 t2 t3 t4"),                 // 9 windows, first 5 shared
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")), // unique
      (4L, block + " " + block)                      // self-repeat: windows 0 and 16 equal
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.duplicateSpanStats(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((5L, 5L)))
    assert(got(2L) === ((9L, 5L)))
    assert(got(3L) === ((15L, 0L)))
    assert(got(4L) === ((17L, 2L))) // within-doc repetition counts too
  }

  test("rho is 1 + leading zero bits, capped at 57") {
    // deterministic cross-check against a JVM model on the same md5 hex
    val xs = (1L to 500L).toSeq
    val hx = Sketches.hashHex(col("x"))
    val got = xs.toDF("x")
      .select(col("x"), Sketches.hllRho(hx).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def model(x: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(2, 16)
      val v = java.lang.Long.parseLong(hex, 16) // 56 bits, fits a long
      if (v == 0) 57L else (java.lang.Long.numberOfLeadingZeros(v) - 8 + 1).toLong
    }
    xs.foreach(x => assert(got(x) === model(x), s"x=$x"))
  }

  test("native md5_bucket_rho ≡ the md5-hex bucket/rho chain, incl. nulls") {
    // the q132 sketch-profile hot path swaps the hex-string chain for
    // graft.plans.Md5BucketRho — the pair must be BIT-identical on
    // arbitrary strings (incl. empty, unicode, long) and null-preserving
    val strs: Seq[String] = Seq(
      "", "a", "0", "hello world", "naïve — ünïcödé ✓",
      "x" * 10000) ++ (1L to 2000L).map(_.toString) ++ Seq(null)
    val hx = Sketches.hashHex(col("s"))
    val rows = strs.toDF("s")
      .select(col("s"),
        Sketches.hllBucket(hx).as("hb"), Sketches.hllRho(hx).as("hr"),
        graft.plans.Md5BucketRho.md5BucketRho(col("s").cast("string")).as("bs"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) {
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3), "null row")
      } else {
        val st = r.getStruct(3)
        assert(st.getLong(0) === r.getLong(1), s"bucket for '${r.getString(0).take(20)}'")
        assert(st.getLong(1) === r.getLong(2), s"rho for '${r.getString(0).take(20)}'")
      }
    }
  }

  test("sketch-mode profile register banks are unchanged by the native pair") {
    // end-to-end: Profile.profile(exact=false) must produce the exact
    // n_distinct longs the hex-chain formulation produced (same
    // registers → same harmonic sum → same rounded estimate)
    import org.apache.spark.sql.types._
    val df = (1L to 3000L).toDF("id")
      .select(col("id"), (col("id") % 7).cast("string").as("s"),
        (col("id") % 97).as("n"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), col("id"))).as("maybe"))
    val prof = graft.operators.Profile.profile(df, exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // hex-chain replay of the same estimate for one column
    def hexEstimate(c: org.apache.spark.sql.Column): Long = {
      val hx = md5(c.cast("string"))
      val est = df.select(Sketches.hllBucket(hx).as("b"), Sketches.hllRho(hx).as("r"))
        .agg(hllRegisters(struct(col("b"), col("r")), Sketches.M).as("regs"))
        .select(round(Sketches.hllEstimate(col("regs"))).cast("long"))
        .collect()(0).getLong(0)
      est
    }
    assert(prof("id") === hexEstimate(col("id")))
    assert(prof("s") === hexEstimate(col("s")))
    assert(prof("n") === hexEstimate(col("n")))
    assert(prof("maybe") === hexEstimate(col("maybe")))
    assert(prof("s") === 7L) // tiny cardinality: the sketch is exact
  }
}
