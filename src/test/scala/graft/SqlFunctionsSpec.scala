package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftFunctions

/** The native expressions exposed as SQL functions. */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash_tokens and shingle_tokens are callable from SQL") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT minhash_tokens(split('a b c d e', ' '), 3, 8) AS sig,
                shingle_tokens(split('a b c d e', ' '), 3) AS sh""").head
    assert(row.getSeq[Long](0).length === 8)
    assert(row.getSeq[String](1) === Seq("a b c", "b c d", "c d e"))
  }

  test("non-literal k/numPerms arguments fail with a clear analysis-time error") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("a b c d", 3)).toDF("t", "n").createOrReplaceTempView("fold_v")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_tokens(split(t, ' '), n) FROM fold_v").collect()
    }
    assert(e.getMessage.contains("integer literals"), e.getMessage)
  }

  test("native ShingleTokens matches the higher-order-function reference") {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val mismatch = docs.select(
        TF.shingles(TF.tokens(col("text")), 3).as("hof"),
        graft.plans.ShingleTokens.shingleTokens(TF.tokens(col("text")), 3).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(mismatch === 0)
  }

  test("oracle SQL texts are ANSI enough to run on Spark SQL itself") {
    graft.sources.Tables.all.foreach {
      case "events" =>
        graft.sources.Tables.events(spark, TestSpark.sf).createOrReplaceTempView("events")
      case t =>
        graft.sources.Tables.load(spark, TestSpark.sf, t).createOrReplaceTempView(t)
    }
    // queries whose oracle SQL is pure ANSI (no DuckDB-only functions)
    Seq("q01_pricing_summary", "q03_broadcast_join", "q04_semi_join",
        "q07_distinct_union", "q16_rollup", "q39_distinct_users",
        "q49_date_battery").foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, TestSpark.sf)
      assert(viaSql.exceptAll(viaDf).count() === 0, s"$name sql-vs-df")
      assert(viaDf.exceptAll(viaSql).count() === 0, s"$name df-vs-sql")
    }
  }

  test("VecDot rejects un-cast float arrays at analysis time, not runtime") {
    import org.apache.spark.sql.AnalysisException
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf).limit(20)
    // raw array<float> input is now a clear DATATYPE_MISMATCH analysis
    // error (was: ClassCastException deep inside task execution)
    val e = intercept[AnalysisException] {
      emb.select(graft.plans.VecDot.vecDot(col("embedding"), col("embedding")).as("d")).collect()
    }
    assert(e.getMessage.contains("ARRAY<DOUBLE>"), e.getMessage)
    // and the documented path — asDouble at projection time — works
    import graft.functions.{VectorFunctions => VF}
    val viaNative = emb.select(graft.plans.VecDot.vecDot(
      VF.asDouble(col("embedding")), VF.asDouble(col("embedding"))).as("d"))
    val viaHof = emb.select(VF.dot(col("embedding"), col("embedding")).as("d"))
    assert(viaNative.exceptAll(viaHof).count() === 0)
  }

  test("VecDot rejects length-mismatched arrays loudly") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.plans.VecDot.vecDot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("equal length") ||
      e.getCause != null && e.getCause.getMessage.contains("equal length"),
      e.toString)
  }

  test("SQL minhash matches the Column API") {
    GraftFunctions.register(spark)
    graft.sources.Tables.documents(spark, TestSpark.sf)
      .limit(5).createOrReplaceTempView("docs5")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_tokens(split(text, ' '), 3, 16) AS sig FROM docs5")
    val viaApi = spark.table("docs5").select(col("doc_id"),
      graft.plans.MinHashTokens.minhashTokens(split(col("text"), " "), 3, 16).as("sig"))
    assert(viaSql.except(viaApi).count() === 0)
    assert(viaApi.except(viaSql).count() === 0)
  }
}
