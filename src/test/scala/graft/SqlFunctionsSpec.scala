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

  test("native ShingleTokens matches the higher-order-function reference") {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val mismatch = docs.select(
        TF.shingles(TF.tokens(col("text")), 3).as("hof"),
        graft.plans.ShingleTokens.shingleTokens(TF.tokens(col("text")), 3).as("native"))
      .filter(col("hof") =!= col("native")).count()
    assert(mismatch === 0)
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
