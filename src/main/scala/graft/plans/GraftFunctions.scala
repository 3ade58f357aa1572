package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths:
  *  - `GraftFunctions.register(spark)` on a live session (temp functions)
  *  - `.withExtensions(new GraftExtensions)` at session build time —
  *    the SparkSessionExtensions route a cluster deployment would use.
  *
  * SQL: `SELECT minhash_tokens(split(text, ' '), 3, 64)`,
  *      `SELECT shingle_tokens(split(text, ' '), 3)`.
  */
object GraftFunctions {

  private def asInt(e: Expression): Int = {
    // Thrown from the function builder, so it surfaces at analysis time.
    if (!e.foldable)
      throw new IllegalArgumentException(
        "graft function k/numPerms arguments must be integer literals")
    e.eval().asInstanceOf[Number].intValue
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_tokens" -> (es => MinHashTokens(es(0), asInt(es(1)), asInt(es(2)))),
    "shingle_tokens" -> (es => ShingleTokens(es(0), asInt(es(1)))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans." + name, name), b))
    }
}
