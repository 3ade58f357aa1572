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
}
