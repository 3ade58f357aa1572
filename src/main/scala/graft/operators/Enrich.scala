package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded external enrichment — the reference's title-details fetch
  * (`enrichment.py:69-80`: call an external API per item, retry on
  * failure, continue on exhaustion) as a library operator with the
  * shape that survives a large cluster:
  *
  *  - **Distinct-first**: the service is called once per DISTINCT
  *    key, never per row — the corpus joins the fetched table back,
  *    so 10^11 rows over 10^5 keys cost 10^5 calls.
  *  - **Bounded concurrency**: calls run per-partition sequentially,
  *    so cluster-wide in-flight requests == partitions of the key
  *    frame. `parallelism` sizes that explicitly; the aggregate
  *    request rate is ≈ parallelism / mean-latency, which is the
  *    knob a rate-limited upstream actually cares about.
  *  - **Retry with exponential backoff**: maxRetries attempts after
  *    the first, sleeping backoffMs·2^attempt between tries (no
  *    jitter — deterministic for tests; add jitter in the service if
  *    a thundering herd is a real risk).
  *  - **Fail-open by default**: a key that exhausts its budget
  *    enriches as null (the reference logs and continues); set
  *    failOpen=false to fail the job instead.
  *
  * The service receives (key, attempt) so implementations can be
  * deterministic under test; production clients ignore `attempt`. */
object Enrich {

  trait ExternalService extends Serializable {
    /** Return Some(value) on success, None on a retryable failure. */
    def fetch(key: String, attempt: Int): Option[String]
  }

  /** Adds `outCol` — the service value for `keyCol` (compared as
    * string) — to every row. Null keys enrich as null without a call.
    *
    * Laziness caveat: the returned plan calls the service when an
    * ACTION runs, once per distinct key PER ACTION — run one action,
    * or `.persist()` the result yourself before running several (the
    * operator does not cache internally: a lazily returned plan can
    * never unpersist, and repeated invocations would pin copies for
    * the session — see the ngramJaccardPairs no-cache note). Spark
    * task retries likewise re-call the service for that partition's
    * keys; the service must tolerate at-least-once fetches (any
    * idempotent GET does). */
  def externalLookup(df: DataFrame, keyCol: String, outCol: String,
                     service: ExternalService, maxRetries: Int = 3,
                     backoffMs: Long = 100, failOpen: Boolean = true,
                     parallelism: Int = 0): DataFrame = {
    require(maxRetries >= 0 && backoffMs >= 0)
    val spark = df.sparkSession
    import spark.implicits._
    val keys0 = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val keys = if (parallelism > 0) keys0.repartition(parallelism) else keys0
    val fetched = keys.as[String].mapPartitions { it =>
      it.map { k =>
        var attempt = 0
        var out: Option[String] = None
        var done = false
        while (!done) {
          out = service.fetch(k, attempt)
          if (out.isDefined) done = true
          else {
            attempt += 1
            if (attempt > maxRetries) done = true
            else if (backoffMs > 0) Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        if (out.isEmpty && !failOpen)
          throw new IllegalStateException(
            s"external lookup failed for key '$k' after ${maxRetries + 1} attempts")
        (k, out.orNull)
      }
    }.toDF("__k", outCol)
    df.withColumn("__k", col(keyCol).cast("string"))
      .join(fetched, Seq("__k"), "left")
      .drop("__k")
  }
}
