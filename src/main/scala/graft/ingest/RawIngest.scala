package graft.ingest

import graft.ops.MergeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-layer ingestion: the reference's paginated REST extract re-shaped
  * for Spark (SURVEY.md §2.1 S1/S2).
  *
  * The reference walks `info.next` page links, retrying a failed page after
  * a delay, and upserts each page's `results` array into the raw table
  * (extract_api_operator.py:29-66 recursive; raw_character.py:15-64
  * iterative with page-number parsing + retry). Pagination is inherently
  * sequential driver-side work — the DISTRIBUTED part is everything after:
  * pages land as (source_id, payload JSON) rows, become one DataFrame, and
  * merge into the raw layer with last-writer-wins semantics (S3).
  *
  * [[PageClient]] abstracts the transport: a real deployment plugs an HTTP
  * client in; tests (and this zero-egress container) use an in-memory one.
  * Page payloads stay verbatim JSON — the raw layer is schema-on-read
  * ("весь JSON как есть", configure.py:60).
  */
object RawIngest {

  /** One page of results, each entry (source_id, full JSON payload). */
  type Page = Seq[(Long, String)]

  trait PageClient {
    /** Fetch page `n` (1-based). None = no such page (end of pagination).
      * Throwing = transient failure, will be retried. */
    def fetchPage(n: Int): Option[Page]
  }

  /** S1/S2: walk all pages with per-page retry, then parallelize into a
    * raw-layer DataFrame. `maxRetries` mirrors the reference's
    * retry-after-sleep loop (raw_character.py:35-38).
    *
    * `loaded_at` is a DRIVER-SIDE literal, strictly increasing across
    * extractAll calls in this JVM: `current_timestamp()` evaluates to one
    * constant per QUERY execution, so two lazily-evaluated extracts
    * merged by [[upsertIntoRaw]] would carry identical stamps and the
    * last-writer-wins tie-break would fall through to payload ordering —
    * the stale record could win. The literal also makes the stamp stable
    * across re-executions of the un-persisted plan. */
  def extractAll(
      spark: SparkSession,
      client: PageClient,
      maxRetries: Int = 2,
      retryDelayMs: Long = 0L): DataFrame = {
    // stop on None OR an empty page: the common REST shape returns an
    // empty results array past the end rather than a 404, and a
    // takeWhile(isDefined) alone would page forever against it. The page
    // ordinal rides along as the within-extract recency tie-break (see
    // upsertIntoRaw).
    val rows = Iterator.from(1)
      .map(n => (n, fetchWithRetry(client, n, maxRetries, retryDelayMs)))
      .takeWhile(_._2.exists(_.nonEmpty))
      .flatMap { case (n, page) => page.get.map { case (id, p) => (id, p, n) } }
      .toSeq
    import spark.implicits._
    rows.toDF("source_id", "payload", "page")
      .withColumn("loaded_at",
        lit(new java.sql.Timestamp(nextStampMillis())).cast("timestamp"))
  }

  private val lastStamp = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextStampMillis(): Long =
    lastStamp.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  private def fetchWithRetry(client: PageClient, n: Int,
      retriesLeft: Int, delayMs: Long): Option[Page] =
    try client.fetchPage(n)
    catch {
      case e: Exception if retriesLeft > 0 =>
        if (delayMs > 0) Thread.sleep(delayMs)
        fetchWithRetry(client, n, retriesLeft - 1, delayMs)
    }

  /** S3: merge an extract into the raw table — last-writer-wins by
    * source_id (ON CONFLICT DO UPDATE, extract_api_operator.py:36-43).
    * Recency order: loaded_at (across extract calls), then the page
    * ordinal (WITHIN one extract — pagination drift during a walk can
    * surface the same source_id on two pages, and the later page is the
    * fresher read; a payload-string tie-break would pick
    * lexicographically, i.e. arbitrarily). Inputs without a `page`
    * column (the stored raw table) rank as page 0. */
  def upsertIntoRaw(raw: DataFrame, extract: DataFrame): DataFrame = {
    def withPage(df: DataFrame) =
      if (df.columns.contains("page")) df
      else df.withColumn("page", lit(0))
    MergeOps.latestByKey(
      withPage(raw).unionByName(withPage(extract)),
      Seq("source_id"),
      Seq(col("loaded_at"), col("page"), col("payload")))
      .drop("page")
  }
}
