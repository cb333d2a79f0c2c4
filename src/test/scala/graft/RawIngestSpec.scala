package graft

import graft.ingest.RawIngest
import org.apache.spark.sql.functions._

class RawIngestSpec extends SparkTestBase {

  private class FakeApi(pages: Map[Int, RawIngest.Page], failFirst: Set[Int] = Set.empty)
      extends RawIngest.PageClient {
    private val failed = scala.collection.mutable.Set.empty[Int]
    var calls = 0
    override def fetchPage(n: Int): Option[RawIngest.Page] = {
      calls += 1
      if (failFirst.contains(n) && !failed.contains(n)) {
        failed += n
        throw new RuntimeException(s"transient failure on page $n")
      }
      pages.get(n)
    }
  }

  private val pages = Map[Int, RawIngest.Page](
    1 -> Seq((1L, """{"id":1,"name":"a"}"""), (2L, """{"id":2,"name":"b"}""")),
    2 -> Seq((3L, """{"id":3,"name":"c"}""")))

  test("S1/S2: walks all pages until exhaustion") {
    val df = RawIngest.extractAll(spark, new FakeApi(pages))
    assert(df.count() == 3)
    assert(df.select("source_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("page-level retry recovers from a transient failure") {
    val api = new FakeApi(pages, failFirst = Set(2))
    val df = RawIngest.extractAll(spark, api, maxRetries = 2)
    assert(df.count() == 3)
    assert(api.calls == 4) // pages 1, 2(fail), 2(retry), 3(end)
  }

  test("retries exhausted → the failure propagates (no silent data loss)") {
    val alwaysFails = new RawIngest.PageClient {
      override def fetchPage(n: Int): Option[RawIngest.Page] =
        if (n == 1) Some(pages(1)) else throw new RuntimeException("down")
    }
    intercept[RuntimeException] {
      RawIngest.extractAll(spark, alwaysFails, maxRetries = 1)
    }
  }

  test("S3: re-extract upserts by source_id, newest payload wins") {
    val first = RawIngest.extractAll(spark, new FakeApi(pages))
      .withColumn("loaded_at", lit("2024-01-01 00:00:00").cast("timestamp"))
    val updated = Map[Int, RawIngest.Page](
      1 -> Seq((2L, """{"id":2,"name":"B-UPDATED"}"""), (4L, """{"id":4,"name":"d"}""")))
    val second = RawIngest.extractAll(spark, new FakeApi(updated))
      .withColumn("loaded_at", lit("2024-02-01 00:00:00").cast("timestamp"))
    val merged = RawIngest.upsertIntoRaw(first, second)
    assert(merged.count() == 4)
    assert(merged.filter(col("source_id") === 2).head().getString(1).contains("B-UPDATED"))
    assert(merged.filter(col("source_id") === 1).head().getString(1).contains("\"a\""))
  }

  test("a client whose last page is Some(empty) terminates (no infinite paging)") {
    // the common REST shape: past-the-end pages return an empty results
    // array, never None
    val client = new RawIngest.PageClient {
      def fetchPage(n: Int): Option[RawIngest.Page] =
        if (n <= 2) Some(Seq((n.toLong, s"""{"id":$n}"""))) else Some(Seq.empty)
    }
    assert(RawIngest.extractAll(spark, client).count() == 2)
  }

  test("within one extract, the LATER page wins a duplicate source_id (pagination drift)") {
    // same id on pages 1 and 3 (a row shifted pages mid-walk): both rows
    // share the extract's loaded_at, so recency must come from the page
    // ordinal — a payload-string tie-break would pick '...stale...'
    // lexicographically
    val client = new RawIngest.PageClient {
      def fetchPage(n: Int): Option[RawIngest.Page] = n match {
        case 1 => Some(Seq((7L, """{"v":"zzz-stale"}""")))
        case 2 => Some(Seq((8L, """{"v":"other"}""")))
        case 3 => Some(Seq((7L, """{"v":"aaa-fresh"}""")))
        case _ => None
      }
    }
    val extract = RawIngest.extractAll(spark, client)
    val merged = RawIngest.upsertIntoRaw(extract.limit(0), extract)
    assert(merged.filter(col("source_id") === 7).head().getString(1).contains("aaa-fresh"))
  }
}
