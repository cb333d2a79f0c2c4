package graft

import graft.ops.Extract
import org.apache.spark.sql.functions._

class ExtractSpec extends SparkTestBase {
  import spark.implicits._

  test("P5: nullifEmpty — empty and whitespace-only become NULL, values are trimmed") {
    val rows = Seq("", "  ", " x ", "y", null)
      .toDF("s").select(Extract.nullifEmpty($"s").as("r")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq(null, null, "x", "y", null))
  }

  test("P6/P7: guardedDate parses 'Month D, YYYY' and nulls malformed text") {
    val rows = Seq("December 2, 2013", "January 31, 1999", "not a date", "Dec 2, 2013", "")
      .toDF("s").select(Extract.guardedDate($"s").cast("string").as("r"))
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("2013-12-02", "1999-01-31", null, null, null))
  }

  test("P1/P2: json scalar and nested-path extraction") {
    val df = Seq("""{"id": 7, "origin": {"name": "Earth", "url": ""}}""").toDF("payload")
    val r = df.select(
      Extract.jsonInt($"payload", "id").as("id"),
      Extract.jsonPath($"payload", "origin", "name").as("o"),
      Extract.nullifEmpty(Extract.jsonPath($"payload", "origin", "url")).as("u")).head()
    assert(r.getInt(0) == 7 && r.getString(1) == "Earth" && r.isNullAt(2))
  }

  test("A1: explode over JSON string array emits 0 rows for empty arrays (Postgres semantics)") {
    val df = Seq(
      (1, """{"ep": ["u1", "u2"]}"""),
      (2, """{"ep": []}"""),
      (3, """{"ep": null}""")).toDF("id", "payload")
    val out = df.select($"id", explode(Extract.jsonArrayText($"payload", "ep")).as("u"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "u1"), (1, "u2")))
  }

  test("F2: anyChanged is null-safe (NULL vs NULL is NOT a change)") {
    val df = Seq(
      (Some(1), Some(1), false),
      (Some(1), Some(2), true),
      (Option.empty[Int], Option.empty[Int], false),
      (Some(1), Option.empty[Int], true),
      (Option.empty[Int], Some(1), true)).toDF("a", "b", "expect")
    val bad = df.filter(Extract.anyChanged(Seq(($"a", $"b"))) =!= $"expect").count()
    assert(bad == 0)
  }

  test("Quality.malformedJson: true only for present-but-unparseable payloads") {
    val df = Seq(
      ("""{"id":1,"name":"x"}""", false), // valid
      ("""{oops""", true),               // malformed
      ("""[1,2]""", true),               // not an object of the schema
      (null.asInstanceOf[String], false) // absent ≠ malformed
    ).toDF("payload", "expect")
    val bad = df.filter(
      graft.ops.Quality.malformedJson($"payload", "id BIGINT, name STRING")
        =!= $"expect").count()
    assert(bad == 0)
  }
}
