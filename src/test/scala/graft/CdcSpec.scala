package graft

import graft.ops.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def base(rows: (Int, String)*) = rows.toDF("id", "v")

  private def changes(rows: (Int, Int, String, String)*) =
    rows.toDF("id", "seq", "op", "v")

  private def applied(b: Seq[(Int, String)], c: Seq[(Int, Int, String, String)]) =
    Cdc.applyChangelog(base(b: _*), changes(c: _*),
        pk = Seq("id"), seqCol = "seq", opCol = "op", payloadCols = Seq("v"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

  test("M6: upsert updates present keys and inserts absent ones") {
    assert(applied(
      Seq(1 -> "a", 2 -> "b"),
      Seq((2, 1, "U", "b2"), (3, 2, "U", "c"))) ==
      Seq(1 -> "a", 2 -> "b2", 3 -> "c"))
  }

  test("M6: delete removes the key; delete of an absent key is a no-op") {
    assert(applied(
      Seq(1 -> "a", 2 -> "b"),
      Seq((1, 1, "D", null), (9, 2, "D", null))) ==
      Seq(2 -> "b"))
  }

  test("M6: only the greatest seq per key decides — order of arrival is irrelevant") {
    // U(seq 5) after D(seq 3): the key lives with the late value
    // D(seq 9) after U(seq 4): the key dies despite the earlier upsert
    assert(applied(
      Seq(1 -> "a", 2 -> "b"),
      Seq((1, 3, "D", null), (1, 5, "U", "resurrected"),
        (2, 4, "U", "doomed"), (2, 9, "D", null))) ==
      Seq(1 -> "resurrected"))
  }

  test("M6: applying a changelog twice is idempotent") {
    val b = Seq(1 -> "a", 2 -> "b", 3 -> "c")
    val c = Seq((1, 1, "U", "a2"), (2, 2, "D", null))
    val once = applied(b, c)
    val again = Cdc.applyChangelog(
      once.toDF("id", "v"), changes(c: _*),
      pk = Seq("id"), seqCol = "seq", opCol = "op", payloadCols = Seq("v"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(once == again)
    assert(once == Seq(1 -> "a2", 3 -> "c"))
  }

  test("M6: a legitimately-NULL payload value survives an upsert") {
    assert(applied(
      Seq(1 -> "a"),
      Seq((1, 1, "U", null))) == Seq(1 -> null))
  }
}
