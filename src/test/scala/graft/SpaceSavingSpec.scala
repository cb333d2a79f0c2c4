package graft

import graft.plans.SpaceSavingTopK
import org.apache.spark.sql.functions._

class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, capacity: Int) =
    df.agg(SpaceSavingTopK.topK($"w", capacity).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.cnt", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact regime (capacity >= distinct): counts equal GROUP BY, err 0, any partitioning") {
    val words = (1 to 2000).map(i => s"w${i % 37}")
    val df = words.toDF("w")
    val want = df.groupBy($"w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 13)) {
      val got = sketch(df.repartition(parts), capacity = 64)
      assert(got.map(e => e._1 -> e._2).toMap == want)
      assert(got.forall(_._3 == 0L))
    }
  }

  test("bounded regime: overestimates only, within N/capacity; heavy items always present") {
    // skewed stream: "hot" appears 5000 times, 2000 singletons
    val words = Seq.fill(5000)("hot") ++ (1 to 2000).map(i => s"rare$i")
    val n = words.length.toLong
    val capacity = 100
    val got = sketch(words.toDF("w").repartition(7), capacity)
    assert(got.length <= capacity)
    val byItem = got.map(e => e._1 -> e).toMap
    // the heavy hitter (freq > N/capacity = 70) must be in the sketch
    assert(byItem.contains("hot"))
    val (_, hotCnt, hotErr) = byItem("hot")
    // bounds: true <= est <= true + N/capacity, and est - err <= true
    assert(hotCnt >= 5000L && hotCnt <= 5000L + n / capacity)
    assert(hotCnt - hotErr <= 5000L)
    // every estimate overestimates by at most its recorded err
    got.foreach { case (item, cnt, err) =>
      val truth = if (item == "hot") 5000L else 1L
      assert(cnt >= truth && cnt - err <= truth, s"$item: cnt=$cnt err=$err")
    }
  }

  test("eval ordering is a total order: (cnt desc, item asc)") {
    val got = sketch(Seq("b", "a", "a", "c", "b").toDF("w"), capacity = 10)
    assert(got.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(got.map(_._2).toSeq == Seq(2L, 2L, 1L))
  }
}
