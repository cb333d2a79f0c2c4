package graft

import graft.ops.Components

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("chains collapse transitively; isolated vertices keep their own id") {
    val vertices = (1L to 8L).toDF("id")
    // components: {1,2,3,4} (chain), {5,6}, {7}, {8}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val out = Components.connectedComponents(vertices, edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("label propagation is orientation-independent") {
    val vertices = (1L to 4L).toDF("id")
    val forward = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val backward = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = Components.connectedComponents(vertices, forward, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Components.connectedComponents(vertices, backward, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
