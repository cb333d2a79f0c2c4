package graft

import java.nio.file.Files

import graft.ops.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue: known Morton codes for 2-D interleave") {
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (5L, 2L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of x → position 2i, bit i of y → position 2i+1:
    // z(5,2) = x bits {0,2}→{0,4} + y bit {1}→{3} = 1+16+8 = 25
    assert(rows == Seq(1L, 2L, 15L, 6L, 25L))
  }

  test("zValue: 3-column interleave places each bit at i*k+j") {
    val z = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq($"a", $"b", $"c"), bits = 1))
      .head().getLong(0)
    assert(z == 7L)
  }

  test("writeZOrdered: every file is a small 2-D tile (min/max prunes on both dims)") {
    val dir = Files.createTempDirectory("zorder").resolve("grid")
    // a full 64×64 grid; 16 z-ordered files ≈ 256 Morton codes each =
    // 16×16 tiles (range boundaries are sampled, so allow 2 tiles' span)
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    ZOrder.writeZOrdered(grid, dir, Seq(col("x"), col("y")), bits = 6, files = 16)

    val files = Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    assert(files.length == 16, s"expected 16 files, got ${files.length}")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    assert(spans.forall { case (sx, sy) => sx <= 33 && sy <= 33 },
      s"a z-ordered file spans too much of the key space: ${spans.mkString(",")}")
    // a single-column sort would leave the OTHER dimension unpruned
    // (span 63 everywhere); z-order must beat that on both dimensions
    val (mx, my) = (spans.map(_._1).max, spans.map(_._2).max)
    assert(mx < 63 && my < 63, s"no pruning power: maxSpanX=$mx maxSpanY=$my")
  }
}
