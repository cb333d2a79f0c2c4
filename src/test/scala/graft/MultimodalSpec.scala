package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  test("media table wraps documents into binary blobs with typed metadata") {
    val media = Multimodal.asMediaTable(
      Tables.documents(spark, Sf001), "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "blob", "format"))
    assert(media.schema("blob").dataType.typeName == "binary")
    assert(media.count() == 500)
  }

  test("decode is deterministic, batch-shaped, and byte-derived") {
    val media = Multimodal.asMediaTable(
      Tables.documents(spark, Sf001), "doc_id", "text")
    val out = Multimodal.decode(Multimodal.repartitionForBlobs(media, 64 << 10))
    assert(out.count() == 500)
    val r = out.filter(col("media_id") === 0).head()
    // byte_len equals source text length (ascii corpus)
    val n = Tables.documents(spark, Sf001).filter(col("doc_id") === 0)
      .select(length(col("text"))).head().getInt(0)
    assert(r.getAs[Int]("byte_len") == n)
    // histogram feature sums to byte count
    assert(r.getAs[Seq[Double]]("feature").sum == n.toDouble)
    // same input → same output (determinism across runs/partitionings)
    val again = Multimodal.decode(media).filter(col("media_id") === 0).head()
    assert(again == r)
  }

  test("resize keeps every factor-th byte; sampleFrames covers the blob without overlap") {
    val media = Multimodal.asMediaTable(
      Tables.documents(spark, Sf001).limit(50), "doc_id", "text")
    val small = Multimodal.resize(media, factor = 4)
      .select(col("media_id"), length(col("blob")).as("small_len"))
    val both = media.select(col("media_id"), length(col("blob")).as("orig_len"))
      .join(small, "media_id").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (orig, sm) = (r.getInt(1), r.getInt(2))
      assert(sm == (orig + 3) / 4, s"media ${r.getLong(0)}: $orig -> $sm")
    }
    // everyNth=1: frames tile the blob exactly — total frame bytes = blob bytes
    val frames = Multimodal.sampleFrames(media, frameBytes = 128, everyNth = 1)
      .groupBy(col("media_id")).agg(sum(col("frame_len")).as("covered"))
    val uncovered = media.select(col("media_id"), length(col("blob")).cast("long").as("n"))
      .join(frames, "media_id")
      .filter(col("covered") =!= col("n")).count()
    assert(uncovered == 0)
  }
}
