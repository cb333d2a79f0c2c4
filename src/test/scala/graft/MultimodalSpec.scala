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

  test("decode reads real PNG pixels back (encode→decode round trip)") {
    val docs = Tables.documents(spark, Sf001).limit(50)
    val media = Multimodal.synthesizedMedia(docs, "doc_id")
    // the blobs are REAL compressed PNGs, not a stand-in: magic header
    val blob0 = media.filter(col("media_id") === 0).head().getAs[Array[Byte]]("blob")
    assert(blob0.take(8).toSeq ==
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))

    val out = Multimodal.decode(Multimodal.repartitionForBlobs(media, 64 << 10))
    assert(out.count() == 50)
    val r = out.filter(col("media_id") === 5).head()
    // decoded dimensions and exact pixel sum match the closed form the
    // encoder painted — only a genuine decode can reproduce them
    val (w, h) = (16 + 5 % 9, 16 + 5 % 11)
    assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
    val want = (for (y <- 0 until h; x <- 0 until w)
      yield (x * 7 + y * 13 + 5 * 31) % 256).sum.toLong
    assert(r.getAs[Long]("pix_sum") == want)
    // histogram covers every pixel exactly once
    assert(r.getAs[Seq[Double]]("feature").sum == (w * h).toDouble)
    // same input → same output (determinism across runs/partitionings)
    val again = Multimodal.decode(media).filter(col("media_id") === 5).head()
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
