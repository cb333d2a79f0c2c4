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
}
