package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north star): images/audio/video
  * travel as opaque `binary` columns with a typed metadata struct alongside.
  * The Spark-side machinery — schema, partition sizing, batch-shaped decode
  * — is real; the codec itself is a clearly-marked DETERMINISTIC STUB
  * because no image/audio libraries exist in this container. Swapping
  * [[decodeStub]] for a JNI/Java codec changes no plumbing.
  *
  * Scale notes:
  *  - blobs dominate row size → repartition by target partition BYTES, not
  *    row count ([[repartitionForBlobs]]), so tasks stay memory-bounded.
  *  - decode runs per-partition with batched iteration (mapPartitions) —
  *    the Scala analog of mapInPandas batches: codec init happens once per
  *    partition, not once per row.
  */
object Multimodal {

  /** media payload schema: (media_id, blob, meta{format, byte_len}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Wrap any table into media rows: text bytes stand in for image bytes. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("blob"),
      when(col(idCol) % 3 === 0, "jpeg").when(col(idCol) % 3 === 1, "png")
        .otherwise("webp").as("format"))

  /** Size partitions by accumulated blob bytes so each task holds at most
    * ~`targetBytes` of payload — row-count partitioning would let a few
    * large blobs blow task memory at scale. */
  def repartitionForBlobs(media: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    // sum() is NULL on an empty table / all-null blobs — treat as 0 bytes
    val row = media.agg(sum(length(col("blob")))).first()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    media.repartition(parts, col("media_id"))
  }

  // ===== STUB ============================================================
  // Deterministic fake "decode": derives width/height/feature from the blob
  // bytes alone. A real deployment replaces ONLY this function with an
  // actual codec (e.g. TwelveMonkeys/ImageIO via mapPartitions, or a Pandas
  // UDF in PySpark). Signature and batching stay identical.
  // =======================================================================
  private def decodeStub(blob: Array[Byte]): (Int, Int, Array[Double]) = {
    val n = if (blob == null) 0 else blob.length
    val w = 64 + (n % 512)
    val h = 64 + ((n / 7) % 512)
    // 8-bucket byte histogram as the stand-in feature vector
    val hist = new Array[Double](8)
    if (blob != null) blob.foreach(b => hist((b & 0xFF) / 32) += 1.0)
    (w, h, hist)
  }

  /** Frame sampling — the video path's explode shape: every `everyNth`
    * frame of the blob becomes its own row (media_id, frame_idx,
    * frame_hash, frame_len). Frames here are fixed-`frameBytes` windows —
    * the deterministic stand-in for container-index boundaries, which on
    * real video come from a per-partition codec exactly like [[decode]];
    * the explode/plumbing (row-per-frame fan-out, downstream dedup or
    * featurization per frame) is the real Spark-side work and is
    * identical either way. Map-side only; output rows ≈ bytes/(frameBytes
    * ·everyNth). */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, s"need positive sizes (got $frameBytes, $everyNth)")
    media
      .select(col("media_id"), col("blob"),
        explode(when(length(col("blob")) > 0,
          // Column./ is DOUBLE division — cast truncates back to the
          // last frame index (non-negative, so trunc ≡ floor)
          sequence(lit(0),
            ((length(col("blob")) - 1) / frameBytes).cast("int"), lit(everyNth)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("blob").substr(
          col("frame_idx") * frameBytes + 1, lit(frameBytes))).as("frame_hash"),
        length(col("blob").substr(
          col("frame_idx") * frameBytes + 1, lit(frameBytes))).cast("long").as("frame_len"))
  }

  /** Resize — deterministic stub: keep every `factor`-th byte and scale
    * the fake dimensions accordingly (a real deployment swaps ONLY the
    * per-partition body for a codec resample, like [[decode]]). */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor > 0, s"factor must be positive (got $factor)")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("blob", BinaryType, nullable = true),
      StructField("format", StringType, nullable = true)))
    val rdd = media.select(col("media_id"), col("blob"), col("format")).rdd
      .mapPartitions { it =>
        // codec init once per partition, as in decode()
        it.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val small = if (blob == null) null
            else blob.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
          Row(r.getLong(0), small, r.getString(2))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Batch-shaped decode: one codec "session" per partition, rows streamed
    * through it. Output is columnar-friendly (fixed decodedSchema). */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("blob"), col("format")).rdd
      .mapPartitions { it =>
        // codec init would happen HERE, once per partition
        it.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val (w, h, feat) = decodeStub(blob)
          Row(r.getLong(0), r.getString(2),
            if (blob == null) 0 else blob.length, w, h, feat.toSeq)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
