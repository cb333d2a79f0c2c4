package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (BASELINE.json north star): images/audio/video
  * travel as opaque `binary` columns with a typed metadata struct alongside.
  * The decode path is a REAL image codec (`javax.imageio`, in the JDK):
  * [[synthesizedMedia]] encodes deterministic PNGs whose pixel values are a
  * closed-form function of (x, y, media_id), and [[decode]] reads the
  * actual pixels back — so an oracle that recomputes the closed form
  * verifies a genuine decode happened, end to end.
  *
  * Scale notes:
  *  - blobs dominate row size → repartition by target partition BYTES, not
  *    row count ([[repartitionForBlobs]]), so tasks stay memory-bounded.
  *  - decode runs per-partition with batched iteration (mapPartitions) —
  *    the Scala analog of mapInPandas batches: codec state lives once per
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
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Deterministic grayscale test image for `id`: dimensions
    * `(16 + id%9) × (16 + id%11)`, pixel (x, y) value
    * `(7x + 13y + 31·id) mod 256` — the closed form an oracle can
    * recompute without a codec. Returns REAL PNG bytes (lossless, so the
    * decoded pixels equal the formula exactly). */
  def synthesizePng(id: Long): Array[Byte] = {
    val w = (16 + (id % 9)).toInt
    val h = (16 + (id % 11)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 7 + y * 13 + id * 31) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** One media row per id in `df(idCol)`: real PNG blobs from
    * [[synthesizePng]]. Encoding runs distributed (mapPartitions). */
  def synthesizedMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, synthesizePng(id), "png")
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

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

  /** Batch-shaped REAL decode: `javax.imageio` per partition, rows streamed
    * through it. Emits decoded dimensions, the exact pixel-value sum, and
    * an 8-bucket pixel-intensity histogram (columnar-friendly fixed
    * [[decodedSchema]]). An undecodable non-null blob fails loudly —
    * silent nulls would let a corrupt batch pass as "decoded". */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("media_id"), col("blob"), col("format")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          if (blob == null) Row(r.getLong(0), r.getString(2), 0, 0, 0L,
            Seq.fill(8)(0.0))
          else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(blob))
            require(img != null, s"undecodable blob for media_id ${r.getLong(0)}")
            var sum = 0L
            val hist = new Array[Double](8)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val v = img.getRGB(x, y) & 0xFF // grayscale: any channel
                sum += v
                hist(v / 32) += 1.0
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), r.getString(2), img.getWidth, img.getHeight,
              sum, hist.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
