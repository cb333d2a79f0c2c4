package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's `entry` check: runs the flagship
  * pipeline on sf0.001 and prints the result. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[entry] rows=${rows.length}")
    rows.take(30).foreach(r => println(s"[entry] $r"))
    spark.stop()
  }
}
