package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement probe for optimization round 22 — not part of the
  * engine; deleted before round end. */
object ProbeR22 {
  def main(args: Array[String]): Unit = {
    sys.props("graft.prof") = "1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("probe_t")
    val t = d.resolve("tbl")
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    println("cust rows=" + cust.count + " inputPartitions=" + cust.rdd.getNumPartitions)
    def countFiles(p: java.nio.file.Path): Int = {
      if (!java.nio.file.Files.exists(p)) return -1
      val s = java.nio.file.Files.walk(p)
      try s.filter(f => f.toString.endsWith(".parquet")).count.toInt finally s.close()
    }
    // warm bootstrap on a throwaway table first (codegen/JIT), then measure
    val warm = d.resolve("warm")
    graft.ops.MergeOps.prunedConditionalUpsert(warm, cust, Seq("c_custkey"),
      Seq("c_name", "c_nationkey", "c_acctbal"), current_timestamp(),
      nParts = 64, keepVersions = 3)
    graft.ops.Prof.reset()
    var t0 = System.nanoTime
    graft.ops.MergeOps.prunedConditionalUpsert(t, cust, Seq("c_custkey"),
      Seq("c_name", "c_nationkey", "c_acctbal"), current_timestamp(),
      nParts = 64, keepVersions = 3)
    println(f"bootstrap ${(System.nanoTime - t0) / 1e9}%.2f s, files v0: ${countFiles(t.resolve("v0"))}")
    println(graft.ops.Prof.report())
    val inc = cust.filter($"c_custkey" % 100 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1)
    graft.ops.Prof.reset()
    t0 = System.nanoTime
    graft.ops.MergeOps.prunedConditionalUpsert(t, inc, Seq("c_custkey"),
      Seq("c_name", "c_nationkey", "c_acctbal"), current_timestamp(),
      nParts = 64, keepVersions = 3)
    println(f"inc upsert ${(System.nanoTime - t0) / 1e9}%.2f s, files v1 (own, excl carried): ${countFiles(t.resolve("v1"))}")
    println(graft.ops.Prof.report())
    // second identical redelivery: zero-change commit
    t0 = System.nanoTime
    graft.ops.MergeOps.prunedConditionalUpsert(t, inc, Seq("c_custkey"),
      Seq("c_name", "c_nationkey", "c_acctbal"), current_timestamp(),
      nParts = 64, keepVersions = 3)
    println(f"redelivery ${(System.nanoTime - t0) / 1e9}%.2f s, files v2: ${countFiles(t.resolve("v2"))}")
    // timed pinned read of the whole table
    t0 = System.nanoTime
    val n = graft.ops.Storage.readPartitionedVersion(spark, t).count()
    println(f"full pruned read: ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
    // plain commitVersion of a tiny view-state-like frame, 3x
    val view = d.resolve("view")
    val state = cust.groupBy("c_nationkey").agg(count(lit(1)).as("count_rows"),
      sum($"c_acctbal".cast("decimal(38,6)")).as("s"))
    (1 to 3).foreach { i =>
      t0 = System.nanoTime
      graft.ops.Storage.commitVersion(state, view, keepVersions = 1, fileStats = false)
      println(f"commitVersion #$i ${(System.nanoTime - t0) / 1e9}%.2f s, files: ${countFiles(view.resolve(s"v${i - 1}"))}")
    }
    // raw write of the same frame for comparison (no commit machinery)
    (1 to 2).foreach { i =>
      val raw = d.resolve(s"raw$i")
      t0 = System.nanoTime
      state.write.mode("overwrite").parquet(raw.toString)
      println(f"raw write #$i ${(System.nanoTime - t0) / 1e9}%.2f s, files: ${countFiles(raw)}")
    }
    // raw partitionBy write of the bucketed bootstrap shape
    val rawP = d.resolve("rawP")
    val bucketed = cust.withColumn("pbucket",
      pmod(xxhash64($"c_custkey"), lit(64)).cast("int"))
    t0 = System.nanoTime
    bucketed.write.partitionBy("pbucket").mode("overwrite").parquet(rawP.toString)
    println(f"raw partitionBy write ${(System.nanoTime - t0) / 1e9}%.2f s, files: ${countFiles(rawP)}")
    graft.ops.Storage.deleteRecursively(d)
    spark.stop()
  }
}
