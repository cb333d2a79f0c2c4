package graft

import graft.ops.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def changeLog(rows: (Int, String, String)*): DataFrame =
    rows.toDF("bk", "ts_s", "attr")
      .select($"bk", $"ts_s".cast("timestamp").as("ts"), $"attr")

  test("M5: withScalableSk assigns the identical (row -> sk) mapping as withGlobalSk, with no global sort") {
    // orders at sf0.001 as a stand-in dimension: (o_orderkey) is a total
    // order; valid_from is synthesized so withGlobalSk's (bk, valid_from)
    // equals plain bk order
    val dim = Tables.orders(spark, Sf001)
      .select(col("o_orderkey").as("bk"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("valid_from"))
    val global = Scd2.withGlobalSk(dim, "bk")
      .select(col("bk"), col("sk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scalable = Scd2.withScalableSk(dim, Seq("bk", "valid_from"), partitions = 7)
    val got = scalable.select(col("bk"), col("sk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == global)
    // dense 1..n
    assert(got.values.toSeq.sorted == (1L to got.size.toLong))
    // scale shape: no single-partition exchange anywhere in the plan
    val plan = scalable.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    // determinism under a different input partitioning
    val again = Scd2.withScalableSk(dim.repartition(13), Seq("bk", "valid_from"), partitions = 7)
      .select(col("bk"), col("sk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == global)
  }

  test("M3: fromChangeLog collapses consecutive duplicates and chains intervals") {
    val log = changeLog(
      (1, "2024-01-01 00:00:00", "a"),
      (1, "2024-01-02 00:00:00", "a"), // unchanged → collapsed
      (1, "2024-01-03 00:00:00", "b"), // changed → version 2
      (2, "2024-01-01 00:00:00", "x"))
    val out = Scd2.fromChangeLog(log, "bk", "ts", Seq("attr"))
      .select($"bk", $"attr", $"valid_from".cast("string"), $"valid_to".cast("string"),
        $"is_current", $"version")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4), r.getInt(5))).sortBy(t => (t._1, t._6))
    assert(out.toSeq == Seq(
      (1, "a", "2024-01-01 00:00:00", "2024-01-03 00:00:00", false, 1),
      (1, "b", "2024-01-03 00:00:00", Scd2.InfinityTs, true, 2),
      (2, "x", "2024-01-01 00:00:00", Scd2.InfinityTs, true, 1)))
  }

  test("SCD2 invariants hold for random change sequences (scalacheck)") {
    val genLog = Gen.listOfN(40, for {
      bk <- Gen.choose(1, 5)
      day <- Gen.choose(1, 28)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (bk, f"2024-01-$day%02d 00:00:00", attr))

    (0 until 8).foreach { i =>
      val rowsRaw = genLog.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil)
      // one observation per (bk, ts): dedup like a real change log
      val rows = rowsRaw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      if (rows.nonEmpty) {
        val dim = Scd2.fromChangeLog(changeLog(rows: _*), "bk", "ts", Seq("attr"))
          .select($"bk", $"attr", $"valid_from", $"valid_to", $"is_current", $"version")
          .collect()
        val byKey = dim.groupBy(_.getInt(0))
        assert(byKey.values.forall(_.count(_.getBoolean(4)) == 1),
          s"seed ${42 + i}: exactly one is_current per key")
        byKey.values.foreach { vs =>
          val s = vs.sortBy(_.getInt(5)).toSeq
          assert(s.forall(r => r.getTimestamp(2).before(r.getTimestamp(3))),
            s"seed ${42 + i}: valid_from < valid_to")
          s.sliding(2).foreach { w =>
            if (w.length == 2) {
              assert(w(0).getTimestamp(3) == w(1).getTimestamp(2),
                s"seed ${42 + i}: contiguous intervals")
              assert(w(0).getString(1) != w(1).getString(1),
                s"seed ${42 + i}: no consecutive dup attrs")
            }
          }
        }
      }
    }
  }

  test("SCD2 invariants hold across random multi-batch closeAndInsert sequences (scalacheck)") {
    val genBatch = Gen.listOfN(6, for {
      bk <- Gen.choose(1, 4)
      attr <- Gen.oneOf("a", "b", "c", "d")
    } yield (bk, attr))

    (0 until 5).foreach { i =>
      var dim = Scd2.withGlobalSk(
        Scd2.fromChangeLog(changeLog((1, "2024-01-01 00:00:00", "a")), "bk", "ts", Seq("attr")),
        "bk", "sk")
        .select($"bk", $"attr", $"sk", $"valid_from", $"valid_to", $"is_current")
      var lastState = Map(1 -> "a")
      (0 until 4).foreach { batchNo =>
        val raw = genBatch.apply(Gen.Parameters.default, Seed(1000L * i + batchNo))
          .getOrElse(Nil)
        val batch = raw.groupBy(_._1).map(_._2.head).toSeq // one row per bk
        if (batch.nonEmpty) {
          val runTs = lit(f"2024-02-${batchNo + 1}%02d 00:00:00").cast("timestamp")
          dim = Scd2.closeAndInsert(dim, batch.toDF("bk", "attr"), "bk", Seq("attr"), runTs, "sk")
            .localCheckpoint() // keep the plan from growing across batches
          lastState = lastState ++ batch.toMap
          val rows = dim.collect()
          val byKey = rows.groupBy(_.getInt(0))
          // exactly one current version per key, carrying the latest value
          byKey.foreach { case (bk, vs) =>
            val cur = vs.filter(_.getBoolean(5))
            assert(cur.length == 1, s"seed $i/$batchNo: one is_current for bk=$bk")
            assert(cur.head.getString(1) == lastState(bk),
              s"seed $i/$batchNo: current attr is the latest upserted value")
          }
          // SKs unique; every closed version has valid_from < valid_to
          val sks = rows.map(_.getLong(2))
          assert(sks.distinct.length == sks.length, s"seed $i/$batchNo: unique SKs")
          assert(rows.filter(!_.getBoolean(5))
            .forall(r => r.getTimestamp(3).before(r.getTimestamp(4))),
            s"seed $i/$batchNo: closed versions have valid_from < valid_to")
        }
      }
    }
  }

  test("M3: closeAndInsert — unchanged kept, changed closed+reopened, new opened; re-run is no-op") {
    val dim0 = Scd2.withGlobalSk(
      Scd2.fromChangeLog(changeLog(
        (1, "2024-01-01 00:00:00", "a"),
        (2, "2024-01-01 00:00:00", "b")), "bk", "ts", Seq("attr")),
      "bk", "sk")
      .select($"bk", $"attr", $"sk", $"valid_from", $"valid_to", $"is_current")
    val stg = Seq((1, "a"), (2, "B2"), (3, "c")).toDF("bk", "attr")
    val runTs = lit("2024-02-01 00:00:00").cast("timestamp")

    val next = Scd2.closeAndInsert(dim0, stg, "bk", Seq("attr"), runTs, "sk")
    val rows = next.select($"bk", $"attr", $"is_current").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(
      (1, "a", true),   // unchanged
      (2, "b", false),  // closed
      (2, "B2", true),  // reopened with new attr
      (3, "c", true)))  // new key
    // exactly one current per key, SKs unique
    val cur = next.filter($"is_current").groupBy($"bk").count()
      .filter($"count" =!= 1).count()
    assert(cur == 0)
    val sks = next.select($"sk").collect().map(_.getLong(0))
    assert(sks.distinct.length == sks.length)
    // idempotent re-run: same stg → no new versions
    val again = Scd2.closeAndInsert(next, stg, "bk", Seq("attr"),
      lit("2024-03-01 00:00:00").cast("timestamp"), "sk")
    assert(again.count() == next.count())
    assert(again.select($"bk", $"attr", $"is_current").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet == rows)
  }

  test("M3 at scale: closeAndInsert bulk initial load assigns maxSk-offset keys in bk order with NO single-partition sort") {
    // bulk-load shape: empty dim, the whole dimension arrives as one
    // increment — the exact case where a global row_number window would
    // funnel everything through one task
    val stg = Tables.customer(spark, Sf001)
      .select(col("c_custkey").as("bk"), col("c_name").as("attr"))
    val empty = stg.limit(0)
      .withColumn("sk", lit(7L)) // schema only; dim is empty → maxSk = 0
      .withColumn("valid_from", lit(null).cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val runTs = lit("2024-02-01 00:00:00").cast("timestamp")
    val next = Scd2.closeAndInsert(empty, stg, "bk", Seq("attr"), runTs, "sk")

    // keys are dense 1..n in bk order — identical to the global-window
    // assignment the scalable path replaces
    val got = next.select($"bk", $"sk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.map(_._2).toSeq == (1L to got.length.toLong))
    // plan shape: nothing in the SCD2 plan funnels through one partition
    val plan = next.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)

    // incremental continuation: opened rows continue above the existing max
    val stg2 = stg.withColumn("attr", concat($"attr", lit("!")))
      .filter($"bk" <= 5)
    val next2 = Scd2.closeAndInsert(next.localCheckpoint(), stg2, "bk", Seq("attr"),
      lit("2024-03-01 00:00:00").cast("timestamp"), "sk")
    val maxSk = got.map(_._2).max
    val openedSks = next2.filter($"is_current" && $"bk" <= 5)
      .select($"bk", $"sk").collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(openedSks.map(_._2).toSeq == (maxSk + 1 to maxSk + openedSks.length))
  }
}
