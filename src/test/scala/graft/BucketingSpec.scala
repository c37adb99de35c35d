package graft

import graft.ops.Bucketing
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

/** Bucketed co-located joins: the per-query shuffle disappears when both
  * sides are bucketed on the join key (the 100 TB repeated-join pattern).
  */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key has no Exchange") {
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // directory persists — clean both
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 8)

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))

    // correctness: equals the plain join
    val plainCount = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == plainCount && plainCount > 0)

    // plan: no shuffle anywhere in the join. Broadcast is disabled and
    // the frame re-planned inside the scope — the tiny fixture would
    // otherwise broadcast one side and never exercise bucket locality.
    withoutAutoBroadcast {
      val rejoined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val exchanges = physical(rejoined).collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected exchange-free bucketed join, found: ${exchanges.map(_.nodeName)}")
    }
  }

  test("as-of merge join over bucketed+sorted tables plans exchange-free") {
    Seq("ev_bucketed", "ev2_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(dir)
      }
    }
    val ev = Tables.load(spark, sfDir, "events")
    Bucketing.writeBucketed(
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      "ev_bucketed", "user_id", 4, sortCols = Seq("user_id", "ts"))
    Bucketing.writeBucketed(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id")),
      "ev2_bucketed", "user_id", 4,
      sortCols = Seq("user_id", "ts", "click_id"))
    val joined = graft.ops.AsOfJoin.merge(
      spark.table("ev_bucketed"), spark.table("ev2_bucketed"),
      Seq("user_id"), "ts", "ts", Seq("click_id"), "click_id")
    val exec = physical(joined)
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"expected exchange-free bucketed as-of, found ${exchanges.map(_.nodeName)}")
    // and it still computes the right thing (vs the window implementation)
    val viaWindow = graft.ops.AsOfJoin(
      spark.table("ev_bucketed"), spark.table("ev2_bucketed"),
      Seq("user_id"), "ts", "ts", Seq("click_id"), "click_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    val viaMerge = joined.collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(viaMerge == viaWindow && viaMerge.nonEmpty)

    // outputPartitioning is preserved: a groupBy on the join key directly
    // after the as-of must not add any exchange either
    val agged = graft.ops.AsOfJoin.merge(
      spark.table("ev_bucketed"), spark.table("ev2_bucketed"),
      Seq("user_id"), "ts", "ts", Seq("click_id"), "click_id")
      .groupBy("user_id").count()
    val aggedExchanges = physical(agged).collect {
      case e: Exchange => e
    }
    assert(aggedExchanges.isEmpty,
      s"expected exchange-free asof+groupBy, found ${aggedExchanges.map(_.nodeName)}")
  }

  test("day-partitioned events prune partitions for time-range predicates") {
    val path = "/tmp/graft-test-warehouse/events_by_day"
    Bucketing.writePartitionedByDay(
      Tables.load(spark, sfDir, "events"), path, "ts")
    val all = spark.read.parquet(path)
    val filtered = all.filter(
      col("p_day") >= lit("2024-01-10") && col("p_day") < lit("2024-01-12"))
    // partition pruning happens at the file-index level: the filtered scan
    // reads only the 2 matching day directories
    val scans = physical(filtered).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val selected = scans.head.selectedPartitions.partitionCount
    val total = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("p_day="))
    assert(selected == 2, s"selected $selected of $total partitions")
    assert(total >= 29, s"expected ~30 day partitions, got $total")
    // and the rows match the unpartitioned filter
    val expect = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-12").cast("timestamp")).count()
    assert(filtered.count() == expect)
  }
}
