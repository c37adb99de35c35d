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

  /** Simulate a PREVIOUS PROCESS's build: the in-memory catalog of a new
    * JVM knows nothing, but the warehouse files + descriptor persist. A
    * same-JVM test can't get a second isolated catalog (newSession shares
    * SharedState), so we copy the built directory to a name the catalog
    * has never seen — byte-identical to what a fresh process finds.
    */
  private def cloneWarehouseDir(from: String, to: String): Unit = {
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(f =>
          cp(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val wh = "/tmp/graft-test-warehouse"
    val dstDir = new java.io.File(s"$wh/$to")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    if (dstDir.exists()) rm(dstDir)
    cp(new java.io.File(s"$wh/$from"), dstDir)
  }

  test("reattach: a second process reuses a bucketed build without rebuilding") {
    Seq("reat_src", "reat_dst").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Seq("reat_src", "reat_dst").foreach(Bucketing.dropStaleLocation(spark, _))
    var builds = 0
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val built = Bucketing.bucketedTable(spark, "reat_src",
        Seq("l_orderkey"), 8, Seq("l_orderkey", "l_partkey")) {
      builds += 1; li
    }
    assert(builds == 1 && built.count() == li.count())
    // same session asks again: catalog hit, no rebuild
    Bucketing.bucketedTable(spark, "reat_src", Seq("l_orderkey"), 8) {
      builds += 1; li
    }
    assert(builds == 1)

    // "new process": unknown table name over the same bytes
    cloneWarehouseDir("reat_src", "reat_dst")
    val reattached = Bucketing.bucketedTable(spark, "reat_dst",
        Seq("l_orderkey"), 8) {
      builds += 1; li
    }
    assert(builds == 1, "reattach must NOT rebuild")
    assert(reattached.count() == li.count())
    // bucketing metadata survived the reattach: self-join on the bucket
    // key plans with zero Exchange, same as a first-process build
    withoutAutoBroadcast {
      val j = spark.table("reat_dst").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val exchanges = physical(j).collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e }
      assert(exchanges.isEmpty,
        s"reattached table lost its bucketing: ${exchanges.map(_.nodeName)}")
    }
  }

  test("compactBucketed: appended runs collapse to one file per bucket") {
    Seq("cmp_t", "cmp_t__compact").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Bucketing.dropStaleLocation(spark, t)
    }
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val slices = Seq(0, 1, 2).map(i => li.filter(col("l_orderkey") % 3 === i))
    Bucketing.writeBucketedMulti(slices(0), "cmp_t", Seq("l_orderkey"), 4)
    slices.tail.foreach(sl =>
      Bucketing.appendBucketedMulti(sl, "cmp_t", Seq("l_orderkey"), 4))
    def dataFiles = new java.io.File("/tmp/graft-test-warehouse/cmp_t")
      .listFiles.count(_.getName.startsWith("part-"))
    assert(dataFiles > 4, s"expected >4 files after 3 intakes, got $dataFiles")
    val before = spark.table("cmp_t").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

    Bucketing.compactBucketed(spark, "cmp_t")

    assert(dataFiles == 4, s"expected one file per bucket, got $dataFiles")
    val after = spark.table("cmp_t").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(after == before && after.nonEmpty)
    // bucket locality intact post-swap: keyed agg plans with no Exchange
    withoutAutoBroadcast {
      val agg = spark.table("cmp_t").groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      val exchanges = physical(agg).collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"compaction broke bucket metadata: ${exchanges.map(_.nodeName)}")
    }
  }

  test("reattach: SimIndex freshness check reuses a prior process's index") {
    import graft.ops.SimIndex
    val docs = Tables.load(spark, sfDir, "documents")
    val pfxA = "reat_lsh_a"
    val pfxB = "reat_lsh_b"
    for (p <- Seq(pfxA, pfxB); sfx <- Seq("_meta", "_bands", "_sigs")) {
      spark.sql(s"DROP TABLE IF EXISTS $p$sfx")
      Bucketing.dropStaleLocation(spark, p + sfx)
    }
    SimIndex.writeLshIndex(docs, pfxA, numHashes = 8, bands = 4, buckets = 4)
    assert(SimIndex.isFresh(spark, pfxA, docs))
    // clone to a prefix this catalog has never seen = a new process
    Seq("_meta", "_bands", "_sigs").foreach(sfx =>
      cloneWarehouseDir(pfxA + sfx, pfxB + sfx))
    assert(SimIndex.isFresh(spark, pfxB, docs),
      "a new session must reattach the persisted index, not rebuild")
    val viaB = SimIndex.lshCandidatesFromIndex(spark, pfxB,
      verifyAgainst = Some(docs)).count()
    val viaA = SimIndex.lshCandidatesFromIndex(spark, pfxA).count()
    assert(viaB == viaA && viaA > 0)
    // staleness still detected through the reattached meta
    assert(!SimIndex.isFresh(spark, pfxB, docs.limit(10)))
  }
}
