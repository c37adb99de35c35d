package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order clustering gates: the z-curve must (a) preserve the data,
  * (b) make partition-level min-max stats selective on BOTH clustered
  * dimensions — the property a 1-D sort provably lacks on its trailing
  * dimension. Partition min/max here is the unit-testable proxy for the
  * parquet file/row-group stats a real write would carry.
  */
class LayoutSpec extends SparkSpecBase {

  private def partStats(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("zorderBy preserves rows and concentrates a 2-D box in few partitions") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey")
    val z = Layout.zorderBy(li, Seq("l_partkey", "l_suppkey"),
      bits = 8, partitions = 16).cache()
    try {
      // layout ops must not change the data
      assert(z.count() == li.count())
      assert(z.groupBy("l_partkey", "l_suppkey").count()
        .except(li.groupBy("l_partkey", "l_suppkey").count()).isEmpty)

      val stats = partStats(z)
      assert(stats.length >= 8, s"range partitioner collapsed: ${stats.length}")
      val (pLo, pHi) = (li.agg(min("l_partkey")).head().getLong(0),
        li.agg(max("l_partkey")).head().getLong(0))
      val (sLo, sHi) = (li.agg(min("l_suppkey")).head().getLong(0),
        li.agg(max("l_suppkey")).head().getLong(0))
      // box = lowest quarter of both domains ≈ 1/16 of the space: with
      // 16 z-tiles it must sit in a small minority of partitions
      val pBox = pLo + (pHi - pLo) / 4
      val sBox = sLo + (sHi - sLo) / 4
      val boxHits = stats.count { case (pmin, pmax, smin, smax) =>
        pmin <= pBox && pmax >= pLo && smin <= sBox && smax >= sLo }
      assert(boxHits <= stats.length / 2,
        s"2-D box touched $boxHits of ${stats.length} z-partitions")

      // trailing-dimension slice (l_suppkey quarter, l_partkey free):
      // a 1-D sort on l_partkey cannot prune it — every partition spans
      // the full supp domain; the z-layout must prune at least some
      val linear = li.repartitionByRange(16, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
      val linStats = partStats(linear)
      val linHits = linStats.count { case (_, _, smin, smax) =>
        smin <= sBox && smax >= sLo }
      val zHits = stats.count { case (_, _, smin, smax) =>
        smin <= sBox && smax >= sLo }
      assert(linHits == linStats.length,
        s"expected the 1-D layout to be unprunable on the trailing dim")
      assert(zHits < linHits,
        s"z-layout should beat 1-D on the trailing dim: $zHits vs $linHits")
    } finally z.unpersist()
  }

  test("zvalueOfBuckets: interleave is the textbook Morton code") {
    import spark.implicits._
    // (x, y) in [0,4)^2, bits=2: z = y1 x1 y0 x0 (x = dim 0 -> even bits)
    def morton(x: Long, y: Long): Long =
      ((x & 1)) | ((y & 1) << 1) | ((x & 2) >> 1 << 2) | ((y & 2) >> 1 << 3)
    val rows = for (x <- 0L until 4L; y <- 0L until 4L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zvalueOfBuckets(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"($x,$y): ${got((x, y))}")
    }
  }
}
