package graft

import java.nio.file.Files

import graft.ops.{RangeJoin, Temporal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Timestamp-encoding robustness (round-9 regression): the driver's
  * fixtures have shipped `ts` as TIMESTAMP(NANOS) and as timestamp[us]
  * isAdjustedToUTC=false (→ TIMESTAMP_NTZ); a real lakehouse mixes
  * TIMESTAMP and TIMESTAMP_NTZ parquet freely. Tables.load must
  * normalize every flavor to the canonical session-TZ TimestampType, and
  * the temporal operators must accept either type directly (Det.epochUs).
  * Round 9 lost 16 queries to exactly this: `unix_micros` rejects NTZ at
  * analysis time, so a fixture re-encode killed sessionize, range join,
  * bitemporal reads, and the stream-stream joins. This spec pins both
  * layers so the next encoding change fails here, not in the driver run.
  */
class NtzSpec extends SparkSpecBase {

  private lazy val ntzDir: String = {
    val dir = Files.createTempDirectory("graft-ntz").toFile
    dir.deleteOnExit()
    val s = spark
    import s.implicits._
    // Two users; user 1 has a >30-min gap after event 3 → 2 sessions.
    Seq(
      (1L, 1L, "2024-01-01 00:00:00", 10.0),
      (2L, 1L, "2024-01-01 00:10:00", 11.0),
      (3L, 1L, "2024-01-01 00:20:00", 12.0),
      (4L, 1L, "2024-01-01 02:00:00", 13.0),
      (5L, 2L, "2024-01-01 00:05:00", 14.0))
      .toDF("event_id", "user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast(TimestampNTZType))
      .drop("ts_s")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  test("Tables.load normalizes TIMESTAMP_NTZ parquet to TimestampType") {
    // Written as NTZ on disk...
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    // ...loaded as the canonical TimestampType, same micros value.
    val df = Tables.load(spark, ntzDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("event_id").select(unix_micros(col("ts"))).head().getLong(0)
    assert(first == 1704067200000000L) // 2024-01-01T00:00:00Z in UTC session
  }

  test("Tables.load normalizes parquet DATE columns to midnight timestamps") {
    // Forward insurance for the next fixture re-encode: if a date-grain
    // column (o_orderdate/l_shipdate today ship as timestamp[us])
    // narrows to parquet DATE, loads must surface the same midnight-UTC
    // timestamp values the current encoding carries.
    val dir = Files.createTempDirectory("graft-date").toFile
    dir.deleteOnExit()
    val s = spark
    import s.implicits._
    Seq((1L, "2024-01-05"), (2L, "2024-02-29"))
      .toDF("o_orderkey", "d_s")
      .withColumn("o_orderdate", col("d_s").cast(org.apache.spark.sql.types.DateType))
      .drop("d_s")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/orders.parquet")
    val raw = spark.read.parquet(s"${dir.getAbsolutePath}/orders.parquet")
    assert(raw.schema("o_orderdate").dataType ==
      org.apache.spark.sql.types.DateType)
    val df = Tables.load(spark, dir.getAbsolutePath, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampType)
    val got = df.orderBy("o_orderkey")
      .select(unix_micros(col("o_orderdate"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1704412800000000L, 1709164800000000L))
  }

  test("sessionize and banded range join run on raw NTZ input") {
    // Deliberately NOT via Tables.load: operators themselves must accept
    // NTZ (library inputs aren't always catalog-loaded).
    val raw = spark.read.parquet(s"$ntzDir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)

    val sessions = Temporal.sessionize(raw, entity = "user_id", ts = "ts",
        tieBreak = "event_id", gapSeconds = 1800)
      .select("user_id", "session_id").distinct().collect()
    assert(sessions.length == 3) // user 1 splits on the 100-min gap; user 2 one session

    val pairs = RangeJoin.banded(
        raw.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts")),
        raw.select(col("event_id").as("b_id"), col("user_id").as("user_id"), col("ts").as("b_ts")),
        key = "user_id", aTs = "a_ts", bTs = "b_ts",
        lowerUs = 0L, upperUs = 30L * 60 * 1000000)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L))) // within 30 min, strictly after
  }
}
