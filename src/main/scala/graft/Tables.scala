package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Table catalog over the driver-generated parquet fixtures.
  *
  * Each scale-factor directory holds one parquet file per table (see
  * TESTDATA.md / FIXTURES.md). Loading goes through the Parquet DataSource
  * V2 path so filter/column pushdown applies to every query built on top.
  *
  * At 100 TB the same API holds: `dir` becomes a bucket/namespace and each
  * "file" a partitioned dataset — nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    // reader rejects. Read nanos as long and truncate to the engine's
    // microsecond TimestampType (lossless: the generator emits µs values —
    // verified ts % 1000 == 0 at every SF). Integer `div`, NOT `/`:
    // double division loses precision above 2^53 ns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        d.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else d
    }
  }

  /** Register all tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
