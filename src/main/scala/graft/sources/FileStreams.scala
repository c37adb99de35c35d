package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-landing streaming ingestion (SURVEY §2.4's "continuous temporal
  * ingestion" analog, §7 phase 5's file source): a directory where
  * upstream drops parquet/JSONL files becomes an unbounded stream — the
  * same transforms that run on a batch DataFrame run on this stream and
  * must produce the same result (gated in SourcesSpec against the batch
  * twin).
  *
  * At 100 TB this is the canonical cluster ingestion shape: object-store
  * prefixes as the landing zone, `maxFilesPerTrigger` bounding per-batch
  * work, checkpointed file tracking giving exactly-once per file. The
  * schema is EXPLICIT (streaming sources do not infer), which also pins
  * the contract between producer and pipeline.
  */
object FileStreams {

  /** Stream of parquet files landing under `path`. */
  def parquetDirStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Stream of JSON-lines files landing under `path`. */
  def jsonlDirStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
