package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Deterministic text-format interchange (SURVEY §7 phase 4's canonical
  * writer): CSV and JSON-lines readers/writers whose bytes are a pure
  * function of the data — fixed header, UTC microsecond timestamps,
  * explicit null sentinel, and rows routed + ordered by a declared sort
  * key rather than partition scheduling. Two writes of the same frame
  * produce byte-identical part files (asserted in SourcesSpec), so
  * downstream content hashes are stable across reruns and engines.
  *
  * Readers take an EXPLICIT schema: inference reads the data twice and
  * can silently flip a column's type when the data drifts — at 100 TB
  * both are unacceptable.
  */
object TextFormats {

  /** ISO-8601 with microseconds, UTC — round-trips Spark's TimestampType
    * losslessly and sorts lexicographically.
    */
  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Null sentinel distinct from the empty string, so "" round-trips. */
  val NullToken = "\\N"

  private def canonical(df: DataFrame, sortCols: Seq[String],
      partitions: Int): DataFrame =
    df.repartition(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)

  /** Canonical CSV write: `partitions` part files, rows hash-routed and
    * sorted by `sortCols`.
    */
  def writeCsv(df: DataFrame, path: String, sortCols: Seq[String],
      partitions: Int = 1): Unit =
    canonical(df, sortCols, partitions).write
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("nullValue", NullToken)
      .option("emptyValue", "\"\"")
      .mode("overwrite")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("nullValue", NullToken)
      .schema(schema)
      .csv(path)

  /** Canonical JSON-lines write — same routing/ordering contract as
    * [[writeCsv]]; nulls are native JSON nulls.
    */
  def writeJsonl(df: DataFrame, path: String, sortCols: Seq[String],
      partitions: Int = 1): Unit =
    canonical(df, sortCols, partitions).write
      .option("timestampFormat", TsFormat)
      .mode("overwrite")
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFormat)
      .schema(schema)
      .json(path)
}
