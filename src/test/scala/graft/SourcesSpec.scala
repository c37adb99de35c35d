package graft

import java.nio.file.{Files, Paths}
import graft.sources.{FileStreams, TextFormats}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Source/sink layer (SURVEY §7 phases 4–5): file-landing streaming
  * ingestion must equal the batch result on the same files, and the
  * canonical text writers must round-trip values and produce
  * byte-identical output across reruns.
  */
class SourcesSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700006400000L + minutes * 60000L)

  private val sample = Seq(
    Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 1, "view", 2.0),
    Ev(3, ts(61), 2, "click", 3.0), Ev(4, ts(65), 1, "click", 4.0),
    Ev(5, ts(130), 2, "purchase", 5.0))

  /** Land `rows` as ONE flat parquet file in `dir` (the file stream
    * source lists the landing dir flat — a nested `.parquet` output
    * directory would be invisible to it).
    */
  private def landParquet(rows: Seq[Ev], dir: String, name: String): Unit = {
    import spark.implicits._
    val stage = tmpDir("graft-stage")
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    Files.move(part.toPath, Paths.get(dir, name))
  }

  test("parquet dir stream: files landing across batches == batch on the union") {
    import spark.implicits._
    val landing = tmpDir("graft-landing")
    val ckpt = tmpDir("graft-ckpt")
    val (first, second) = sample.splitAt(3)
    // first file is on disk before the stream starts; the second lands
    // mid-stream — both must be picked up exactly once
    landParquet(first, landing, "batch1.parquet")
    val src = FileStreams.parquetDirStream(spark, landing,
      first.toDF().schema, maxFilesPerTrigger = 1)
    val q = Streams.tumblingCounts(src)
      .writeStream.format("memory").queryName("srcsink")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      landParquet(second, landing, "batch2.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("srcsink")
      .orderBy("ws", "event_type").collect().toSeq
    val batch = Streams.tumblingCounts(sample.toDF())
      .orderBy("ws", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("restart from checkpoint: committed batches are not re-emitted") {
    import spark.implicits._
    val landing = tmpDir("graft-landing-r")
    val ckpt = tmpDir("graft-ckpt-r")
    val (first, second) = sample.splitAt(3)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (run, event_id)
    def run(runId: Long): Unit = {
      val src = FileStreams.parquetDirStream(spark, landing,
        sample.toDF().schema, maxFilesPerTrigger = 1)
      val q = src.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.synchronized {
            emitted ++= b.select("event_id").collect()
              .map(r => runId -> r.getLong(0))
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    landParquet(first, landing, "a.parquet")
    run(1)
    landParquet(second, landing, "b.parquet")
    run(2) // restarted query: must pick up ONLY the new file
    assert(emitted.count(_._1 == 1) == first.size)
    assert(emitted.filter(_._1 == 2).map(_._2).toSet ==
      second.map(_.event_id).toSet,
      s"restart re-emitted committed data: $emitted")
    assert(emitted.map(_._2).toSeq.sorted == sample.map(_.event_id).sorted)
  }

  test("canonical CSV: values round-trip, reruns are byte-identical") {
    import spark.implicits._
    // nulls AND empty strings — the sentinel must keep them distinct
    val df = sample.toDF()
      .withColumn("note", when(col("event_id") === 1, lit(""))
        .when(col("event_id") === 2, lit(null).cast("string"))
        .otherwise(concat(lit("n"), col("event_id"))))
    val out1 = tmpDir("graft-csv1")
    val out2 = tmpDir("graft-csv2")
    TextFormats.writeCsv(df, out1, Seq("event_id"))
    TextFormats.writeCsv(df, out2, Seq("event_id"))
    val back = TextFormats.readCsv(spark, out1, df.schema)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    def bytes(dir: String): Seq[Seq[Byte]] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)
        .map(f => Files.readAllBytes(Paths.get(f.getPath)).toSeq).toSeq
    }
    assert(bytes(out1) == bytes(out2) && bytes(out1).nonEmpty)
  }

  test("canonical JSONL: values round-trip; jsonl dir stream == batch") {
    import spark.implicits._
    val df = sample.toDF()
    val out = tmpDir("graft-jsonl")
    TextFormats.writeJsonl(df, out, Seq("event_id"))
    val back = TextFormats.readJsonl(spark, out, df.schema)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // the same landing dir read as a stream equals the batch read
    val ckpt = tmpDir("graft-jsonl-ckpt")
    val q = Streams.tumblingCounts(
        FileStreams.jsonlDirStream(spark, out, df.schema))
      .writeStream.format("memory").queryName("jsonlsink")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("jsonlsink")
      .orderBy("ws", "event_type").collect().toSeq
    val batch = Streams.tumblingCounts(df)
      .orderBy("ws", "event_type").collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
  }
}
