package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val events = Tables.load(spark, sfDir, "events").cache()
    events.count()

    time("json_extract_only") {
      events.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("json_groupby (q20 body)") {
      events.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("cnt_k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q20 via SparkEntry (2nd run)") {
      SparkEntry.queries("q20_json")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q20 via SparkEntry (3rd run)") {
      SparkEntry.queries("q20_json")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val edges = graft.ops.Graphs.supplyEdges(spark, sfDir).cache()
    time("supplyEdges materialize") { edges.count() }
    time("g03 khop (edges pre-cached)") {
      SparkEntry.queries("g03_khop")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("g03 khop again") {
      SparkEntry.queries("g03_khop")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val vecs = Tables.load(spark, sfDir, "embeddings").cache()
    vecs.count()
    time("l03 cosine allpairs") {
      SparkEntry.queries("l03_cosine_topk")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
