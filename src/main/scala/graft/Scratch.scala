package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan audit (not part of the driver contract): prints formatted
  * plans for representative queries to eyeball pushdown, broadcast
  * selection, and whole-stage-codegen coverage.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter", "q04_multi_join", "q10_asof_join",
        "q02_pricing_summary", "t06_sessionize", "q09_range_join", "l06_knn")
    keys.foreach { k =>
      println(s"\n======== $k ========")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
