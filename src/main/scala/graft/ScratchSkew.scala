package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not part of the driver contract): drive AQE's skew-join
  * rewrite on the q35 hot-key fixture shape and print the final adaptive
  * plan plus the adaptive layer's debug log, to verify the thresholds and
  * map-side granularity that make the rewrite fire.
  */
object ScratchSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive",
      org.apache.logging.log4j.Level.DEBUG)
    val ev = Tables.load(spark, sfDir, "events")
      .repartition(8)
      .select(when(col("user_id") % 2 === 0, lit(0L))
          .otherwise(col("user_id")).as("k"),
        Det.cents(col("value")).as("v_cents"))
    val dim = ev.select(col("k")).distinct()
      .withColumn("grp", pmod(col("k"), lit(7L)))
      .localCheckpoint()
    val joined = ev.join(dim, "k")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("sum_cents"))
    joined.collect()
    println("==== FINAL PLAN ====")
    println(joined.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
