package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: only run queries whose name starts with one of
    // the comma-separated prefixes (local iteration aid; the driver
    // always passes two args)
    val (sfDir, outDir, prefix) = args match {
      case Array(a, b)    => (a, b, "")
      case Array(a, b, p) => (a, b, p)
    }
    val prefixes = prefix.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Warm the columnar cache once — every query's Tables.load plan is
    // plan-equal, so every query reads from memory instead of re-decoding
    // parquet per query.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).cache().count())
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(n => prefixes.exists(n._1.startsWith)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Erroring queries recorded IN the artifact (ADVICE r9: a query that
    // throws otherwise just goes missing from the report, and
    // missing-vs-passing is only visible by recounting the registry).
    // Exits nonzero too — a clean rc with absent dump dirs reads as
    // green downstream.
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    // Machine-readable run summary next to the dumps (same rationale as
    // Bench's bench_last.json — VERDICT r10 "wrong" #1): counts are
    // checkable without re-parsing stderr or recounting dump dirs.
    val ran = SparkEntry.queries.keys.count(n => prefixes.exists(n.startsWith))
    Files.writeString(Paths.get(s"$outDir/_verify_summary.json"),
      s"""{"registry":${SparkEntry.queries.size},"ran":$ran,"ok":${ran - errors.size},"failed":${errors.size},"sf":${q(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(2)
  }
}
