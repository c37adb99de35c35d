package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, LlmQueries, Relational, StreamQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the executable operator inventory (SURVEY.md §2); every
  * entry with an `oracleSql` twin is hash-matched against DuckDB at
  * sf0.01. Entries without an oracle (approximate / seeded / heuristic
  * operators — SURVEY §2.0 rule 5) get a rows-only check and are
  * tolerance-gated in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation for ASIA (SURVEY Q04) — exercises scan, broadcast +
    * shuffle joins, two-phase agg, and sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q04_multi_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TemporalQueries.queries ++
      GraphQueries.queries ++ LlmQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TemporalQueries.oracles ++
      GraphQueries.oracles ++ LlmQueries.oracles ++ StreamQueries.oracles
}
