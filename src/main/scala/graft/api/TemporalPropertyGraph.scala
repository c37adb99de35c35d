package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A property graph whose edges are time-versioned (SURVEY §1.1 — the
  * reference's temporal-graph data model): each edge carries
  * `valid_from` and `valid_to` (null = still valid). Time-point and
  * time-window views project ordinary [[PropertyGraph]]s, so every
  * traversal/algorithm in the engine runs unchanged on a snapshot —
  * temporality is a FILTER the optimizer pushes into the edge scan, not
  * a separate execution path.
  *
  * Expected edge columns: `src`, `dst`, `etype`, `valid_from: timestamp`,
  * `valid_to: timestamp` (nullable).
  */
case class TemporalPropertyGraph(vertices: DataFrame, edges: DataFrame) {

  private def validAt(t: Column): Column =
    col("valid_from") <= t && (col("valid_to").isNull || col("valid_to") > t)

  /** The graph as it existed at time `t` (edges valid at that instant). */
  def at(t: Column): PropertyGraph =
    PropertyGraph(vertices,
      edges.filter(validAt(t)).drop("valid_from", "valid_to"))

  /** The graph of edges whose validity overlaps `[from, until)`. */
  def during(from: Column, until: Column): PropertyGraph =
    PropertyGraph(vertices,
      edges.filter(col("valid_from") < until &&
          (col("valid_to").isNull || col("valid_to") > from))
        .drop("valid_from", "valid_to"))

  /** Edge counts per type at each time point — the evolution profile of
    * the graph. One scan of the edge list regardless of the number of
    * points: each edge row fans out to the points it is valid at
    * (generator + filter, no self-join), then one aggregation.
    */
  def evolution(points: Seq[String]): DataFrame =
    edges
      .select(col("etype"), col("valid_from"), col("valid_to"),
        explode(array(points.map(p => to_timestamp(lit(p))): _*)).as("t"))
      .filter(validAt(col("t")))
      .groupBy("t", "etype").agg(count(lit(1)).as("n_edges"))
}
