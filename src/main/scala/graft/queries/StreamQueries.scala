package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming transforms (SURVEY.md §2.4). The SAME
  * transform functions run here over the batch `events` table and in
  * StreamingSpec over a MemoryStream — batch-equivalence is the streaming
  * oracle, and these batch results are themselves hash-checked in DuckDB.
  */
object StreamQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S01 — tumbling 1-hour counts per event type.
    "s01_tumbling_counts" -> ((s, dir) =>
      Streams.tumblingCounts(ev(s, dir))
        .orderBy("ws", "event_type")),

    // S02 — sliding 1-hour/15-minute sum of value cents.
    "s02_sliding_sum" -> ((s, dir) =>
      Streams.slidingSumCents(ev(s, dir))
        .orderBy("ws", "event_type")),

    // S03 — session_window sessions (strictly-less merge rule; see
    // Streams.sessionWindows scaladoc for the boundary contrast with T06).
    "s03_session_window" -> ((s, dir) =>
      Streams.sessionWindows(ev(s, dir))
        .orderBy("user_id", "session_start")),

    // S05 — dedup on event_id (watermark-scoped in streaming; plain exact
    // dedup in batch). event_id is the PK, so the twin unions a duplicated
    // slice (every 7th event) first — the hash check then exercises actual
    // collapse (output counts match plain `events`, which they would NOT
    // without the dedup), not just a count of unique keys.
    "s05_dedup" -> ((s, dir) => {
      val e = ev(s, dir)
      val dups = e.filter(col("event_id") % 7 === 0)
      e.unionAll(dups)
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("event_type")
    }),

    // S06 — arbitrary stateful op: running mean+3σ anomaly flags per
    // user. Batch twin runs the O(1)-state secondary-sort fold (a hot
    // user's history streams through, never materialized); StreamingSpec
    // asserts it equals the flatMapGroupsWithState path and a
    // hand-computed case. Engine-only: the Welford-fold op order has no
    // exact SQL twin.
    "s06_anomaly_flags" -> ((s, dir) => {
      import s.implicits._
      val in = ev(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .as[Streams.EventIn]
      Streams.flagAnomaliesBatch(in)
        .filter(col("anomalous"))
        .select("event_id", "user_id")
        .orderBy("event_id")
    }),

    // S08 — transformWithState (Spark 4 arbitrary-state API): per-user
    // running totals in integer cents; batch run is exact and
    // hash-checked, the streaming run is asserted equal in StreamingSpec.
    "s08_transform_with_state" -> ((s, dir) => {
      import s.implicits._
      // transformWithState runs on the RocksDB state store (batch too),
      // and needs the coordinator endpoint streaming normally bootstraps
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      org.apache.spark.sql.GraftPlanBridge.ensureStateStoreCoordinator(s)
      val in = ev(s, dir)
        .select(col("user_id"), col("value"))
        .as[Streams.EventIn2]
      Streams.userTotals(in)
        .toDF()
        .orderBy("user_id")
    }),

    // S09 — transformWithState with LIST state: per-user count + cents
    // total of the 5 most-recent events by (ts, event_id). Batch run is
    // exact (one batch = the whole table) and hash-checked against a
    // window-rank SQL twin; streaming equality is in StreamingSpec.
    "s09_list_state_lastk" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      org.apache.spark.sql.GraftPlanBridge.ensureStateStoreCoordinator(s)
      val in = ev(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          graft.Det.cents(col("value")).as("cents"))
        .as[Streams.TsEv]
      Streams.lastKTotals(in, k = 5)
        .toDF()
        .orderBy("user_id")
    }),

    // S10 — transformWithState with MAP state: per-user histogram of
    // event types (state = one map entry per distinct type, not history).
    // Batch run emits the final histogram once — hash-checked.
    "s10_map_state_counts" -> ((s, dir) => {
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      org.apache.spark.sql.GraftPlanBridge.ensureStateStoreCoordinator(s)
      val in = ev(s, dir)
        .select(col("user_id"), col("event_type"))
        .as[Streams.TypeEv]
      Streams.typeCounts(in)
        .toDF()
        .orderBy("user_id", "event_type")
    }),

    // S07 — stream-static join shape in batch: events enriched with the
    // customer dim, counted per segment.
    "s07_stream_static_join" -> ((s, dir) =>
      Streams.enrichWithCustomers(ev(s, dir), Tables.load(s, dir, "customer"))
        // users outside the bridged c_custkey%50 domain have no segment;
        // coalesce so the null group can't hit cross-engine null-ordering
        .groupBy(coalesce(col("segment"), lit("NONE")).as("segment"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("segment"))
  )

  val oracles: Map[String, String] = Map(
    "s01_tumbling_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
        |  event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s02_sliding_sum" ->
      """WITH g AS (SELECT event_type, value, ts, unnest([0,1,2,3]) AS k
        |           FROM events)
        |SELECT CAST(TIMESTAMP '1970-01-01'
        |    + INTERVAL 1 SECOND * CAST(floor(epoch(ts)/900)*900 AS BIGINT)
        |    - INTERVAL 15 MINUTE * CAST(k AS INT) AS TIMESTAMP) AS ws,
        |  event_type,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s03_session_window" ->
      """WITH x AS (SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        | s AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT CAST(min(ts) AS TIMESTAMP) AS session_start, user_id,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "s05_dedup" ->
      """SELECT event_type, count(*) AS n_rows FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "s09_list_state_lastk" ->
      """WITH ranked AS (
        |  SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, count(*) AS n_recent,
        |  CAST(sum(cents) AS BIGINT) AS recent_cents
        |FROM ranked WHERE rn <= 5
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "s10_map_state_counts" ->
      """SELECT user_id, event_type, count(*) AS n FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s08_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "s07_stream_static_join" ->
      """WITH seg AS (SELECT c_custkey % 50 AS user_id,
        |    min(c_mktsegment) AS segment
        |  FROM customer GROUP BY 1)
        |SELECT coalesce(seg.segment, 'NONE') AS segment, count(*) AS n_events
        |FROM events e LEFT JOIN seg ON e.user_id = seg.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
