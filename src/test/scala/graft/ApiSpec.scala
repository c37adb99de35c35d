package graft

import graft.api.{PropertyGraph, TemporalTable}
import graft.ops.{Media, Skew}
import org.apache.spark.sql.functions._

/** Public API facades + skew/media helpers. */
class ApiSpec extends SparkSpecBase {

  private def graph() = {
    import spark.implicits._
    // 1 -> 2 -> 3 -> 4, 5 isolated, plus 2 -> 4 shortcut
    val v = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L)).toDF("src", "dst")
    PropertyGraph(v, e)
  }

  test("PropertyGraph degrees include zero-degree vertices") {
    val out = graph().outDegrees.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
    val in = graph().inDegrees.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(in == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 0L))
  }

  test("PropertyGraph khop and bfs agree on the reachable set") {
    import spark.implicits._
    val g = graph()
    val k2 = g.khop(Seq(1L).toDF("id"), 2).collect().map(_.getLong(0)).toSet
    assert(k2 == Set(2L, 3L, 4L)) // hop1: 2; hop2: 3,4
    val depths = g.bfs(1L, 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(depths == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2))
  }

  test("PropertyGraph connectedComponents labels by min id") {
    val cc = graph().connectedComponents.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // vertices present in edges only (5 is isolated, not in edge RDD)
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("PropertyGraph findPath2 matches expected triples") {
    val triples = graph().findPath2().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triples == Set((1L, 2L, 3L), (1L, 2L, 4L), (2L, 3L, 4L)))
  }

  test("TemporalTable facade wires snapshot/asOf/sessionize") {
    import spark.implicits._
    val changes = Seq(
      (1L, 10L, 100L, 1.0), (2L, 10L, 200L, 2.0), (3L, 20L, 150L, 3.0))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val tt = TemporalTable(changes, "user_id", "ts", "event_id")
    val snap = tt.snapshot(timestamp_seconds(lit(150)))
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(10L -> 1L, 20L -> 3L))
    val probes = Seq((10L, 250L), (20L, 100L)).toDF("user_id", "psec")
      .withColumn("p_ts", timestamp_seconds(col("psec"))).drop("psec")
    val asof = tt.asOfJoin(probes, "p_ts", Seq("value")).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(asof == Map(10L -> Some(2.0), 20L -> None))
  }

  test("saltedJoin equals plain join on skewed data") {
    import spark.implicits._
    // hot key: 9000 of 10000 rows share key 1
    val left = (1 to 10000).map(i =>
      (i.toLong, if (i <= 9000) 1L else (i % 50).toLong)).toDF("row_id", "k")
    val right = (0 until 50).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    val plain = left.join(right, "k").select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(left, right, "k", buckets = 8)
      .select("row_id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
  }

  test("media pipeline: decode stub deterministic, frames partition the payload") {
    import spark.implicits._
    val df = Seq((1L, "hello world, a reasonably sized payload for frames"))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("meta", Media.decodeStub(col("payload")))
    val m1 = df.select("meta.*").collect()(0)
    val m2 = df.select("meta.*").collect()(0)
    assert(m1 == m2) // deterministic
    assert(m1.getInt(0) >= 1 && m1.getInt(1) >= 1)
    val frames = Media.frameSample(df, "payload", 4)
      .select("frame_idx", "frame_payload").collect()
    assert(frames.length == 4)
    val total = frames.map(_.getAs[Array[Byte]](1).length).sum
    assert(total <= 51 && total >= 48) // 4 equal slices, remainder dropped
    val resized = df.select(Media.resizeMetaStub(col("meta"), 64, 64).as("m"))
      .select("m.*").collect()(0)
    assert(resized.getInt(0) <= 64 && resized.getInt(1) <= 64)
  }
}
