package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §6 / the 100 TB story). AQE's
  * skew-join split handles most cases at runtime; explicit salting is for
  * the pathological keys AQE can't split (e.g. a single hot key inside
  * one aggregation or a storage-partitioned join).
  */
object Skew {

  /** Salted equi join: the (large, skewed) left side gets a deterministic
    * salt in [0, buckets); the (smaller) right side is replicated across
    * all salts; the join key becomes (key, salt), splitting each hot key
    * into `buckets` shuffle partitions. Result equals a plain inner join
    * on `key`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    // deterministic per-row salt: hash every left column (not rand() —
    // reruns and retries must route rows identically)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(buckets.toLong)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
      .withColumnRenamed(key, "__rkey")
    salted.join(replicated,
        col(key) === col("__rkey") && salted("__salt") === replicated("__salt"))
      .drop("__salt").drop("__rkey")
  }
}
