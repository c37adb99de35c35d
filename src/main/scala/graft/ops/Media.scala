package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.5 L05 / the north star's
  * "image/audio/video as opaque binary columns with typed metadata").
  *
  * The Spark-side contract is real and tested — schema convention,
  * batch-friendly transforms, frame slicing — while the actual codec is a
  * clearly-marked DETERMINISTIC STUB (this container has no image/audio
  * libraries): "decoding" parses fake dimensions out of the payload bytes.
  * Swapping in a real decoder means replacing ONLY `decodeStub`'s
  * expression with a library call of the same signature
  * (binary -> struct), e.g. inside mapPartitions with a per-partition
  * codec instance; every downstream transform is unchanged.
  *
  * Schema convention for a media column:
  *   payload: binary, media_type: string,
  *   meta: struct<width int, height int, n_frames int>
  */
object Media {

  /** Wrap a binary payload into the media-column convention. */
  def toMedia(payload: Column, mediaType: Column): Column =
    struct(payload.as("payload"), mediaType.as("media_type"))

  /** STUB decoder: deterministic fake metadata derived from the bytes —
    * stands in for an image/video header parse. Same shape as a real
    * decode: binary -> struct<width, height, n_frames>.
    */
  def decodeStub(payload: Column): Column = {
    val n = octet_length(payload)
    struct(
      (pmod(crc32(payload), lit(1280)) + lit(1)).cast("int").as("width"),
      (pmod(crc32(reverse(payload)), lit(720)) + lit(1)).cast("int").as("height"),
      greatest(lit(1), (n / 1000).cast("int")).as("n_frames"))
  }

  /** STUB resize: recompute metadata for a target box, preserving aspect
    * ratio (integer math, deterministic) — payload untouched, as a real
    * lazy-resize pipeline would do until materialization.
    */
  def resizeMetaStub(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    // scale = min(maxW/w, maxH/h) in 1e6 fixed point, capped at 1.0
    val scale = least(lit(1000000L),
      least(lit(maxW.toLong * 1000000L) / w, lit(maxH.toLong * 1000000L) / h))
    struct(
      greatest(lit(1), (w * scale / 1000000L).cast("int")).as("width"),
      greatest(lit(1), (h * scale / 1000000L).cast("int")).as("height"),
      meta.getField("n_frames").as("n_frames"))
  }

  /** Frame sampling: slice the payload into `n` byte-range "frames"
    * (exploded one row per frame). A real video pipeline has identical
    * shape — per-frame rows with (frame_idx, frame_payload) — with the
    * slicing done by the codec instead of substring.
    */
  def frameSample(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val frameLen = greatest(lit(1),
      (octet_length(col(payloadCol)) / n).cast("int"))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_payload",
        col(payloadCol).substr(col("frame_idx") * frameLen + 1, frameLen))
      .filter(octet_length(col("frame_payload")) > 0)
  }
}
