package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.5 L05 / the north star's
  * "image/audio/video as opaque binary columns with typed metadata").
  *
  * The codec layer is REAL for two dependency-free containers — PPM (P6)
  * images and WAV (PCM16) audio: header parse + sample scan implemented
  * on raw bytes, no image/audio libraries. Decoding runs through
  * `mapPartitions` with the exact shape a libjpeg/ffmpeg binding would
  * have (per-partition codec context, bytes -> typed struct, null on
  * malformed input), so swapping in a native codec changes ONE function
  * body and nothing downstream. Transforms (lazy resize, frame slicing)
  * are pure Catalyst expressions.
  *
  * Schema convention for a media column:
  *   payload: binary, media_type: string, meta: struct<...>
  */
object Media {

  /** Wrap a binary payload into the media-column convention. */
  def toMedia(payload: Column, mediaType: Column): Column =
    struct(payload.as("payload"), mediaType.as("media_type"))

  // ---------------------------------------------------------------- PPM

  /** Decoded P6 image: dimensions + exact per-channel byte means (sums
    * are exact longs, one final division — deterministic across runs).
    */
  case class DecodedImage(width: Int, height: Int, maxval: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("maxval", IntegerType), StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType), StructField("mean_b", DoubleType)))

  /** Header scan shared by [[decodePpm]], [[resizePpm]] and the frame
    * demux: (width, height, maxval, ABSOLUTE raster offset), parsing
    * from `start` (so [[splitPpmFrames]] walks a concatenated stream
    * without per-frame suffix copies); None on malformed headers
    * ('#' comments allowed per the spec, exactly ONE whitespace after
    * maxval, then the raster).
    */
  private def parsePpmHeader(bytes: Array[Byte],
      start: Int = 0): Option[(Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < start + 2 ||
      bytes(start) != 'P' || bytes(start + 1) != '6') return None
    var i = start + 2
    def skipWs(): Boolean = {
      var progressed = false
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
          progressed = true
        } else if (c.isWhitespace) { i += 1; progressed = true }
        else go = false
      }
      progressed
    }
    def readInt(): Option[Int] = {
      if (!skipWs()) return None
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        if (v > Int.MaxValue) return None
      }
      if (i == start) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255 &&
        i < bytes.length && bytes(i).toChar.isWhitespace
    } yield { i += 1; (w, h, maxval, i) }
  }

  /** REAL PPM (P6) decode: "P6" <ws> width <ws> height <ws> maxval <one
    * ws> then width*height*3 RGB bytes. Returns None on anything
    * malformed or truncated — the caller sees a null meta, never an
    * exception (a 100 TB scrape WILL contain garbage bytes).
    */
  def decodePpm(bytes: Array[Byte]): Option[DecodedImage] =
    parsePpmHeader(bytes).flatMap { case (w, h, maxval, off) =>
      if (bytes.length - off < 3L * w * h) None
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var p = off
        val end = off + 3 * w * h
        while (p < end) {
          sr += bytes(p) & 0xff; sg += bytes(p + 1) & 0xff
          sb += bytes(p + 2) & 0xff; p += 3
        }
        val n = (w.toLong * h).toDouble
        Some(DecodedImage(w, h, maxval, sr / n, sg / n, sb / n))
      }
    }

  /** MATERIALIZED nearest-neighbor resize of a P6 payload to exactly
    * `w2`×`h2`: source pixel = floor(target·src/dst) on each axis (the
    * top-left-anchor mapping — integer-exact, deterministic, and the
    * identity when w2 == w and h2 == h). Re-encodes a canonical P6
    * header; None on malformed/truncated input or a degenerate target.
    * This is the eager half of [[resizeMeta]]'s lazy plan — the thumb
    * materialization step an embedding pipeline runs right before
    * feature extraction.
    */
  def resizePpm(bytes: Array[Byte], w2: Int, h2: Int): Option[Array[Byte]] =
    parsePpmHeader(bytes).flatMap { case (w, h, maxval, off) =>
      if (bytes.length - off < 3L * w * h || w2 <= 0 || h2 <= 0 ||
        3L * w2 * h2 > Int.MaxValue - 32) None
      else {
        val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + 3 * w2 * h2)
        System.arraycopy(header, 0, out, 0, header.length)
        var q = header.length
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            val p = off + 3 * (sy * w + sx)
            out(q) = bytes(p); out(q + 1) = bytes(p + 1)
            out(q + 2) = bytes(p + 2)
            q += 3; x += 1
          }
          y += 1
        }
        Some(out)
      }
    }

  /** REAL PPM (P6) encode: canonical header + the raw RGB raster —
    * the inverse of [[decodePpm]]/[[ppmRaster]] (byte-exact round trip,
    * MediaSpec-pinned). Raster length must be 3·w·h (rgbrgb…).
    */
  def encodePpm(w: Int, h: Int, maxval: Int, raster: Array[Byte])
      : Array[Byte] = {
    require(w > 0 && h > 0 && maxval > 0 && maxval <= 255,
      "bad PPM dimensions")
    require(raster.length == 3 * w * h,
      s"raster length ${raster.length} != 3*$w*$h")
    val header = s"P6\n$w $h\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + raster.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raster, 0, out, header.length, raster.length)
    out
  }

  /** Parse a P6 payload into its raw channel values (raster order
    * rgbrgb…, each 0..255) — the image twin of [[wavSamples]]; None on
    * malformed/truncated bytes.
    */
  def ppmRaster(bytes: Array[Byte]): Option[Array[Int]] =
    parsePpmHeader(bytes).flatMap { case (w, h, _, off) =>
      val n = 3 * w * h
      if (bytes.length - off < n.toLong) None
      else {
        val arr = new Array[Int](n)
        var k = 0
        while (k < n) { arr(k) = bytes(off + k) & 0xff; k += 1 }
        Some(arr)
      }
    }

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM16 WAV: format fields + exact sample count and RMS
    * (squares summed in exact longs, one sqrt at the end).
    */
  case class DecodedAudio(sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, rms: Double)

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType), StructField("rms", DoubleType)))

  /** REAL WAV (RIFF/PCM16) decode: walks the chunk list, parses the
    * `fmt ` chunk, scans the `data` chunk's little-endian int16 samples.
    * None on malformed/truncated/non-PCM16 input.
    */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= bytes.length && s.indices.forall(k => bytes(off + k) == s(k))
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 44 ||
      !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var out: Option[DecodedAudio] = None
    while (out.isEmpty && off + 8 <= bytes.length) {
      val size = u32(off + 4)
      val body = off + 8
      // Long-width bound: rejects any declared size past the buffer —
      // including the full u32 range — so the later size.toInt is safe
      // (survivors are < bytes.length, an Int).
      if (body + size > bytes.length) return None
      if (tag(off, "fmt ") && size >= 16) {
        val audioFormat = u16(body)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
      } else if (tag(off, "data")) {
        fmt match {
          case Some((ch, rate, bits)) if bits == 16 && ch > 0 =>
            val n = size / 2
            var (p, ss) = (body, 0L)
            val end = body + (n * 2).toInt
            while (p < end) {
              val s = (u16(p) << 16) >> 16 // sign-extend int16
              ss += s.toLong * s; p += 2
            }
            val rms = if (n == 0) 0.0 else math.sqrt(ss.toDouble / n)
            out = Some(DecodedAudio(rate, ch, bits, n, rms))
          case _ => return None // data before fmt, or not PCM16
        }
      }
      off = body + size.toInt + (size.toInt & 1) // chunks are 2-aligned
    }
    out
  }

  /** Encode mono PCM16 samples into a minimal valid WAV container
    * (RIFF + fmt + data, little-endian) — the synthesis half of the
    * real codec path ([[decodeWav]]/[[wavSamples]] parse it back
    * bit-for-bit; L51 round-trips its deterministic "recordings"
    * through this container before extracting features).
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(off: Int, s: String): Unit =
      s.indices.foreach(k => out(off + k) = s(k).toByte)
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Long): Unit = (0 until 4).foreach(k =>
      out(off + k) = ((v >> (8 * k)) & 0xff).toByte)
    put(0, "RIFF"); p32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L); p16(20, 1); p16(22, 1)
    p32(24, sampleRate.toLong); p32(28, sampleRate.toLong * 2)
    p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen.toLong)
    samples.indices.foreach(i => p16(44 + 2 * i, samples(i) & 0xffff))
    out
  }

  /** Parse a PCM16 WAV into its sign-extended samples (interleaved if
    * multi-channel); None on anything [[decodeWav]] would reject — the
    * sample-level read the feature extractors (L51) run on.
    */
  def wavSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= bytes.length && s.indices.forall(k => bytes(off + k) == s(k))
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 44 ||
      !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var off = 12
    var fmtOk = false
    var out: Option[Array[Int]] = None
    while (out.isEmpty && off + 8 <= bytes.length) {
      val size = u32(off + 4)
      val body = off + 8
      if (body + size > bytes.length) return None
      if (tag(off, "fmt ") && size >= 16) {
        if (u16(body) != 1 || u16(body + 14) != 16 || u16(body + 2) == 0)
          return None // PCM16 only, like decodeWav's feature path
        fmtOk = true
      } else if (tag(off, "data")) {
        if (!fmtOk) return None
        val n = (size / 2).toInt
        val arr = new Array[Int](n)
        var (p, k) = (body, 0)
        while (k < n) { arr(k) = (u16(p) << 16) >> 16; p += 2; k += 1 }
        out = Some(arr)
      }
      off = body + size.toInt + (size.toInt & 1)
    }
    out
  }

  // ------------------------------------------------- DataFrame wrappers

  private def decodeWith(df: DataFrame, payloadCol: String, out: String,
      metaSchema: StructType, decode: Array[Byte] => Option[Product]): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add(out, metaSchema, nullable = true)
    // mapPartitions, not a per-row UDF: a real binding initializes its
    // codec context once per PARTITION here (the iterator wrapper is
    // where a native handle would live), and the batch shape survives a
    // swap to Arrow/Pandas execution unchanged.
    df.mapPartitions { it =>
      it.map { row =>
        val meta = decode(row.getAs[Array[Byte]](idx))
          .map(p => Row.fromSeq(p.productIterator.toSeq)).orNull
        Row.fromSeq(row.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a PPM payload column into `out` (null on malformed bytes). */
  def decodeImages(df: DataFrame, payloadCol: String,
      out: String = "image_meta"): DataFrame =
    decodeWith(df, payloadCol, out, imageMetaSchema, decodePpm)

  /** Decode a WAV payload column into `out` (null on malformed bytes). */
  def decodeAudio(df: DataFrame, payloadCol: String,
      out: String = "audio_meta"): DataFrame =
    decodeWith(df, payloadCol, out, audioMetaSchema, decodeWav)

  /** Decode a WAV payload column into its raw sample array (null on
    * malformed bytes) — same mapPartitions batch shape as the decoders.
    */
  def decodeAudioSamples(df: DataFrame, payloadCol: String,
      out: String = "samples"): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add(out, ArrayType(IntegerType),
      nullable = true)
    df.mapPartitions { it =>
      it.map { row =>
        val s = wavSamples(row.getAs[Array[Byte]](idx))
          .map(_.toSeq).orNull
        Row.fromSeq(row.toSeq :+ s)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a PPM payload column into its raw channel-value array (null
    * on malformed bytes) — the image twin of [[decodeAudioSamples]],
    * same mapPartitions batch shape.
    */
  def decodeImagePixels(df: DataFrame, payloadCol: String,
      out: String = "pixels"): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add(out, ArrayType(IntegerType),
      nullable = true)
    df.mapPartitions { it =>
      it.map { row =>
        val s = ppmRaster(row.getAs[Array[Byte]](idx))
          .map(_.toSeq).orNull
        Row.fromSeq(row.toSeq :+ s)
      }
    }(Encoders.row(outSchema))
  }

  /** L59 kernel — per-VIDEO pooled frame embedding over a
    * (doc_id, payload) table of concatenated P6 frames: demux the byte
    * stream by frame headers ([[demuxPpmFrames]]), decode each frame's
    * raster, then SUM-POOL the centered channel values per position
    * across the video's frames — pooled(p) = Σ_k pixel(k, p) − 128·n_k
    * (sum, not mean: cosine is scale-invariant and integer sums stay
    * exactly replayable cross-engine; n_k counted per position, so
    * variable frame sizes pool over the frames that carry the
    * position). Returns (vec_id, embedding: array<float>) — the column
    * the ANN kernels (thresholdCosinePairs / ivfThresholdPairs /
    * topKCosinePairs) consume. THE shared plan under the l59 registry
    * family and the `pooled_frame_embeddings` TVF.
    */
  def pooledFrameEmbeddings(videos: DataFrame): DataFrame = {
    val frames = demuxPpmFrames(videos, "payload")
    decodeImagePixels(frames, "frame_payload")
      .select(col("doc_id"), posexplode(col("pixels")).as(Seq("p", "v")))
      .groupBy("doc_id", "p")
      .agg((sum(col("v").cast("long")) - lit(128L) * count(lit(1)))
        .as("pv"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("p"), col("pv")))).as("ps"))
      .select(col("doc_id").as("vec_id"),
        transform(col("ps"), x => x.getField("pv").cast("float"))
          .as("embedding"))
  }

  /** L60 kernel — per-CLIP pooled audio feature vector over a
    * (doc_id, payload) table of PCM16 WAV clips: parse the container
    * back to samples ([[wavSamples]] — the real byte-level codec, same
    * mapPartitions batch shape as every decoder), then reduce to
    * per-`winLen`-sample windows of the two exact integer features the
    * l51 windowed pass extracts — zero crossings (sign flips, window-
    * boundary transition excluded) and the sample sum (the DC/loudness
    * contour; sums, not means — cosine is scale-invariant and integer
    * sums replay exactly cross-engine) — and interleave them in window
    * order into one feature vector: [c_0, s_0, c_1, s_1, …]. Returns
    * (vec_id, embedding: array<float>) — the column the ANN kernels
    * (thresholdCosinePairs / ivfThresholdPairs) consume; every value
    * is an integer well under 2^24, so the float storage is exact and
    * the double-accumulated cosine matches a DuckDB double replay bit
    * for bit (the l59 discipline on the audio side). THE shared plan
    * under the l60 registry family and the `pooled_audio_features`
    * TVF. Plan: one decode pass, one per-clip lag window (clip-sized
    * partitions), two hash aggregates — nothing wider than the sample
    * explode, which stays inside the partition at 100 TB.
    */
  def pooledAudioFeatures(clips: DataFrame, winLen: Int): DataFrame = {
    // the exactness contract is a REQUIREMENT, not a fixture accident:
    // |window sum| ≤ winLen · 32768 must stay ≤ 2^24 (the float32
    // mantissa edge) for ANY PCM16 input, or the advertised bit-for-bit
    // cross-engine replay silently degrades to approximate
    require(winLen >= 2 && winLen <= 512,
      s"pooledAudioFeatures: winLen must be in [2, 512] (float32-exact " +
        "window sums for PCM16)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("i")
    decodeAudioSamples(clips, "payload")
      .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "smp")))
      .withColumn("prev", lag("smp", 1).over(w))
      .groupBy(col("doc_id"),
        expr(s"CAST(i div $winLen AS BIGINT)").as("win"))
      .agg(
        sum(when(col("i") % winLen =!= 0 &&
            col("prev").cast("long") * col("smp") < 0, 1L)
          .otherwise(0L)).as("crossings"),
        sum(col("smp").cast("long")).as("ssum"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("win"), col("crossings"),
        col("ssum")))).as("ws"))
      .select(col("doc_id").as("vec_id"),
        flatten(transform(col("ws"), x => array(
          x.getField("crossings").cast("float"),
          x.getField("ssum").cast("float")))).as("embedding"))
  }

  /** Materialize nearest-neighbor thumbnails of a PPM payload column
    * into `out` (null on malformed bytes) — same mapPartitions batch
    * shape as the decoders.
    */
  def resizeImages(df: DataFrame, payloadCol: String, w2: Int, h2: Int,
      out: String = "resized_payload"): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema.add(out, BinaryType, nullable = true)
    df.mapPartitions { it =>
      it.map { row =>
        val r = resizePpm(row.getAs[Array[Byte]](idx), w2, h2).orNull
        Row.fromSeq(row.toSeq :+ r)
      }
    }(Encoders.row(outSchema))
  }

  /** Lazy resize: recompute metadata for a target box, preserving aspect
    * ratio (integer math, deterministic) — payload untouched, as a real
    * lazy-resize pipeline would do until materialization.
    */
  def resizeMeta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    // scale = min(maxW/w, maxH/h) in 1e6 fixed point, capped at 1.0
    val scale = least(lit(1000000L),
      least(lit(maxW.toLong * 1000000L) / w, lit(maxH.toLong * 1000000L) / h))
    struct(
      greatest(lit(1), (w * scale / 1000000L).cast("int")).as("width"),
      greatest(lit(1), (h * scale / 1000000L).cast("int")).as("height"))
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

  /** REAL container demux for the concatenated-P6 "video" convention
    * (r16): walk the byte stream, parse each frame's OWN header to find
    * its length, slice the frame out, continue at the next offset — the
    * byte-offset walk an ffmpeg-style demuxer performs. Frame sizes may
    * DIFFER (which [[frameSample]]'s equal-byte-range slicing cannot
    * demux). Stops at the first malformed/truncated frame and returns
    * the frames parsed so far — a scrape's garbage tail truncates,
    * never throws.
    */
  def splitPpmFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var o = 0
    var go = true
    while (go && o < bytes.length) {
      // header parse runs AT the offset (no per-frame suffix copy —
      // the walk stays O(total bytes) however many frames the stream
      // holds); `off` is absolute, per parsePpmHeader's contract
      parsePpmHeader(bytes, o) match {
        case Some((w, h, _, off)) if bytes.length - off >= 3L * w * h =>
          val end = off + 3 * w * h
          out += java.util.Arrays.copyOfRange(bytes, o, end)
          o = end
        case _ => go = false
      }
    }
    out.toSeq
  }

  /** Demux a concatenated-P6 payload column into one row per frame
    * (`frame_idx`, `frame_payload`) — flatMap through the same
    * mapPartitions batch shape as the decoders (per-partition codec
    * context slot; malformed tails simply emit fewer rows).
    */
  def demuxPpmFrames(df: DataFrame, payloadCol: String): DataFrame = {
    require(!df.columns.contains("frame_idx") &&
        !df.columns.contains("frame_payload"),
      "demuxPpmFrames: input already carries frame_idx/frame_payload " +
        "(e.g. frameSample output) — rename or drop them first; the " +
        "demux appends both and duplicate names would poison every " +
        "downstream column reference")
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = df.schema
      .add("frame_idx", IntegerType, nullable = false)
      .add("frame_payload", BinaryType, nullable = true)
    df.mapPartitions { it =>
      it.flatMap { row =>
        splitPpmFrames(row.getAs[Array[Byte]](idx)).zipWithIndex.map {
          case (f, i) => Row.fromSeq(row.toSeq :+ i :+ f)
        }
      }
    }(Encoders.row(outSchema))
  }
}
