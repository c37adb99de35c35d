package graft

import graft.ops.Media

/** The real dependency-free codecs (SURVEY L09): PPM and WAV binaries are
  * SYNTHESIZED byte-for-byte, round-tripped through parquet (binary
  * columns survive storage unchanged), decoded through the mapPartitions
  * wrappers, and checked against the exact dimensions/stats the bytes
  * encode. Malformed payloads must decode to null, never throw.
  */
class MediaSpec extends SparkSpecBase {

  private def ppm(w: Int, h: Int, rgb: (Int, Int, Int),
      header: String = ""): Array[Byte] = {
    val head = if (header.nonEmpty) header else s"P6\n$w $h\n255\n"
    head.getBytes("UTF-8") ++
      Array.fill(w * h)(Array[Byte](rgb._1.toByte, rgb._2.toByte,
        rgb._3.toByte)).flatten
  }

  private def wav(rate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort); bb.putInt(rate)
    bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort)
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(s => bb.putShort(s))
    bb.array()
  }

  test("PPM decode: exact dims and channel means, comments honored, garbage -> null") {
    assert(Media.decodePpm(ppm(3, 2, (1, 2, 3))) ==
      Some(Media.DecodedImage(3, 2, 255, 1.0, 2.0, 3.0)))
    // header comments are part of the P6 spec
    assert(Media.decodePpm(ppm(2, 2, (9, 9, 9),
      header = "P6\n# a comment\n2 2\n255\n")).exists(_.width == 2))
    // truncated raster, wrong magic, empty
    assert(Media.decodePpm(ppm(4, 4, (1, 1, 1)).dropRight(1)).isEmpty)
    assert(Media.decodePpm("P5\n2 2\n255\n".getBytes).isEmpty)
    assert(Media.decodePpm("not an image at all".getBytes).isEmpty)
    assert(Media.decodePpm(Array.emptyByteArray).isEmpty)
  }

  test("PPM resize: exact pixel duplication, identity, top-left pick, garbage -> null") {
    // 2x2 with 4 DISTINCT pixels laid out row-major
    val px = Seq((10, 11, 12), (20, 21, 22), (30, 31, 32), (40, 41, 42))
    val src = "P6\n2 2\n255\n".getBytes("UTF-8") ++
      px.flatMap { case (r, g, b) =>
        Seq(r.toByte, g.toByte, b.toByte) }.toArray
    def raster(bytes: Array[Byte]) = {
      // canonical header is "P6\nW H\n255\n"
      val headerEnd = bytes.indexOf('\n'.toInt,
        bytes.indexOf('\n'.toInt, 3) + 1) + 1
      bytes.drop(headerEnd).map(_ & 0xff).toSeq
    }
    // 2x2 -> 4x4: each source pixel becomes a 2x2 block (floor mapping)
    val up = Media.resizePpm(src, 4, 4).get
    assert(Media.decodePpm(up).exists(d => d.width == 4 && d.height == 4))
    val want = Seq(0, 0, 1, 1).flatMap(r => Seq(0, 0, 1, 1).map(c =>
      px(r * 2 + c))).flatMap { case (r, g, b) => Seq(r, g, b) }
    assert(raster(up) == want)
    // identity resize reproduces the raster byte-for-byte
    assert(raster(Media.resizePpm(src, 2, 2).get) ==
      src.drop("P6\n2 2\n255\n".length).map(_ & 0xff).toSeq)
    // 1x1 picks the top-left pixel (floor anchor)
    assert(raster(Media.resizePpm(src, 1, 1).get) == Seq(10, 11, 12))
    // means survive the re-encode: upscaled means == original means
    assert(Media.decodePpm(up).get.mean_r == Media.decodePpm(src).get.mean_r)
    // malformed / degenerate
    assert(Media.resizePpm(src.dropRight(1), 4, 4).isEmpty)
    assert(Media.resizePpm(src, 0, 4).isEmpty)
    assert(Media.resizePpm("junk".getBytes, 2, 2).isEmpty)
  }

  test("WAV decode: exact format, sample count and RMS; non-PCM16 -> null") {
    // constant amplitude 3 -> RMS exactly 3
    assert(Media.decodeWav(wav(8000, 1, Array.fill[Short](100)(3))) ==
      Some(Media.DecodedAudio(8000, 1, 16, 100, 3.0)))
    // alternating +5/-5 stereo -> RMS exactly 5
    val st = Array.tabulate[Short](64)(i => if (i % 2 == 0) 5 else -5)
    assert(Media.decodeWav(wav(44100, 2, st)) ==
      Some(Media.DecodedAudio(44100, 2, 16, 64, 5.0)))
    // truncated data chunk, bad magic
    assert(Media.decodeWav(wav(8000, 1, Array.fill[Short](10)(1))
      .dropRight(3)).isEmpty)
    assert(Media.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("encodeWav/wavSamples: exact PCM16 round trip incl. the rails; " +
      "garbage and truncated containers rejected") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1234, -4321)
    val bytes = Media.encodeWav(8000, samples)
    assert(Media.wavSamples(bytes).get.toSeq == samples.map(_.toInt).toSeq)
    val meta = Media.decodeWav(bytes).get
    assert((meta.sample_rate, meta.channels, meta.bits_per_sample,
      meta.n_samples) == ((8000, 1, 16, samples.length.toLong)))
    assert(Media.wavSamples("garbage".getBytes("UTF-8")).isEmpty)
    assert(Media.wavSamples(bytes.take(50)).isEmpty) // truncated data
    assert(Media.encodeWav(8000, Array.empty[Short]).length == 44)
    assert(Media.wavSamples(Media.encodeWav(8000, Array.empty[Short]))
      .get.isEmpty)
  }

  test("encodePpm/ppmRaster: exact P6 round trip; truncated/garbage " +
      "rejected; raster == decodePpm's means") {
    val raster = Array.tabulate(3 * 4 * 2)(i => ((i * 37 + 5) % 256).toByte)
    val bytes = Media.encodePpm(4, 2, 255, raster)
    assert(Media.ppmRaster(bytes).get.toSeq ==
      raster.map(_ & 0xff).toSeq)
    // a decode of our own encode parses the same header fields
    val meta = Media.decodePpm(bytes).get
    assert((meta.width, meta.height, meta.maxval) == ((4, 2, 255)))
    val n = (4 * 2).toDouble
    assert(meta.mean_r ==
      raster.indices.filter(_ % 3 == 0).map(raster(_) & 0xff).sum / n)
    // resize identity re-encode reproduces the raster bit-for-bit
    assert(Media.resizePpm(bytes, 4, 2).get.toSeq == bytes.toSeq)
    assert(Media.ppmRaster("garbage".getBytes("UTF-8")).isEmpty)
    assert(Media.ppmRaster(bytes.take(12)).isEmpty) // truncated raster
    intercept[IllegalArgumentException] {
      Media.encodePpm(4, 2, 255, raster.take(5))
    }
  }

  test("decode wrappers: parquet round-trip, mixed good/garbage payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    Seq(
      (1L, ppm(4, 3, (10, 0, 255))),
      (2L, ppm(1, 1, (7, 7, 7))),
      (3L, "corrupt bytes".getBytes("UTF-8"))) // must yield null meta
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$dir/images")
    val img = Media.decodeImages(spark.read.parquet(s"$dir/images"), "payload")
      .select("doc_id", "image_meta.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((img(1L).getInt(1), img(1L).getInt(2)) == ((4, 3)))
    assert((img(1L).getDouble(4), img(1L).getDouble(5),
      img(1L).getDouble(6)) == ((10.0, 0.0, 255.0)))
    assert(img(2L).getInt(1) == 1 && img(2L).getDouble(4) == 7.0)
    assert(img(3L).isNullAt(1)) // garbage decodes to null, not an error

    Seq(
      (1L, wav(16000, 1, Array.fill[Short](50)(4))),
      (2L, "just noise".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$dir/audio")
    val au = Media.decodeAudio(spark.read.parquet(s"$dir/audio"), "payload")
      .select("doc_id", "audio_meta.*")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((au(1L).getInt(1), au(1L).getInt(2), au(1L).getLong(4),
      au(1L).getDouble(5)) == ((16000, 1, 50L, 4.0)))
    assert(au(2L).isNullAt(1))
  }

  test("l09 media pipeline drives the real codec end-to-end on the fixture docs") {
    val out = SparkEntry.queries("l09_media_pipeline")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every doc decoded (no null widths — the synthesized containers are
    // valid), width fixed at 32, 4 frames per doc
    assert(out.forall(r => r.getInt(1) == 32 && r.getInt(2) >= 1))
    assert(out.forall(_.getLong(5) == 4L))
  }

  test("splitPpmFrames: variable-size frame demux is byte-exact; " +
      "truncated tails and garbage stop the walk; demux wrapper explodes") {
    import spark.implicits._
    // three frames of DIFFERENT sizes — an equal-byte-range slicer
    // cannot recover these; the demuxer must parse each header
    val frames = Seq(
      Media.encodePpm(2, 2, 255, Array.tabulate(12)(i => (i * 7).toByte)),
      Media.encodePpm(4, 1, 255, Array.tabulate(12)(i => (i + 100).toByte)),
      Media.encodePpm(1, 3, 255, Array.tabulate(9)(i => (200 - i).toByte)))
    val video = frames.reduce(_ ++ _)
    val got = Media.splitPpmFrames(video)
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, f) =>
      assert(java.util.Arrays.equals(g, f), "frame bytes differ")
    }
    // truncated last frame: the walk returns the intact prefix
    assert(Media.splitPpmFrames(video.dropRight(5)).length == 2)
    // garbage mid-stream stops the walk at the boundary
    val withGarbage = frames(0) ++ "not a frame".getBytes("US-ASCII") ++
      frames(1)
    assert(Media.splitPpmFrames(withGarbage).length == 1)
    assert(Media.splitPpmFrames(Array.emptyByteArray).isEmpty)
    assert(Media.splitPpmFrames(null).isEmpty)

    // DataFrame wrapper: one row per frame with its index; decoded
    // rasters match the originals
    val df = Seq((1L, video)).toDF("doc_id", "payload")
    val rows = Media.decodeImagePixels(
        Media.demuxPpmFrames(df, "payload"), "frame_payload")
      .select("frame_idx", "pixels")
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    assert(rows.keySet == Set(0, 1, 2))
    assert(rows(0) == Array.tabulate(12)(i => (i * 7) & 0xff).toSeq)
    assert(rows(2) == Array.tabulate(9)(i => (200 - i) & 0xff).toSeq)
  }
}
