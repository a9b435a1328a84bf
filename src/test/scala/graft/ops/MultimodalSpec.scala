package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper
import graft.ops.Multimodal.{MediaCodec, MediaMeta, MediaRow}

/** The multimodal decode PLUMBING, proven codec-agnostic: a probe codec
  * (not FakeCodec) rides the same mapPartitions stage and reports what
  * the harness actually handed it — batch sizes, coverage, order. A real
  * image/video decoder dropped behind MediaCodec inherits exactly these
  * guarantees.
  */
class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** Encodes the observed batch size into each row's n_frames and tags
    * width with a codec id, so executor-side observations come back
    * through the data itself (no shared driver state).
    */
  private object ProbeCodec extends MediaCodec {
    def decode(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { r =>
      MediaMeta(r.doc_id, r.blob.length, width = 7777, height = 1,
        n_frames = batch.size, frame0_digest = "", mid_frame_digest = "")
    }
  }

  test("decode plumbing: full coverage, bounded non-empty batches, any codec") {
    import spark.implicits._
    val n = 1000
    val media = spark.range(0, n)
      .select($"id".as("doc_id"),
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("payload-"),
            $"id".cast("string")), "UTF-8").as("blob"))
      .repartition(7) // uneven split: tail batches must stay non-empty
      .as[MediaRow]

    val out = Multimodal.decodeMedia(media, ProbeCodec).collect()

    // every row decoded exactly once, none invented
    assert(out.length == n)
    assert(out.map(_.doc_id).toSet == (0L until n.toLong).toSet)
    // the probe codec's outputs prove it ran (not FakeCodec)
    assert(out.forall(_.width == 7777))
    // batch contract: non-empty, never exceeding the declared size
    assert(out.forall(m => m.n_frames >= 1 && m.n_frames <= Multimodal.DecodeBatchSize),
      s"batch sizes seen: ${out.map(_.n_frames).distinct.sorted.mkString(",")}")
    // payload bytes crossed the boundary intact
    assert(out.filter(_.doc_id == 42L).head.n_bytes == "payload-42".length)
  }

  test("q44 still decodes through the default FakeCodec seam") {
    val df = graft.SparkEntry.queries("q44_multimodal")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }

  /** A deterministic w×h image: pixel (x, y) = opaque RGB derived from
    * (seed, x, y). Returns (encoded bytes, expected pixel digest).
    */
  private def genImage(seed: Int, w: Int, h: Int, format: String): (Array[Byte], String) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (seed * 31 + x * 7 + y * 13) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    val bytes = bos.toByteArray
    // expected digest from the SAME pixel-read path the codec uses
    // (getRGB returns ARGB ints; PNG/BMP round-trip RGB losslessly)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bb = java.nio.ByteBuffer.allocate(px.length * 4)
    bb.asIntBuffer().put(px)
    val d = java.security.MessageDigest.getInstance("MD5")
    (bytes, d.digest(bb.array()).map("%02x".format(_)).mkString)
  }

  test("ImageIoCodec decodes real PNG/BMP pixels through the same seam") {
    import spark.implicits._
    // mixed-format corpus: the reader is chosen per payload, not per job
    val gen = Seq(
      (1L, genImage(1, 33, 17, "png")),
      (2L, genImage(2, 64, 64, "bmp")),
      (3L, genImage(3, 5, 9, "png")))
    val expected = gen.map { case (id, (_, dig)) => id -> dig }.toMap
    val dims = Map(1L -> (33, 17), 2L -> (64, 64), 3L -> (5, 9))
    val media = gen.map { case (id, (bytes, _)) => MediaRow(id, bytes) }
      .toDS().repartition(2)
    val out = Multimodal.decodeMedia(media, Multimodal.ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    for ((id, (w, h)) <- dims) {
      assert(out(id).width == w && out(id).height == h,
        s"doc $id: got ${out(id).width}x${out(id).height}, want ${w}x$h")
      assert(out(id).n_frames == 1) // still images: one frame
      // digest of the DECODED pixel buffer matches the source pixels —
      // proof the codec read real image data, not payload bytes
      assert(out(id).frame0_digest == expected(id), s"doc $id pixel digest")
      assert(out(id).mid_frame_digest == expected(id))
    }
  }

  test("ImageIoCodec fails loudly on an undecodable payload") {
    val junk = Seq(MediaRow(9L, Array[Byte](1, 2, 3, 4, 5)))
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decode(junk)
    }
    assert(e.getMessage.contains("no JVM image reader"))
  }

  test("WavPcmCodec decodes a hand-built clip exactly, skipping unknown chunks") {
    import Multimodal.{AudioRow, WavPcmCodec}
    // 3 frames, stereo, 8 kHz; samples chosen so every feature is
    // hand-checkable: interleaved [100,-100, 0,200, -300,50]
    val samples = Seq[Short](100, -100, 0, 200, -300, 50)
    val dataLen = samples.length * 2
    // LIST chunk with ODD size inserted BEFORE fmt/data: the walker must
    // skip it and honor the even-byte padding rule to stay aligned
    val listPayload = Array[Byte](73, 78, 70, 79, 1) // "INFO" + 1 byte
    val bb = java.nio.ByteBuffer
      .allocate(12 + 8 + listPayload.length + 1 + 24 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(bb.capacity() - 8).put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload).put(0.toByte) // pad to even
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s))

    val m = WavPcmCodec.decode(Seq(AudioRow(5L, bb.array()))).head
    assert(m.sample_rate == 8000 && m.n_channels == 2 && m.n_frames == 3)
    assert(m.duration_us == 3L * 1000000L / 8000L)
    assert(m.sum_sq == samples.map(s => s.toLong * s).sum)
    assert(m.peak_abs == 300L)
    // sign flips in [100,-100,0,200,-300,50]: at -100, 0, -300, 50 = 4
    assert(m.zero_crossings == 4L)
  }

  test("WavPcmCodec round-trips the q162 synthesis generator") {
    import Multimodal.{AudioRow, WavPcmCodec}
    for (d <- Seq(0L, 1L, 2L, 3L, 17L)) {
      val m = WavPcmCodec.decode(Seq(AudioRow(d, Multimodal.synthWav(d)))).head
      assert(m.n_frames == 200 + (d % 100).toInt)
      assert(m.n_channels == (if (d % 2 == 0) 1 else 2))
      assert(m.sample_rate == 8000 * (1 + (d % 3).toInt))
      val n = m.n_frames * m.n_channels
      val pcm = (0 until n).map(i =>
        ((d * 31 + i) * 2654435761L % 65536L - 32768L))
      assert(m.sum_sq == pcm.map(s => s * s).sum)
      assert(m.peak_abs == pcm.map(math.abs).max)
    }
  }

  test("ImageFeatureCodec: javax.imageio round-trips the q167 BMP generator") {
    import Multimodal.{ImageFeatureCodec, MediaRow}
    for (d <- Seq(0L, 1L, 7L, 29L)) {
      val m = ImageFeatureCodec.decode(Seq(MediaRow(d, Multimodal.synthBmp(d)))).head
      val w = 9 + (d % 6).toInt; val h = 5 + (d % 5).toInt
      assert(m.width == w && m.height == h)
      def v(y: Int, x: Int): Long = (d * 11 + y * 37 + x) % 256
      val all = for (y <- 0 until h; x <- 0 until w) yield (y, x)
      assert(m.sum_b == all.map { case (y, x) => v(y, x) }.sum)
      assert(m.sum_g == all.map { case (y, x) => (v(y, x) + 85) % 256 }.sum)
      // the y-weight uses IMAGE rows (0 = top): a decoder that skipped
      // BMP's bottom-up flip would pass sum_b and fail this
      assert(m.wsum_y_b == all.map { case (y, x) => v(y, x) * (y + 1) }.sum)
    }
    intercept[IllegalArgumentException] {
      Multimodal.ImageFeatureCodec.decode(
        Seq(MediaRow(1L, Array[Byte](9, 9, 9))))
    }
  }

  test("AviDibCodec round-trips the q163 synthesis generator") {
    import Multimodal.{AviDibCodec, VideoRow}
    for (d <- Seq(0L, 1L, 5L, 11L)) {
      val m = AviDibCodec.decode(Seq(VideoRow(d, Multimodal.synthAvi(d)))).head
      val w = 8 + (d % 5).toInt; val h = 6 + (d % 4).toInt
      val nf = 3 + (d % 4).toInt
      assert(m.width == w && m.height == h && m.n_frames == nf)
      assert(m.us_per_frame == 40000 + (d % 3).toInt * 10000)
      def v(f: Int, y: Int, x: Int): Long = (d * 7 + f * 13 + y * 31 + x) % 256
      val all = for (f <- 0 until nf; y <- 0 until h; x <- 0 until w)
        yield (f, y, x)
      assert(m.sum_b == all.map { case (f, y, x) => v(f, y, x) }.sum)
      assert(m.wsum_y_b == all.map { case (f, y, x) => v(f, y, x) * (y + 1) }.sum)
      assert(m.motion_b == all.filter(_._1 > 0).map { case (f, y, x) =>
        math.abs(v(f, y, x) - v(f - 1, y, x)) }.sum)
    }
  }

  test("AviDibCodec reads bottom-up rows: flipping row order changes wsum_y_b only") {
    import Multimodal.{AviDibCodec, VideoRow}
    val d = 2L
    val good = Multimodal.synthAvi(d)
    val m = AviDibCodec.decode(Seq(VideoRow(d, good))).head
    // reverse the rows of every frame IN PLACE: same byte multiset, so
    // channel sums are unchanged — but the y-weighted sum must move,
    // proving the decoder honors DIB's bottom-up storage, not just bytes
    val w = m.width; val h = m.height
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frameBytes = rowBytes * h
    val flipped = good.clone()
    val dataStart = good.length - m.n_frames * (8 + frameBytes)
    for (f <- 0 until m.n_frames; y <- 0 until h) {
      val fo = dataStart + f * (8 + frameBytes) + 8
      System.arraycopy(good, fo + y * rowBytes,
        flipped, fo + (h - 1 - y) * rowBytes, rowBytes)
    }
    val mf = AviDibCodec.decode(Seq(VideoRow(d, flipped))).head
    assert(mf.sum_b == m.sum_b && mf.sum_g == m.sum_g && mf.sum_r == m.sum_r)
    assert(mf.wsum_y_b != m.wsum_y_b,
      "row flip left wsum_y_b unchanged — decoder ignores row orientation")
  }

  test("AviDibCodec fails loudly on malformed containers") {
    import Multimodal.{AviDibCodec, VideoRow}
    val good = Multimodal.synthAvi(3L)
    assert(intercept[IllegalArgumentException] {
      AviDibCodec.decode(Seq(VideoRow(1L, good.take(30))))
    }.getMessage.contains("truncated"))
    val wrongBits = good.clone()
    // strf BITMAPINFOHEADER biBitCount: flip 24 -> 32
    val strfOff = {  // find 'strf' tag
      val idx = (0 until good.length - 4).find(i =>
        good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 'r' && good(i + 3) == 'f').get
      idx + 8 // past id + size
    }
    wrongBits(strfOff + 14) = 32
    assert(intercept[IllegalArgumentException] {
      AviDibCodec.decode(Seq(VideoRow(2L, wrongBits)))
    }.getMessage.contains("24-bit"))
    assert(intercept[IllegalArgumentException] {
      AviDibCodec.decode(Seq(VideoRow(3L, Array[Byte](1, 2))))
    }.getMessage.contains("RIFF"))
  }

  test("WavPcmCodec fails loudly on truncated and non-PCM payloads") {
    import Multimodal.{AudioRow, WavPcmCodec}
    val good = Multimodal.synthWav(4L)
    val truncated = good.take(good.length - 3)
    assert(intercept[IllegalArgumentException] {
      WavPcmCodec.decode(Seq(AudioRow(1L, truncated)))
    }.getMessage.contains("truncated"))
    val nonPcm = good.clone()
    nonPcm(20) = 3 // fmt audioFormat := IEEE float
    assert(intercept[IllegalArgumentException] {
      WavPcmCodec.decode(Seq(AudioRow(2L, nonPcm)))
    }.getMessage.contains("16-bit PCM"))
    assert(intercept[IllegalArgumentException] {
      WavPcmCodec.decode(Seq(AudioRow(3L, Array[Byte](1, 2, 3))))
    }.getMessage.contains("RIFF"))
  }

  test("q189: identical image assets always collide; dHash is stable under re-decode") {
    import spark.implicits._
    // two docs sharing an asset id must produce the SAME dHash through
    // the real decoder (the property the dedup census keys on)
    val pairs = Seq(3L, 3L + 257L, 100L, 100L + 257L)
      .map(d => Multimodal.MediaRow(d, Multimodal.synthBmp(d % 257)))
    val hs = Multimodal.DHashCodec.decode(pairs)
    assert(hs(0).dhash_hi == hs(1).dhash_hi && hs(0).dhash_lo == hs(1).dhash_lo)
    assert(hs(2).dhash_hi == hs(3).dhash_hi && hs(2).dhash_lo == hs(3).dhash_lo)
    // decode is deterministic: a second decode of the same bytes matches
    val again = Multimodal.DHashCodec.decode(pairs)
    assert(hs.map(h => (h.dhash_hi, h.dhash_lo))
      == again.map(h => (h.dhash_hi, h.dhash_lo)))
    // every doc whose ASSET is multiply-referenced must land in a
    // cluster (identical bytes -> identical dHash; perceptual collisions
    // between different assets can only ADD members, never remove)
    import org.apache.spark.sql.functions.{count => fcount, sum => fsum, lit => flit}
    val out = graft.SparkEntry.queries("q189_image_dhash")(spark, "/root/testdata/sf0.001")
    val clustered = out.agg(fsum($"n_docs")).first().getLong(0)
    val sharedAssetDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy(($"doc_id" % 257).as("img")).agg(fcount(flit(1)).as("c"))
      .filter($"c" >= 2).agg(fsum($"c")).first().getLong(0)
    assert(clustered >= sharedAssetDocs,
      s"$clustered docs clustered < $sharedAssetDocs shared-asset docs")
  }

  test("q213: radius sweep nests, r=0 pairs are exact hash collisions") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q213_dhash_radius")(
      spark, "/root/testdata/sf0.001").cache()
    val rows = out.orderBy("radius").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 2, 5, 10))
    // a wider radius only adds pairs and merges more images
    val pairs = rows.map(_.getAs[Long]("n_pairs")).toSeq
    val merged = rows.map(_.getAs[Long]("n_merged")).toSeq
    assert(pairs == pairs.sorted, s"pairs not monotone: $pairs")
    assert(merged == merged.sorted, s"merged not monotone: $merged")
    // the textured generator must actually discriminate: each radius
    // step finds NEW pairs, and r=0 must not already merge everything
    pairs.sliding(2).foreach { case Seq(a, b) => assert(b > a) }
    assert(rows.head.getAs[Double]("retention") > 0.3,
      "radius 0 collapsed the image space - generator lost its texture")
    // r=0 count equals the exact-collision pair count from the codec
    val hs = (0L until 257L)
      .map(i => Multimodal.MediaRow(i, Multimodal.synthBmpTextured(i)))
      .grouped(Multimodal.DecodeBatchSize)
      .flatMap(Multimodal.DHashCodec.decode).toSeq
    val exactPairs = hs.groupBy(h => (h.dhash_hi, h.dhash_lo)).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(rows.head.getAs[Long]("n_pairs") == exactPairs,
      s"r=0 pairs ${rows.head.getAs[Long]("n_pairs")} != codec $exactPairs")
    out.unpersist()
  }
}
