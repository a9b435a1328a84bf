package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata extraction.
  *
  * Two codecs sit behind one seam: [[Multimodal.ImageIoCodec]] decodes
  * REAL image bytes (javax.imageio — the JDK's own PNG/BMP/GIF/JPEG
  * readers, true dimensions + pixel-buffer digests; MultimodalSpec
  * round-trips generated images through it), and `FakeCodec`, a
  * deterministic arithmetic stand-in that q44's SQL oracle can
  * reproduce (an oracle cannot run a real decoder). Spark-side, what a
  * 100 TB media pipeline needs is codec-independent and tested:
  *   - `BinaryType` columns flowing through scans/joins (blob built via
  *     `encode`, round-tripped via `decode`),
  *   - a typed `mapPartitions` decode stage with explicit micro-batching
  *     (`grouped(64)`) — the Scala analogue of `mapInPandas`: the codec
  *     sees batches, not rows, and runs once per executor partition, so
  *     a real JNI/native decoder would amortize init per batch,
  *   - fixed-size frame segmentation ("video frame sampling") over the
  *     byte stream with per-frame digests.
  *
  * Deliberate non-goal: whole-stage codegen for the decode — a real
  * codec is opaque native code, which is exactly the documented case for
  * `mapPartitions` (preference (d) in the build rules).
  */
object Multimodal {

  /** Input row for the decode stage: media id + opaque payload. */
  final case class MediaRow(doc_id: Long, blob: Array[Byte])

  /** Decoded metadata — the schema a real image decoder would emit. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, frame0_digest: String, mid_frame_digest: String)

  /** The codec seam: everything Spark-side (schema, partitioning, typed
    * mapPartitions, batch shape) is codec-agnostic — a production
    * deployment drops a JNI/JVM decoder behind this trait and touches
    * nothing else. Serializable because the instance ships inside the
    * mapPartitions closure to executors; a native-handle-holding
    * implementation would keep the handle transient and lazily init per
    * executor (the batch interface exists precisely so that init
    * amortizes across rows). MultimodalSpec proves the plumbing honors
    * the contract independently of FakeCodec.
    */
  trait MediaCodec extends Serializable {
    /** Decode one non-empty batch (≤ [[DecodeBatchSize]] rows), one
      * output row per input row, order preserved.
      */
    def decode(batch: Seq[MediaRow]): Seq[MediaMeta]
  }

  /** Rows handed to the codec per call — the micro-batch a vectorized /
    * native decoder amortizes its per-call overhead over.
    */
  val DecodeBatchSize = 64

  /** STUB CODEC. A real implementation would hand `batch` to an image /
    * video library (JNI or pure-JVM) and return true dimensions; the
    * container has none, so dimensions derive deterministically from the
    * payload's md5 — stable, cross-engine reproducible, and shaped like
    * the real thing (init-once-per-batch, vectorized over the batch).
    */
  object FakeCodec extends MediaCodec {
    private def md5hex(b: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(b).map("%02x".format(_)).mkString
    }

    val FrameBytes = 256

    def decode(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { r =>
      val n = r.blob.length
      val seed = java.lang.Long.parseLong(md5hex(r.blob).take(7), 16)
      val nFrames = (n + FrameBytes - 1) / FrameBytes
      val mid = (nFrames - 1) / 2
      def frame(i: Int): Array[Byte] =
        r.blob.slice(i * FrameBytes, math.min((i + 1) * FrameBytes, n))
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        width = (seed % 1280L).toInt + 1,
        height = (seed / 1280L % 720L).toInt + 1,
        n_frames = nFrames,
        frame0_digest = md5hex(frame(0)),
        mid_frame_digest = md5hex(frame(mid)))
    }
  }

  /** REAL pure-JVM image codec over the same seam: javax.imageio (the
    * JDK ships PNG/BMP/GIF/JPEG readers — no native install needed).
    * Returns TRUE pixel dimensions, the container's actual frame count
    * (animated GIFs decode multi-frame), and md5 digests of the decoded
    * ARGB pixel buffers — decode evidence, not payload hashes. One
    * reader instance serves the whole batch (the init-amortization the
    * batch interface exists for). Corrupt or unsupported payloads fail
    * loudly: a media pipeline that silently fabricates metadata for
    * undecodable blobs poisons everything downstream.
    */
  /** ImageIO's default input-stream cache is a DISK cache: every
    * `ImageIO.read` / `createImageInputStream` call materializes a temp
    * FILE (FileCacheImageInputStream) — for a 60k-image partition scan
    * that is 60k temp-file create/delete syscalls, serialized by the
    * filesystem and by the registry lock, and it compounds under
    * executor-thread contention (measured: q213 5.4 s in-suite vs 1.3 s
    * solo). Our payloads are already in-memory byte arrays, so the disk
    * cache buys nothing — switch the JVM to MemoryCacheImageInputStream
    * once per executor (object init runs on first use in each JVM).
    */
  private[ops] object ImageIoTuning {
    def ensure(): Unit = () // forces object init
    javax.imageio.ImageIO.setUseCache(false)
  }

  object ImageIoCodec extends MediaCodec {
    ImageIoTuning.ensure()
    private def md5hex(b: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(b).map("%02x".format(_)).mkString
    }

    private def pixelDigest(img: java.awt.image.BufferedImage): String = {
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val bb = java.nio.ByteBuffer.allocate(px.length * 4)
      bb.asIntBuffer().put(px)
      md5hex(bb.array())
    }

    def decode(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { r =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.blob))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext,
          s"doc ${r.doc_id}: no JVM image reader recognizes this payload")
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          val nFrames = reader.getNumImages(true)
          val first = reader.read(0)
          val mid = reader.read((nFrames - 1) / 2)
          MediaMeta(
            doc_id = r.doc_id,
            n_bytes = r.blob.length,
            width = first.getWidth,
            height = first.getHeight,
            n_frames = nFrames,
            frame0_digest = pixelDigest(first),
            mid_frame_digest = pixelDigest(mid))
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** The decode stage: partition-local, batched, codec-parameterized.
    * This is the seam where a production pipeline swaps in the real
    * codec — the dataflow (one pass, zero shuffle, `grouped` batching)
    * is identical for any [[MediaCodec]].
    */
  def decodeMedia(media: Dataset[MediaRow],
                  codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(codec.decode))
  }

  // ------------------------------------------------------------------
  // Audio modality: the same opaque-binary + batched-decode plumbing,
  // with a REAL container parser (WAV is a pure byte format — no codec
  // library needed, so unlike video this modality needs no stub at all).

  /** Input row for the audio decode stage. */
  final case class AudioRow(doc_id: Long, blob: Array[Byte])

  /** Decoded audio metadata + the features a training-data filter reads:
    * exact integer energy (sum of squared samples), peak amplitude and
    * zero-crossing count over the interleaved PCM stream — silence /
    * clipping / noise gates are thresholds over exactly these.
    */
  final case class AudioMeta(
      doc_id: Long, n_bytes: Int, sample_rate: Int, n_channels: Int,
      bits_per_sample: Int, n_frames: Int, duration_us: Long,
      sum_sq: Long, peak_abs: Long, zero_crossings: Long)

  /** Audio codec seam — same contract as [[MediaCodec]] (batched,
    * order-preserving, loud on undecodable payloads).
    */
  trait AudioCodec extends Serializable {
    def decode(batch: Seq[AudioRow]): Seq[AudioMeta]
  }

  /** REAL WAV/PCM decoder, pure JVM: walks the RIFF chunk list (id,
    * size, payload, even-byte padding — unknown chunks are SKIPPED, as
    * the spec proves with an injected LIST chunk), requires PCM
    * (audioFormat 1) at 16 bits, and decodes little-endian int16
    * samples. Features are exact int64 arithmetic over the decoded
    * samples — no floats anywhere, so the census is bit-stable by
    * construction. Truncated or non-RIFF payloads fail loudly (same
    * rationale as [[ImageIoCodec]]).
    */
  /** Little-endian readers shared by the RIFF-family codecs (WAV, AVI). */
  private object Riff {
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
  }

  object WavPcmCodec extends AudioCodec {
    import Riff.{le16, le32, tag}

    def decode(batch: Seq[AudioRow]): Seq[AudioMeta] = batch.map { r =>
      val b = r.blob
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"doc ${r.doc_id}: not a RIFF/WAVE payload")
      var off = 12
      var fmtOff = -1; var dataOff = -1; var dataLen = 0
      while (off + 8 <= b.length) {
        val id = tag(b, off); val sz = le32(b, off + 4)
        require(off + 8 + sz <= b.length,
          s"doc ${r.doc_id}: truncated $id chunk")
        if (id == "fmt ") fmtOff = off + 8
        else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunks pad to even byte boundaries
      }
      require(fmtOff >= 0 && dataOff >= 0,
        s"doc ${r.doc_id}: missing fmt/data chunk")
      val audioFormat = le16(b, fmtOff)
      val channels = le16(b, fmtOff + 2)
      val rate = le32(b, fmtOff + 4)
      val bits = le16(b, fmtOff + 14)
      require(audioFormat == 1 && bits == 16,
        s"doc ${r.doc_id}: only 16-bit PCM supported (fmt=$audioFormat bits=$bits)")
      val blockAlign = channels * 2
      val nFrames = dataLen / blockAlign
      val nSamples = nFrames * channels
      var i = 0; var sumSq = 0L; var peak = 0L; var zc = 0L
      var prevNeg = false
      while (i < nSamples) {
        val s = le16(b, dataOff + i * 2).toShort.toLong
        sumSq += s * s
        val a = math.abs(s); if (a > peak) peak = a
        val neg = s < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      AudioMeta(r.doc_id, b.length, rate, channels, 16, nFrames,
        nFrames.toLong * 1000000L / rate, sumSq, peak, zc)
    }
  }

  /** Batched audio decode stage — identical dataflow to [[decodeMedia]]. */
  def decodeAudio(media: Dataset[AudioRow],
                  codec: AudioCodec = WavPcmCodec): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(codec.decode))
  }

  /** Deterministic WAV synthesis (canonical 44-byte header + interleaved
    * LE int16 PCM): sample i of doc d is
    * `(d·31 + i)·2654435761 mod 65536 − 32768` — integer arithmetic the
    * SQL oracle replays in closed form, so q162's hash match is proof
    * the DECODER (header walk, fmt parse, LE sample decode) round-trips
    * the generator exactly. Frame count, channel count and sample rate
    * all vary with doc_id so every fmt field is load-bearing.
    */
  private[ops] def synthWav(docId: Long): Array[Byte] = {
    val nFrames = 200 + (docId % 100).toInt
    val channels = if (docId % 2 == 0) 1 else 2
    val rate = 8000 * (1 + (docId % 3).toInt)
    val nSamples = nFrames * channels
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((((docId * 31 + i) * 2654435761L % 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  // ------------------------------------------------------------------
  // Image modality, oracle-proven: q44 exercises the seam with the
  // oracle-reproducible FakeCodec and MultimodalSpec drives ImageIoCodec
  // on real PNG/BMP pixels — q167 closes the loop by putting the REAL
  // JDK decoder behind an oracle: a deterministic 24-bit BMP per
  // document, decoded by javax.imageio, reduced to closed-form integer
  // features the SQL oracle replays without touching a byte. The hash
  // match certifies the decoder's header parse, bottom-up row handling
  // and BGR channel order — the image twin of q162 (audio) / q163
  // (video).

  /** Decoded image features: exact int64 channel sums + a y-weighted
    * blue sum in IMAGE coordinates (y=0 is the TOP row), which a decoder
    * that ignores BMP's bottom-up storage gets wrong.
    */
  final case class ImageFeat(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      sum_b: Long, sum_g: Long, sum_r: Long, wsum_y_b: Long)

  /** Image-feature codec seam (same batched contract). */
  trait ImageCodec extends Serializable {
    def decode(batch: Seq[MediaRow]): Seq[ImageFeat]
  }

  /** Real decode through javax.imageio (same reader family as
    * [[ImageIoCodec]]), reduced to integer features via `getRGB` in
    * image coordinates. Undecodable payloads fail loudly.
    */
  object ImageFeatureCodec extends ImageCodec {
    ImageIoTuning.ensure()
    def decode(batch: Seq[MediaRow]): Seq[ImageFeat] = batch.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.blob))
      require(img != null, s"doc ${r.doc_id}: no JVM image reader decodes this payload")
      val w = img.getWidth; val h = img.getHeight
      var sumB = 0L; var sumG = 0L; var sumR = 0L; var wsumYB = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val pB = p & 0xff; val pG = (p >> 8) & 0xff; val pR = (p >> 16) & 0xff
          sumB += pB; sumG += pG; sumR += pR
          wsumYB += pB.toLong * (y + 1)
          x += 1
        }
        y += 1
      }
      ImageFeat(r.doc_id, r.blob.length, w, h, sumB, sumG, sumR, wsumYB)
    }
  }

  /** Batched image-feature decode stage. */
  def decodeImages(media: Dataset[MediaRow],
                   codec: ImageCodec = ImageFeatureCodec): Dataset[ImageFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(codec.decode))
  }

  /** Deterministic 24-bit BMP synthesis (14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up padded BGR rows). The blue value at
    * IMAGE coordinates (x, y) — y=0 the top row — is
    * `(d·11 + y·37 + x) mod 256` (green/red offset 85/170); the
    * generator stores image row y at buffer row (h−1−y) as BI_RGB
    * mandates, so a decoder that skips the flip fails the y-weighted
    * oracle column.
    */
  private[ops] def synthBmp(docId: Long): Array[Byte] = {
    val w = 9 + (docId % 6).toInt
    val h = 5 + (docId % 5).toInt
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataLen = rowBytes * h
    val total = 14 + 40 + dataLen
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(total)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // bottom-up: buffer starts with the LAST image row
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val v = ((docId * 11 + row * 37 + x) % 256).toInt
        bb.put(v.toByte).put(((v + 85) % 256).toByte)
          .put(((v + 170) % 256).toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  /** q213's textured variant of synthBmp: the linear-ramp pattern gives
    * every image an almost-constant dHash (x-gradient sign is fixed), so
    * a radius sweep over it saturates instantly; the quadratic + cross
    * term makes gradient signs vary with (x, y, img) and the hash space
    * spread. Same header/geometry as synthBmp, same oracle-replayable
    * integer pixel arithmetic.
    */
  private[ops] def synthBmpTextured(docId: Long): Array[Byte] = {
    val w = 9 + (docId % 6).toInt
    val h = 5 + (docId % 5).toInt
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataLen = rowBytes * h
    val total = 14 + 40 + dataLen
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(total)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val v = ((docId * 11 + row * 37 + x * x * 7 + x * row * 13) % 256).toInt
        bb.put(v.toByte).put(((v + 85) % 256).toByte)
          .put(((v + 170) % 256).toByte)
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  // q167: image feature census through the REAL JDK image decoder — see
  // the section comment above. Zero-shuffle batched decode, exact int64
  // features, closed-form oracle.
  private def imageCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[Long]
      .map(d => MediaRow(d, synthBmp(d)))
    decodeImages(media).toDF().orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Video modality: a REAL container parser here too — AVI is RIFF with
  // nested LISTs, and uncompressed 24-bit DIB frames are pure byte
  // layout (bottom-up BGR rows padded to 4 bytes), so like WAV the
  // modality needs no native library and no stub.

  /** Input row for the video decode stage. */
  final case class VideoRow(doc_id: Long, blob: Array[Byte])

  /** Decoded video metadata + exact-integer frame features: per-channel
    * pixel sums (brightness censuses), a y-weighted blue sum (proves the
    * decoder reconstructs the bottom-up row orientation, not just the
    * byte multiset) and total inter-frame blue delta (temporal motion
    * energy — proves frame ORDER survives the movi walk).
    */
  final case class VideoMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int,
      us_per_frame: Int, sum_b: Long, sum_g: Long, sum_r: Long,
      wsum_y_b: Long, motion_b: Long)

  /** Video codec seam — same batched contract as the other modalities. */
  trait VideoCodec extends Serializable {
    def decode(batch: Seq[VideoRow]): Seq[VideoMeta]
  }

  /** REAL AVI parser for uncompressed 24-bit DIB video, pure JVM: walks
    * the RIFF tree (LIST chunks recurse — `hdrl` holds `avih` and the
    * stream's `strh`/`strf`, `movi` holds the frames), validates the
    * BITMAPINFOHEADER (24-bit, BI_RGB), and decodes each `00db`/`00dc`
    * frame's bottom-up BGR rows with 4-byte row padding. All features
    * are exact int64 sums over decoded channel values. Malformed
    * containers (missing lists, truncated chunks, compressed or non-24-
    * bit formats) fail loudly, same contract as the other codecs.
    */
  object AviDibCodec extends VideoCodec {
    import Riff.{le16, le32, tag}

    /** Collect (id, payloadOffset, size) of every chunk in [from, to),
      * flattening LIST chunks with their 4-byte type prepended to the id
      * as "LIST:type" and recursing into their payloads.
      */
    private def chunks(b: Array[Byte], from: Int, to: Int,
                       docId: Long): Seq[(String, Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
      var off = from
      while (off + 8 <= to) {
        val id = tag(b, off); val sz = le32(b, off + 4)
        require(off + 8 + sz <= to, s"doc $docId: truncated $id chunk")
        if (id == "LIST") {
          val listType = tag(b, off + 8)
          out += (("LIST:" + listType, off + 12, sz - 4))
          out ++= chunks(b, off + 12, off + 8 + sz, docId)
        } else out += ((id, off + 8, sz))
        off += 8 + sz + (sz & 1)
      }
      out.toSeq
    }

    def decode(batch: Seq[VideoRow]): Seq[VideoMeta] = batch.map { r =>
      val b = r.blob
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ",
        s"doc ${r.doc_id}: not a RIFF/AVI payload")
      val cs = chunks(b, 12, b.length, r.doc_id)
      val avih = cs.find(_._1 == "avih")
      val strf = cs.find(_._1 == "strf")
      val movi = cs.find(_._1 == "LIST:movi")
      require(avih.isDefined && strf.isDefined && movi.isDefined,
        s"doc ${r.doc_id}: missing avih/strf/movi")
      val usPerFrame = le32(b, avih.get._2)
      val fo = strf.get._2
      val width = le32(b, fo + 4); val height = le32(b, fo + 8)
      val bitCount = le16(b, fo + 14); val compression = le32(b, fo + 16)
      require(bitCount == 24 && compression == 0,
        s"doc ${r.doc_id}: only uncompressed 24-bit DIB supported " +
          s"(bits=$bitCount compression=$compression)")
      val rowBytes = (width * 3 + 3) / 4 * 4
      val frameBytes = rowBytes * height
      // frames: '##db'/'##dc' chunks inside the movi list, in order
      val frames = cs.filter { case (id, o, sz) =>
        id.length == 4 && (id.endsWith("db") || id.endsWith("dc")) &&
          o >= movi.get._2 && o < movi.get._2 + movi.get._3
      }
      require(frames.nonEmpty, s"doc ${r.doc_id}: movi list holds no frames")
      var sumB = 0L; var sumG = 0L; var sumR = 0L
      var wsumYB = 0L; var motionB = 0L
      var prev: Array[Int] = null
      frames.foreach { case (_, o, sz) =>
        require(sz == frameBytes,
          s"doc ${r.doc_id}: frame chunk $sz bytes, expected $frameBytes")
        val cur = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          val rowOff = o + (height - 1 - y) * rowBytes // bottom-up rows
          var x = 0
          while (x < width) {
            val pB = b(rowOff + x * 3) & 0xff
            val pG = b(rowOff + x * 3 + 1) & 0xff
            val pR = b(rowOff + x * 3 + 2) & 0xff
            sumB += pB; sumG += pG; sumR += pR
            wsumYB += pB.toLong * (y + 1)
            val idx = y * width + x
            cur(idx) = pB
            if (prev != null) motionB += math.abs(pB - prev(idx))
            x += 1
          }
          y += 1
        }
        prev = cur
      }
      VideoMeta(r.doc_id, b.length, width, height, frames.length,
        usPerFrame, sumB, sumG, sumR, wsumYB, motionB)
    }
  }

  /** Batched video decode stage — identical dataflow to the others. */
  def decodeVideo(media: Dataset[VideoRow],
                  codec: VideoCodec = AviDibCodec): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeBatchSize).flatMap(codec.decode))
  }

  /** Deterministic AVI synthesis: a standards-shaped container (hdrl
    * with avih + strl(strh, strf), movi with `00db` DIB frames) whose
    * blue channel at (frame f, row y, col x) is
    * `(d·7 + f·13 + y·31 + x) mod 256` (green/red offset by 85/170) —
    * closed-form integers the SQL oracle replays without touching a
    * byte. Width, height, frame count and frame rate all vary with
    * doc_id so every parsed header field is load-bearing, and rows are
    * written bottom-up with 4-byte padding exactly as BI_RGB mandates.
    */
  private[ops] def synthAvi(docId: Long): Array[Byte] = {
    val w = 8 + (docId % 5).toInt
    val h = 6 + (docId % 4).toInt
    val nf = 3 + (docId % 4).toInt
    val uspf = 40000 + (docId % 3).toInt * 10000
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frameBytes = rowBytes * h
    val moviSize = 4 + nf * (8 + frameBytes)
    val strlSize = 4 + 64 + 48
    val hdrlSize = 4 + 64 + 8 + strlSize
    val total = 12 + 8 + hdrlSize + 8 + moviSize
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { bb.put(s.getBytes("US-ASCII")); () }
    fourcc("RIFF"); bb.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(uspf).putInt(0).putInt(0).putInt(0).putInt(nf).putInt(0)
      .putInt(1).putInt(0).putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(strlSize); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0).putInt(0).putInt(0)
      .putInt(uspf).putInt(1000000) // dwScale/dwRate: fps = rate/scale
      .putInt(0).putInt(nf).putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nf) {
      fourcc("00db"); bb.putInt(frameBytes)
      var row = h - 1 // bottom-up storage order
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = ((docId * 7 + f * 13 + row * 31 + x) % 256).toInt
          bb.put(v.toByte).put(((v + 85) % 256).toByte)
            .put(((v + 170) % 256).toByte)
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    bb.array()
  }

  // q163: video feature census — synthesize an AVI payload per document,
  // decode it through the REAL AviDibCodec, and emit per-clip format
  // fields plus exact-integer frame features (channel sums, orientation-
  // weighted sum, inter-frame motion energy). The oracle replays the
  // pixel formula in closed-form integer SQL, so the hash match proves
  // the container walk, the DIB row orientation AND the frame ordering
  // all round-trip exactly. Same zero-shuffle batched decode shape as
  // q162.
  private def videoCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[Long]
      .map(d => VideoRow(d, synthAvi(d)))
    decodeVideo(media).toDF().orderBy("doc_id")
  }

  // q162: audio feature census — synthesize a WAV payload per document
  // (binary column), decode it through the REAL WavPcmCodec in the
  // batched mapPartitions stage, and emit the per-clip features a
  // corpus filter gates on. The oracle recomputes every value from the
  // synthesis formula in closed-form integer SQL WITHOUT parsing a
  // byte — the hash match holds only if the decoder reconstructs format
  // fields and samples exactly. Scale shape: generate + decode is one
  // zero-shuffle partition-local pass (the repartition spreads the
  // single-split id scan); all features are exact int64.
  private def audioCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[Long]
      .map(d => AudioRow(d, synthWav(d)))
    decodeAudio(media).toDF().orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // q189: perceptual-hash image dedup through the REAL decoder — the
  // multimodal rung of the dedup ladder (q20 exact text / q21 MinHash /
  // q27 embedding): every document carries an image (doc_id mod 257
  // selects the asset, so ~|corpus|/257 distinct images are shared by
  // many docs — the re-hosted-thumbnail case), the JDK decoder
  // (javax.imageio, same reader family q167 certifies) yields pixels,
  // and a 64-bit dHash (difference hash: bit = grayscale(x+1,y) >
  // grayscale(x,y) over an 8x8 grid, rows wrapped mod height) keys the
  // duplicate-cluster census. dHash is the standard cheap perceptual
  // key: identical assets collide exactly, and at 100 TB the hash is
  // computed once per asset next to the bytes (zero-shuffle decode, the
  // 64-bit keys are what shuffles — ~1/10^6 of the media bytes). The
  // oracle replays the closed-form synthetic pixels (synthBmp's
  // generator arithmetic) so the hash match certifies the REAL decode →
  // grayscale → dHash pipeline bit-for-bit.
  final case class ImageHash(doc_id: Long, dhash_hi: Long, dhash_lo: Long)

  /** dHash through javax.imageio in IMAGE coordinates: 8 rows (wrapped
    * mod height), bits compare gray-sum (r+g+b, no division) at x+1 vs
    * x for x in 0..7 — images are >= 9 wide so no x wrap. The 64 bits
    * ship as two 32-bit halves (rows 0-3 low, rows 4-7 high): DuckDB's
    * checked BIGINT shift rejects `1 << 63`, and two exact-int halves
    * keep the oracle in plain arithmetic.
    */
  object DHashCodec extends Serializable {
    ImageIoTuning.ensure()
    def decode(batch: Seq[MediaRow]): Seq[ImageHash] = batch.map { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.blob))
      require(img != null, s"doc ${r.doc_id}: no JVM image reader decodes this payload")
      val w = img.getWidth; val h = img.getHeight
      require(w >= 9, s"doc ${r.doc_id}: dHash grid needs width >= 9, got $w")
      def gs(x: Int, y: Int): Int = {
        val p = img.getRGB(x, y)
        (p & 0xff) + ((p >> 8) & 0xff) + ((p >> 16) & 0xff)
      }
      var lo = 0L; var hi = 0L
      var y = 0
      while (y < 8) {
        val ym = y % h
        var x = 0
        while (x < 8) {
          if (gs(x + 1, ym) > gs(x, ym)) {
            if (y < 4) lo |= 1L << (y * 8 + x)
            else hi |= 1L << ((y - 4) * 8 + x)
          }
          x += 1
        }
        y += 1
      }
      ImageHash(r.doc_id, hi, lo)
    }
  }

  private def imageDhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, dir)
      .select($"doc_id")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[Long]
      .map(d => MediaRow(d, synthBmp(d % 257)))
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(DHashCodec.decode))
    hashed.toDF()
      .groupBy($"dhash_hi", $"dhash_lo")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"dhash_hi", $"dhash_lo")
  }

  // q44: documents.text encoded to a binary payload (stand-in for image
  // bytes), decoded through the batched mapPartitions stage. The oracle
  // reproduces the fake decode arithmetic over the same bytes (ASCII
  // text, so string md5 == payload md5).
  private def multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("blob"))
      // single-file input -> one split; spread the decode stage across
      // executors (a real codec is the expensive part of this pipeline)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[MediaRow]
    decodeMedia(media).toDF().orderBy("doc_id")
  }

  // ---------------------------------------------------------------------
  // q213: perceptual-hash RADIUS sweep — q209's threshold-policy harness
  // for the image modality: q189 dedups at Hamming distance 0 (exact
  // dHash match); real near-dup image dedup picks a RADIUS, and this
  // census prices each candidate r ∈ {0, 2, 5, 10} in merged-image
  // terms (pairs within r, images lost to the smaller-id-survivor
  // rule, retention). The hashes come through the REAL decoder path
  // (BMP bytes → javax.imageio → grayscale → dHash), so the sweep
  // certifies the production pipeline end-to-end, not a hash stub.
  // Scale shape: the pairwise stage runs over the distinct-IMAGE
  // dictionary (257 here; the corpus side collapses by construction),
  // never over documents — at data-scale image counts the banded
  // Hamming search (q165's pigeonhole bands) generates the pairs and
  // the same sweep census consumes them. Exact integer bit counts.
  private def dhashRadiusSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = Tables.documents(s, dir)
      .select($"doc_id")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .as[Long]
      .map(d => MediaRow(d, synthBmpTextured(d % 257)))
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(DHashCodec.decode))
      .toDF()
    val imgs = hashed.withColumn("img", $"doc_id" % 257)
      .groupBy($"img")
      .agg(min($"dhash_hi").as("hi"), min($"dhash_lo").as("lo"))
    val pairs = imgs.as("a").join(imgs.as("b"), $"a.img" < $"b.img")
      .select($"a.img".as("img_a"), $"b.img".as("img_b"),
        (expr("bit_count(a.hi ^ b.hi)") + expr("bit_count(a.lo ^ b.lo)"))
          .as("hd"))
    val tot = imgs.agg(count(lit(1)).as("n_imgs"))
    pairs.crossJoin(broadcast(Seq(0, 2, 5, 10).toDF("radius")))
      .groupBy($"radius")
      .agg(sum(when($"hd" <= $"radius", 1L).otherwise(0L)).as("n_pairs"),
        count_distinct(when($"hd" <= $"radius", $"img_b")).as("n_merged"))
      .crossJoin(broadcast(tot))
      .select($"radius", $"n_pairs", $"n_merged", $"n_imgs",
        graft.ops.Num.roundAt(($"n_imgs" - $"n_merged").cast("double") /
          $"n_imgs".cast("double"), 6).as("retention"))
      .orderBy($"radius")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q213_dhash_radius" -> (dhashRadiusSweep _),
    "q44_multimodal" -> (multimodal _),
    "q162_audio_census" -> (audioCensus _),
    "q163_video_census" -> (videoCensus _),
    "q167_image_census" -> (imageCensus _),
    "q189_image_dhash" -> (imageDhashDedup _)
  )

  val oracle: Map[String, String] = Map(
    "q213_dhash_radius" ->
      """WITH imgs0 AS (SELECT DISTINCT doc_id % 257 AS img FROM documents),
        |e AS (
        |  SELECT img, x, y, y % (5 + img % 5) AS ym
        |  FROM imgs0, (SELECT unnest(range(0, 8)) AS y),
        |       (SELECT unnest(range(0, 8)) AS x)),
        |gg AS (
        |  SELECT img, x, y,
        |         (img * 11 + ym * 37 + x * x * 7 + x * ym * 13) % 256 AS a0,
        |         (img * 11 + ym * 37 + (x + 1) * (x + 1) * 7
        |           + (x + 1) * ym * 13) % 256 AS a1
        |  FROM e),
        |bits AS (
        |  SELECT img, y,
        |         CASE WHEN (a1 + (a1 + 85) % 256 + (a1 + 170) % 256)
        |                 > (a0 + (a0 + 85) % 256 + (a0 + 170) % 256)
        |              THEN CAST(1 AS BIGINT) << CAST((y % 4) * 8 + x AS INTEGER)
        |              ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM gg),
        |hash AS (
        |  SELECT img,
        |         CAST(sum(CASE WHEN y >= 4 THEN bit ELSE 0 END) AS BIGINT)
        |           AS hi,
        |         CAST(sum(CASE WHEN y < 4 THEN bit ELSE 0 END) AS BIGINT)
        |           AS lo
        |  FROM bits GROUP BY 1),
        |pr AS (
        |  SELECT a.img AS img_a, b.img AS img_b,
        |         CAST(bit_count(xor(a.hi, b.hi))
        |           + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hd
        |  FROM hash a JOIN hash b ON a.img < b.img),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_imgs FROM hash),
        |sw AS (
        |  SELECT radius,
        |         CAST(sum(CASE WHEN hd <= radius THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_pairs,
        |         CAST(count(DISTINCT CASE WHEN hd <= radius THEN img_b END)
        |           AS BIGINT) AS n_merged
        |  FROM pr, (SELECT unnest([0, 2, 5, 10]) AS radius)
        |  GROUP BY 1)
        |SELECT radius, n_pairs, n_merged, n_imgs,
        |       round(CAST(n_imgs - n_merged AS DOUBLE)
        |         / CAST(n_imgs AS DOUBLE), 6) AS retention
        |FROM sw, tot ORDER BY radius""".stripMargin,
    // replays synthBmp's generator arithmetic (v = (img*11 + y*37 + x)
    // mod 256, channel offsets 85/170, height 5 + img mod 5) — the Spark
    // side decodes REAL BMP bytes through javax.imageio, so the hash
    // match certifies decode -> grayscale -> dHash end to end
    "q189_image_dhash" ->
      """WITH imgs AS (SELECT DISTINCT doc_id % 257 AS img FROM documents),
        |e AS (
        |  SELECT img, x, y, y % (5 + img % 5) AS ym
        |  FROM imgs, (SELECT unnest(range(0, 8)) AS y),
        |       (SELECT unnest(range(0, 8)) AS x)),
        |gg AS (
        |  SELECT img, x, y,
        |         (img * 11 + ym * 37 + x) % 256 AS a0,
        |         (img * 11 + ym * 37 + x + 1) % 256 AS a1
        |  FROM e),
        |bits AS (
        |  SELECT img, y,
        |         CASE WHEN (a1 + (a1 + 85) % 256 + (a1 + 170) % 256)
        |                 > (a0 + (a0 + 85) % 256 + (a0 + 170) % 256)
        |              THEN CAST(1 AS BIGINT) << CAST((y % 4) * 8 + x AS INTEGER)
        |              ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM gg),
        |hash AS (
        |  SELECT img,
        |         CAST(sum(CASE WHEN y >= 4 THEN bit ELSE 0 END) AS BIGINT)
        |           AS dhash_hi,
        |         CAST(sum(CASE WHEN y < 4 THEN bit ELSE 0 END) AS BIGINT)
        |           AS dhash_lo
        |  FROM bits GROUP BY 1)
        |SELECT dhash_hi, dhash_lo, count(*) AS n_docs,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM (SELECT doc_id, doc_id % 257 AS img FROM documents) d
        |JOIN hash USING (img)
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY dhash_hi, dhash_lo""".stripMargin,
    "q44_multimodal" ->
      """WITH m AS (
        |  SELECT doc_id, text, length(text) AS n,
        |         CAST(concat('0x', substring(md5(text), 1, 7)) AS BIGINT) AS seed,
        |         CAST(ceil(length(text) / 256.0) AS INTEGER) AS n_frames
        |  FROM documents)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
        |       CAST(seed % 1280 + 1 AS INTEGER) AS width,
        |       CAST(seed // 1280 % 720 + 1 AS INTEGER) AS height,
        |       n_frames,
        |       md5(substring(text, 1, 256)) AS frame0_digest,
        |       md5(substring(text, ((n_frames - 1) // 2) * 256 + 1, 256)) AS mid_frame_digest
        |FROM m ORDER BY doc_id""".stripMargin,
    "q162_audio_census" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(200 + doc_id % 100 AS BIGINT) AS nf,
        |         CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |           AS ch,
        |         CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS rate
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, nf, ch, rate,
        |         list_transform(range(0, nf * ch),
        |           i -> (doc_id * 31 + i) * 2654435761 % 65536 - 32768)
        |           AS pcm
        |  FROM d)
        |SELECT doc_id,
        |       CAST(44 + nf * ch * 2 AS INTEGER) AS n_bytes,
        |       CAST(rate AS INTEGER) AS sample_rate,
        |       CAST(ch AS INTEGER) AS n_channels,
        |       16 AS bits_per_sample,
        |       CAST(nf AS INTEGER) AS n_frames,
        |       CAST(nf * 1000000 // rate AS BIGINT) AS duration_us,
        |       CAST(list_reduce(list_transform(pcm, x -> x * x),
        |         (a, x) -> a + x) AS BIGINT) AS sum_sq,
        |       CAST(list_reduce(list_transform(pcm, x -> abs(x)),
        |         (a, x) -> greatest(a, x)) AS BIGINT) AS peak_abs,
        |       CAST(len(list_filter(range(2, len(pcm) + 1),
        |         i -> (pcm[i] < 0) != (pcm[i - 1] < 0))) AS BIGINT)
        |         AS zero_crossings
        |FROM s ORDER BY doc_id""".stripMargin,
    "q163_video_census" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         8 + doc_id % 5 AS w, 6 + doc_id % 4 AS h,
        |         3 + doc_id % 4 AS nf,
        |         CAST(40000 + (doc_id % 3) * 10000 AS INTEGER) AS uspf
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, w, h, nf, uspf,
        |         ((w * 3 + 3) // 4) * 4 AS rb,
        |         list_transform(range(0, nf * h * w), i ->
        |           (doc_id * 7 + (i // (h * w)) * 13
        |             + ((i % (h * w)) // w) * 31 + i % w) % 256) AS vb,
        |         list_transform(range(0, nf * h * w),
        |           i -> ((i % (h * w)) // w) + 1) AS yw,
        |         list_transform(range(0, (nf - 1) * h * w), i ->
        |           abs((doc_id * 7 + ((i // (h * w)) + 1) * 13
        |                 + ((i % (h * w)) // w) * 31 + i % w) % 256
        |             - (doc_id * 7 + (i // (h * w)) * 13
        |                 + ((i % (h * w)) // w) * 31 + i % w) % 256)) AS mv
        |  FROM d)
        |SELECT doc_id,
        |       CAST(224 + nf * (8 + rb * h) AS INTEGER) AS n_bytes,
        |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(nf AS INTEGER) AS n_frames, uspf AS us_per_frame,
        |       CAST(list_reduce(vb, (a, x) -> a + x) AS BIGINT) AS sum_b,
        |       CAST(list_reduce(list_transform(vb, v -> (v + 85) % 256),
        |         (a, x) -> a + x) AS BIGINT) AS sum_g,
        |       CAST(list_reduce(list_transform(vb, v -> (v + 170) % 256),
        |         (a, x) -> a + x) AS BIGINT) AS sum_r,
        |       CAST(list_reduce(list_transform(range(1, len(vb) + 1),
        |         i -> vb[i] * yw[i]), (a, x) -> a + x) AS BIGINT) AS wsum_y_b,
        |       CAST(list_reduce(mv, (a, x) -> a + x) AS BIGINT) AS motion_b
        |FROM m ORDER BY doc_id""".stripMargin,
    "q167_image_census" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         9 + doc_id % 6 AS w, 5 + doc_id % 5 AS h
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, w, h,
        |         ((w * 3 + 3) // 4) * 4 AS rb,
        |         list_transform(range(0, h * w), i ->
        |           (doc_id * 11 + (i // w) * 37 + i % w) % 256) AS vb,
        |         list_transform(range(0, h * w), i -> (i // w) + 1) AS yw
        |  FROM d)
        |SELECT doc_id,
        |       CAST(54 + rb * h AS INTEGER) AS n_bytes,
        |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(list_reduce(vb, (a, x) -> a + x) AS BIGINT) AS sum_b,
        |       CAST(list_reduce(list_transform(vb, v -> (v + 85) % 256),
        |         (a, x) -> a + x) AS BIGINT) AS sum_g,
        |       CAST(list_reduce(list_transform(vb, v -> (v + 170) % 256),
        |         (a, x) -> a + x) AS BIGINT) AS sum_r,
        |       CAST(list_reduce(list_transform(range(1, len(vb) + 1),
        |         i -> vb[i] * yw[i]), (a, x) -> a + x) AS BIGINT) AS wsum_y_b
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
