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
  object ImageIoCodec extends MediaCodec {
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_multimodal" -> (multimodal _)
  )

  val oracle: Map[String, String] = Map(
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
        |FROM m ORDER BY doc_id""".stripMargin
  )
}
