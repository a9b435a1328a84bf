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
}
