package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper
import graft.table.VersionedTable

/** The DSv2 commit-log connector: batch rows match the table's real
  * history, the short name resolves through META-INF/services on a
  * stock session, and the micro-batch stream emits exactly the versions
  * committed since the last trigger (offsets are versions, so a
  * checkpoint replay re-reads immutable files — no dedup needed).
  */
class TableLogSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def base = {
    import spark.implicits._
    graft.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  test("batch read: one row per version with protocol-accurate counts") {
    import spark.implicits._
    val root = graft.ops.Core.tmp("vt_log_src")
    val t = VersionedTable.create(root, base)       // v0
    t.append(base.limit(7))                         // v1
    t.overwrite(base.limit(3), readVersion = 1L)    // v2
    val h = spark.read.format("graft-table-log").load(root)
      .orderBy("version")
      .select($"version", $"op", $"read_version", $"n_adds", $"n_removes",
        $"rows_added")
      .as[(Long, String, Long, Int, Int, Long)].collect().toSeq
    val n = base.count()
    assert(h == Seq(
      (0L, "create", -1L, 1, 0, n),
      (1L, "append", 0L, 1, 0, 7L),
      (2L, "overwrite", 1L, 1, 2, 3L)))
  }

  test("micro-batch stream: each trigger emits exactly the newly committed versions") {
    import spark.implicits._
    val root = graft.ops.Core.tmp("vt_log_stream")
    val t = VersionedTable.create(root, base) // v0 exists before the stream starts
    val q = spark.readStream.format("graft-table-log").load(root)
      .writeStream.format("memory").queryName("log_feed")
      .option("checkpointLocation", graft.ops.Core.tmp("vt_log_ckpt"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("log_feed").select("version").as[Long].collect().toSet == Set(0L))
      t.append(base.limit(5))  // v1
      t.append(base.limit(2))  // v2
      q.processAllAvailable()
      val seen = spark.table("log_feed")
        .select($"version", $"op").as[(Long, String)].collect().toSet
      assert(seen == Set((0L, "create"), (1L, "append"), (2L, "append")))
      // no duplicates: three versions, three rows
      assert(spark.table("log_feed").count() == 3)
    } finally q.stop()
  }
}
