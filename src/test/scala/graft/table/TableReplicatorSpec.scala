package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Incremental replication off the commit-log stream: the target must
  * converge to the source snapshot across appends and rewrites, skip
  * layout-only commits, and resume from a checkpoint after a restart
  * without double-applying (txn cursor + engine offsets).
  */
class TableReplicatorSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def base = {
    import spark.implicits._
    graft.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "replica diverged from source")
  }

  test("replica converges across append, merge, optimize and restart") {
    import spark.implicits._
    val srcRoot = graft.ops.Core.tmp("repl_src")
    val tgtRoot = graft.ops.Core.tmp("repl_tgt")
    val ckpt = graft.ops.Core.tmp("repl_ckpt")
    val src = VersionedTable.create(srcRoot, base) // v0

    val q = TableReplicator.start(spark, srcRoot, tgtRoot, ckpt)
    try {
      q.processAllAvailable()
      assertSame(VersionedTable.open(tgtRoot).snapshot(spark), src.snapshot(spark))

      src.append(base.limit(7).select($"c_custkey" + 900000 as "c_custkey",
        $"c_name", $"c_acctbal")) // v1: content
      src.optimize(spark, $"c_custkey", nBuckets = 2,
        readVersion = src.latestVersion) // v2: layout-only
      q.processAllAvailable()
      val tgt = VersionedTable.open(tgtRoot)
      assertSame(tgt.snapshot(spark), src.snapshot(spark))
      // the layout-only commit was skipped: cursor stops at the append
      assert(tgt.lastTxnId.contains(1L))
      // and the append arrived AS an append (no full re-ship)
      assert(tgt.commitInfo(tgt.latestVersion)._1 == "append")
    } finally q.stop()

    // offline commits while the stream is down: a delete-merge (rewrite)
    val dels = base.limit(3).select($"c_custkey", lit("D").as("op"),
      lit(null).cast("string").as("new_name"),
      lit(null).cast("double").as("new_bal"))
    src.merge(spark, dels, readVersion = src.latestVersion) // v3

    // restart from the same checkpoint: only v3 applies, exactly once
    val q2 = TableReplicator.start(spark, srcRoot, tgtRoot, ckpt)
    try {
      q2.processAllAvailable()
      val tgt = VersionedTable.open(tgtRoot)
      assertSame(tgt.snapshot(spark), src.snapshot(spark))
      assert(tgt.lastTxnId.contains(3L))
    } finally q2.stop()
  }
}
