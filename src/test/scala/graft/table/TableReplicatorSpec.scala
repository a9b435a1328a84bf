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

  test("mid-batch crash: replay from a stale checkpoint is deduped by the txn cursor") {
    import spark.implicits._
    val srcRoot = graft.ops.Core.tmp("repl2_src")
    val tgtRoot = graft.ops.Core.tmp("repl2_tgt")
    val ckpt = graft.ops.Core.tmp("repl2_ckpt")
    val ckptStale = graft.ops.Core.tmp("repl2_ckpt_stale")
    val src = VersionedTable.create(srcRoot, base) // v0

    val q = TableReplicator.start(spark, srcRoot, tgtRoot, ckpt)
    try q.processAllAvailable() finally q.stop()

    // freeze the checkpoint BEFORE the next commit lands: restarting
    // from this copy later is exactly the crash window between the
    // target's commit and the engine's checkpoint write — the v1 batch
    // will be replayed against a target that already applied it
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(ckpt), new java.io.File(ckptStale))

    src.append(base.limit(5).select($"c_custkey" + 800000 as "c_custkey",
      $"c_name", $"c_acctbal")) // v1
    val q2 = TableReplicator.start(spark, srcRoot, tgtRoot, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val applied = VersionedTable.open(tgtRoot)
    val nVersions = applied.latestVersion
    val nRows = applied.snapshot(spark).count()
    assert(applied.lastTxnId.contains(1L))

    // "restart after the crash": stale checkpoint replays v1's batch
    val q3 = TableReplicator.start(spark, srcRoot, tgtRoot, ckptStale)
    try q3.processAllAvailable() finally q3.stop()
    val tgt = VersionedTable.open(tgtRoot)
    // no duplicate append: no new target commit, same rows, cursor fixed
    assert(tgt.latestVersion == nVersions,
      s"replayed batch re-committed: ${tgt.latestVersion} != $nVersions")
    assert(tgt.snapshot(spark).count() == nRows)
    assert(tgt.lastTxnId.contains(1L))
    assertSame(tgt.snapshot(spark), src.snapshot(spark))
  }
}
