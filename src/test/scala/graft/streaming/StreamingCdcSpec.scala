package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Streaming CDC apply (CdcApply): a 3-file change feed replayed one
  * file per micro-batch must converge to the same snapshot as applying
  * the same changes in one batch MERGE (q62's core). The three batches
  * touch DISJOINT key sets, so the expected end state is well-defined
  * independent of micro-batch order.
  */
class StreamingCdcSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def writeChangeFile(df: DataFrame, outDir: String, name: String): Unit = {
    val staging = graft.ops.Core.tmp("cdc_stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val listing = Files.list(Paths.get(staging))
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.createDirectories(Paths.get(outDir))
    Files.move(part, Paths.get(outDir, name))
  }

  test("streaming foreachBatch merge converges to the one-shot batch merge") {
    import spark.implicits._
    val base = graft.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal")

    val updates = base.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey", lit("U").as("op"),
        lit(null).cast("string").as("new_name"),
        ($"c_acctbal" + 100.0).as("new_bal"))
    val deletes = base.filter($"c_custkey" % 7 === 3 && $"c_custkey" % 10 =!= 0)
      .select($"c_custkey", lit("D").as("op"),
        lit(null).cast("string").as("new_name"),
        lit(null).cast("double").as("new_bal"))
    val inserts = base.filter($"c_custkey" % 13 === 1)
      .select(($"c_custkey" + 100000).as("c_custkey"), lit("I").as("op"),
        concat(lit("Customer#new"), $"c_custkey".cast("string")).as("new_name"),
        lit(1000.0).as("new_bal"))

    val feedDir = graft.ops.Core.tmp("cdc_feed")
    writeChangeFile(updates, feedDir, "b0.parquet")
    writeChangeFile(deletes, feedDir, "b1.parquet")
    writeChangeFile(inserts, feedDir, "b2.parquet")

    val streamed = CdcApply.run(spark, base, feedDir)

    // one-shot expectation: the same disjoint change set in a single merge
    val expected = CdcApply.mergeBatch(base,
      updates.unionAll(deletes).unionAll(inserts))

    val a = streamed.orderBy("c_custkey").collect()
    val b = expected.orderBy("c_custkey").collect()
    assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    assert(a.sameElements(b), "streamed snapshot != one-shot merge")

    // sanity: deletes removed, inserts present, an update took effect
    val keys = streamed.select("c_custkey").as[Long].collect().toSet
    assert(!keys.exists(k => k % 7 == 3 && k % 10 != 0 && k < 100000))
    assert(keys.exists(_ >= 100000))
    streamed.unpersist()
  }

  test("checkpointed restart applies only files that arrived since (exactly-once resume)") {
    import spark.implicits._
    val base = graft.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_acctbal")

    val upd1 = base.filter($"c_custkey" % 10 === 0)
      .select($"c_custkey", lit("U").as("op"),
        lit(null).cast("string").as("new_name"),
        ($"c_acctbal" + 100.0).as("new_bal"))
    val upd2 = base.filter($"c_custkey" % 10 === 5)
      .select($"c_custkey", lit("U").as("op"),
        lit(null).cast("string").as("new_name"),
        ($"c_acctbal" + 7.0).as("new_bal"))

    val feedDir = graft.ops.Core.tmp("cdc_feed_cp")
    val cpDir = graft.ops.Core.tmp("cdc_checkpoint")
    writeChangeFile(upd1, feedDir, "b0.parquet")

    val after1 = CdcApply.run(spark, base, feedDir, "cdc_cp_run1", Some(cpDir))
    // a NON-idempotent change (+100) applied twice would show here: the
    // restart must not replay b0
    writeChangeFile(upd2, feedDir, "b1.parquet")
    val after2 = CdcApply.run(spark, after1, feedDir, "cdc_cp_run2", Some(cpDir))

    val expected = CdcApply.mergeBatch(CdcApply.mergeBatch(base, upd1), upd2)
    val a = after2.orderBy("c_custkey").collect()
    val b = expected.orderBy("c_custkey").collect()
    assert(a.sameElements(b), "restart replayed or skipped a change file")
    after2.unpersist()
  }
}
