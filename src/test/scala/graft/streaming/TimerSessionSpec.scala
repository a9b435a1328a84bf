package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The event-time TIMER contract of TimerSessionizer, batch-by-batch —
  * the paths the q332 oracle row (one data arrival + closing tick)
  * cannot isolate: a session EXTENDING across micro-batches, an in-band
  * (data-driven) close, and a timer firing with no further input for
  * its key.
  */
class TimerSessionSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tmp(): String =
    Files.createTempDirectory("timer_sess").toString

  test("sessions merge across batches, close in-band on visible gaps, and close by timer on silence") {
    import spark.implicits._
    val dir = tmp()
    val t0 = 1700000000L // epoch seconds
    def ev(rows: (Long, Long)*) = rows.toDF("user_id", "off")
      .select($"user_id", timestamp_seconds(lit(t0) + $"off").as("ts"))

    // wave 1: user 1 open (2 events), user 2 open (1 event) — the
    // wave's max event time stays under every expiry, so the GLOBAL
    // watermark (one per query, not per key) closes nothing yet
    ev((1L, 0L), (1L, 600L), (2L, 0L))
      .write.format("graft-columnar").mode("overwrite").save(dir)

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = spark.readStream.format("graft-columnar").load(dir)
      .withWatermark("ts", "0 seconds")
      .select($"user_id", unix_micros($"ts").as("ts_us"))
      .as[TimerSessionizer.Ev]
    val q = in.groupByKey(_.user_id)
      .transformWithState(
        new TimerSessionizer.SessionProcessor(1800000000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.outputMode("append").format("memory")
      .queryName("timer_sess_spec")
      .option("checkpointLocation", tmp())
      .start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("timer_sess_spec").collect()
      // nothing closed: no in-band gap, watermark below every expiry
      assert(after1.isEmpty,
        s"unexpected emissions after wave 1: ${after1.mkString(",")}")

      // wave 2: user 1 extends within the gap (cross-batch merge);
      // user 3 arrives with an IN-BAND 2-hour gap (first session closes
      // on data); the sentinel tick 5h out advances the watermark past
      // every timer — user 2's close is timer-driven with ZERO wave-2
      // rows for that key
      ev((1L, 1200L), (3L, 1500L), (3L, 9000L), (-1L, 18000L))
        .write.format("graft-columnar").mode("append").save(dir)
      q.processAllAvailable()
      val all = spark.table("timer_sess_spec")
        .filter($"user_id" >= 0L).orderBy("user_id", "start_us").collect()
      val asTuples = all.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val s = 1000000L // micros per second
      assert(asTuples === Seq(
        (1L, t0 * s, (t0 + 1200) * s, 3L), // merged ACROSS batches
        (2L, t0 * s, t0 * s, 1L),          // timer close, zero wave-2 rows
        (3L, (t0 + 1500) * s, (t0 + 1500) * s, 1L), // in-band close
        (3L, (t0 + 9000) * s, (t0 + 9000) * s, 1L)), // timer close
        s"sessions diverged: $asTuples")
    } finally q.stop()
  }
}
