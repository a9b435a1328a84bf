package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSessionTestWrapper, Tables}

/** The streaming windowed aggregation must agree with the equivalent
  * batch computation over the same events — Spark's unified API promises
  * exactly this, and it pins the demo against regressions.
  */
class StreamingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("streaming hourly counts equal the batch equivalent") {
    import spark.implicits._
    val streamed = StreamingDemo.hourlyCounts(spark, dir, "stream_spec")
      .select($"bucket_us", $"event_type", $"n",
        Num2.round2($"sum_value").as("sum_value"))

    val batch = Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select(unix_micros($"window.start").as("bucket_us"), $"event_type",
        $"n", Num2.round2($"sum_value").as("sum_value"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream join equals the batch interval join") {
    import spark.implicits._
    val streamed = StreamStreamJoin.purchasesWithRecentViews(spark, dir, "ss_join_spec")
    val e = Tables.events(spark, dir)
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
    val v = e.filter($"event_type" === "view")
      .select($"event_id".as("v_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
    val batch = p.join(v,
        $"user_id" === $"v_user" &&
          $"v_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"v_ts" <= $"p_ts")
      .select($"p_id", $"v_id", $"user_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming dedup with watermark-bounded state removes the injected duplicates") {
    import spark.implicits._
    val out = StreamingDedup.dedupedEvents(spark, dir, "dedup_spec").cache()
    val batchIds = Tables.events(spark, dir).select("event_id").distinct().count()
    // the self-union doubled every event; exactly one copy must survive
    assert(out.count() == batchIds, "deduped stream row count != distinct ids")
    assert(out.select("event_id").distinct().count() == batchIds)
    out.unpersist()
  }
}

/** Local rounding helper (sum-of-doubles order differs between the
  * state-store merge and the batch partial agg; 2dp absorbs it).
  */
private object Num2 {
  import org.apache.spark.sql.Column
  def round2(c: Column): Column = org.apache.spark.sql.functions.round(c, 2)
}
