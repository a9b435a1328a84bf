package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The stateful streaming sessionizer must agree with the declarative
  * batch `session_window` (q37): after one micro-batch it has emitted
  * every session EXCEPT each user's final one, which correctly remains
  * open in the state store.
  */
class StreamingSessionSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("flatMapGroupsWithState sessions == batch session_window minus open tails") {
    import spark.implicits._
    val streamed = StatefulSessionizer.sessionize(spark, dir, "session_spec")
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    val batch = graft.ops.Relational.queries("q37_session_window")(spark, dir)
    val w = Window.partitionBy($"user_id").orderBy($"start_us".desc)
    val closedBatch = batch
      .withColumn("rn", row_number().over(w))
      .filter($"rn" > 1) // drop each user's final (still-open) session
      .select($"user_id", $"start_us", $"end_us", $"n_events")

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(closedBatch).count() == 0,
      "streamed emitted a session the batch result does not contain")
    assert(closedBatch.exceptAll(streamed).count() == 0,
      "streamed is missing closed sessions present in the batch result")
  }
}
