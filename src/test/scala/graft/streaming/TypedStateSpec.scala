package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** transformWithState (Spark 4 typed-composite-state API) must reproduce
  * the batch census exactly after one micro-batch over the static events
  * table.
  */
class TypedStateSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("transformWithState census == batch groupBy census") {
    import spark.implicits._
    val streamed = TypedStateCensus.census(spark, dir, "typed_state_spec")
      .select($"user_id", $"n_events", $"n_types")

    val batch = graft.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        count_distinct($"event_type").as("n_types"))
      .select($"user_id", $"n_events", $"n_types")

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0,
      "stream census emitted a row the batch census does not contain")
    assert(batch.exceptAll(streamed).count() == 0,
      "stream census is missing users present in the batch census")
  }
}
