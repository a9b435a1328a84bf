package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4's `transformWithState` — the arbitrary-stateful-processing API
  * that supersedes `mapGroupsWithState` (StatefulSessionizer shows the
  * older API; both stay: migrating pipelines run them side by side).
  * What the new API adds, demonstrated here:
  *
  *  - TYPED COMPOSITE STATE: several named state variables per key
  *    (a MapState[event_type -> count] and a ValueState[total]) instead
  *    of one monolithic case-class blob that must be rewritten wholesale
  *    on every update — at 100 TB of keys the difference between a
  *    point-write per event type and re-serializing the whole per-key
  *    struct each micro-batch;
  *  - per-state TTL (TTLConfig) and timers, available on the handle
  *    without re-shaping the processor.
  *
  * Requires the RocksDB state store provider (virtual-column-family
  * state layout); the driver sets it for the query's session. State per
  * key is O(|event types|) — bounded by the type vocabulary, not the
  * event volume, the same reduce-side bound as q94's transition matrix.
  *
  * The census the processor maintains (per-user event count + distinct
  * type count) is exactly the batch aggregate
  * `groupBy(user_id).agg(count(*), count_distinct(event_type))`, which
  * is what TypedStateSpec checks after one micro-batch.
  */
object TypedStateCensus {
  final case class Ev(user_id: Long, event_type: String)
  final case class Census(user_id: Long, n_events: Long, n_types: Long)

  class CensusProcessor extends StatefulProcessor[Long, Ev, Census] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long](
        "total", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Census] = {
      var n = if (total.exists()) total.get() else 0L
      rows.foreach { e =>
        val c = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1)
        n += 1
      }
      total.update(n)
      Iterator.single(Census(key, n, counts.keys().size.toLong))
    }
  }

  /** Runs the census over the events parquet as a stream (one micro-batch
    * on a static directory) and returns the memory-sink contents.
    */
  def census(spark: SparkSession, dir: String,
             queryName: String = "typed_state_census"): DataFrame = {
    import spark.implicits._
    // transformWithState requires the RocksDB provider (multi-column-
    // family state); scoped to this session like the nanosAsLong conf
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val events = StreamingDemo.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .as[Ev]

    val out = events
      .groupByKey(_.user_id)
      .transformWithState(new CensusProcessor,
        TimeMode.None(), OutputMode.Update())

    val q = out.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()

    spark.table(queryName).orderBy("user_id")
  }
}
