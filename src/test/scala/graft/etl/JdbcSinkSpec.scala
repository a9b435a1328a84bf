package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** O15 round-trip through a REAL JDBC database: Derby ships on
  * /opt/spark/jars, so the actual `DataFrameWriter.jdbc` path (the code
  * the reference gates behind db_url, wallmart_pipeline.py:145-150) is
  * exercised against an embedded in-memory instance — not just the gate
  * logic that q15 covers.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    p
  }

  test("jdbc write + read-back preserves the aggregate frame") {
    import spark.implicits._
    val agg = Seq((1, 40001.26), (2, 40932.18), (3, 39731.28))
      .toDF("Month", "Avg_Sales")

    JdbcSink.write(agg, url, "agg_data", props)

    val back = spark.read.jdbc(url, "agg_data", props)
    assert(back.count() == 3)
    val got = back.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(1 -> 40001.26, 2 -> 40932.18, 3 -> 39731.28))
  }

  test("writeIfEnabled: enabled path writes, disabled path is a no-op") {
    import spark.implicits._
    val df = Seq((1, 10.0)).toDF("k", "v")
    assert(JdbcSink.writeIfEnabled(df, None, "never_written") === false)
    assert(JdbcSink.writeIfEnabled(df, Some(url), "gated_write") === true)
    assert(spark.read.jdbc(url, "gated_write", props).count() == 1)
  }
}
