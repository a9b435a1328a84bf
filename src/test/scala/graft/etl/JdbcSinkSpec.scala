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

  // --- DDL twin of create_sql_tables (wallmart_pipeline.py:17-36) ---

  test("createJdbcTables: both tables exist with declared schema, idempotent") {
    SqlTables.createJdbcTables(url)
    SqlTables.createJdbcTables(url) // second call must be a no-op, not a DDL error
    for ((name, cols) <- SqlTables.tableDefs) {
      val got = spark.read.jdbc(url, name, props).schema.fieldNames.toSeq
      assert(got.map(_.toLowerCase) == cols.map(_._1.toLowerCase),
        s"$name columns: $got")
    }
    // declared primary keys are real constraints in the database
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      for ((name, cols) <- SqlTables.tableDefs) {
        val rs = conn.getMetaData.getPrimaryKeys(null, null, name.toUpperCase)
        val pk = Iterator.continually(rs).takeWhile(_.next())
          .map(_.getString("COLUMN_NAME").toLowerCase).toSet
        rs.close()
        assert(pk == cols.collect { case (c, _, true) => c.toLowerCase }.toSet,
          s"$name primary key: $pk")
      }
    } finally conn.close()
  }

  test("createSparkTables: catalog tables exist with declared schema, idempotent") {
    val base = graft.ops.Core.tmp("graft_ddl")
    SqlTables.createSparkTables(spark, base)
    SqlTables.createSparkTables(spark, base) // IF NOT EXISTS: no error
    try {
      for ((name, cols) <- SqlTables.tableDefs) {
        assert(spark.catalog.tableExists(name), s"$name missing from catalog")
        assert(spark.table(name).schema.fieldNames.toSeq == cols.map(_._1),
          s"$name schema mismatch")
      }
    } finally
      SqlTables.tableDefs.foreach { case (name, _) =>
        spark.sql(s"DROP TABLE IF EXISTS $name")
      }
  }
}
