package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Spark 4 SQL scripting (BEGIN … END compound statements): procedural
  * control flow executes ON the engine — no driver-side loop issuing
  * separate queries — so migrating stored-procedure-style workloads
  * needs no JVM glue. No oracle twin (DuckDB has no procedural SQL);
  * the contract checked is script result == closed form / plain SQL.
  */
class SqlScriptingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("WHILE loop compound statement equals the closed form") {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    val r = spark.sql(
      """BEGIN
        |  DECLARE total BIGINT DEFAULT 0;
        |  DECLARE i INT DEFAULT 1;
        |  WHILE i <= 100 DO
        |    SET total = total + i;
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT total;
        |END""".stripMargin).head().getLong(0)
    assert(r == 5050L)
  }

  test("script variables bind scalar-subquery state usable by later statements") {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    graft.Tables.customer(spark, dir).createOrReplaceTempView("cust_v")
    val scripted = spark.sql(
      """BEGIN
        |  DECLARE cutoff DOUBLE;
        |  SET cutoff = (SELECT avg(c_acctbal) FROM cust_v);
        |  SELECT CAST(count(*) AS BIGINT) FROM cust_v WHERE c_acctbal > cutoff;
        |END""".stripMargin).head().getLong(0)
    val plain = spark.sql(
      """SELECT count(*) FROM cust_v
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust_v)""".stripMargin)
      .head().getLong(0)
    assert(scripted == plain && plain > 0)
  }
}
