package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The native grouped top-k: rewrite firing, plan shape, and value-level
  * equivalence against Spark's stock window plan on the same session.
  */
class NativeTopKSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def topk(k: Int) = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    graft.Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .drop("rn")
  }

  test("the row_number idiom plans as partial+final TopKPerGroupExec, no sort, no window") {
    val df = topk(3)
    val p = df.queryExecution.sparkPlan
    val execs = p.collect { case t: TopKPerGroupExec => t }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected one partial and one final TopKPerGroupExec:\n$p")
    val s = p.toString
    assert(!s.contains("WindowExec") && !s.contains("WindowGroupLimit"),
      s"window survived the rewrite:\n$s")
    assert(!s.contains("Sort"), s"a sort survived the rewrite:\n$s")
  }

  test("native result matches the stock window plan row-for-row") {
    import spark.implicits._
    // keeping rn in the output blocks the rewrite -> stock window plan
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val stock = graft.Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
    assert(stock.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }.isEmpty,
      "control plan unexpectedly rewritten")
    val expected = stock.drop("rn")
      .orderBy($"c_nationkey", $"c_acctbal".desc, $"c_custkey").collect().toSeq
    val got = topk(3)
      .orderBy($"c_nationkey", $"c_acctbal".desc, $"c_custkey").collect().toSeq
    assert(got == expected)
  }

  test("k larger than every group returns all rows") {
    import spark.implicits._
    val all = graft.Tables.customer(spark, dir).count()
    assert(topk(1000).count() == all)
  }

  test("k = 1 via the equality bound keeps exactly one row per group") {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val df = graft.Tables.customer(spark, dir)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn")
    assert(df.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }.nonEmpty,
      "rn === 1 should rewrite")
    val groups = graft.Tables.customer(spark, dir).select("c_nationkey").distinct().count()
    assert(df.count() == groups)
  }

  test("rank/dense_rank and rank-in-output shapes are NOT rewritten") {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val ranked = graft.Tables.customer(spark, dir)
      .withColumn("rk", rank().over(w)).filter($"rk" <= 3).drop("rk")
    assert(ranked.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }.isEmpty,
      "rank() must not rewrite (ties admit > k rows)")
  }
}
