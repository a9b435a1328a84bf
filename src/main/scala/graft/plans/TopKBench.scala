package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paired microbenchmark for the native top-k operator: the identical
  * top-5-per-part query over lineitem, once through the stock plan
  * (window + WindowGroupLimit + sorts — forced by keeping the rank
  * column in the output, which blocks the rewrite) and once through
  * [[TopKPerGroupExec]]. Run:
  *
  * {{{ sbt "runMain graft.plans.TopKBench /root/testdata/sf0.1" }}}
  *
  * Prints one JSON line with median seconds per variant. Same session,
  * same data, interleaved runs — the only difference is the plan.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val w = Window.partitionBy($"l_partkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey".asc, $"l_linenumber".asc)
    def base = graft.Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
    // rank kept in output -> rewrite blocked -> stock window plan
    def stock = base
    def native = base.drop("rn")

    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; require(n > 0); (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    assert(native.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }.size == 2,
      "native plan did not rewrite")
    assert(stock.queryExecution.sparkPlan.collect { case t: TopKPerGroupExec => t }.isEmpty,
      "stock plan unexpectedly rewrote")

    // warmup both, then interleave timed runs
    stock.count(); native.count()
    val runs = 5
    val pairs = (1 to runs).map { _ => (timeIt(stock.count()), timeIt(native.count())) }
    val result = Map(
      "stock_window_sec" -> median(pairs.map(_._1)),
      "native_topk_sec" -> median(pairs.map(_._2)),
      "speedup" -> median(pairs.map(_._1)) / median(pairs.map(_._2)))
    println(result.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", s""","runs":$runs,"sf":"$dir"}"""))
    spark.stop()
  }
}
