package graft

import org.apache.spark.sql.SparkSession

// Throwaway profiling harness — deleted before commit.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.inject)
      .master("local[23]")
      .config("spark.sql.shuffle.partitions", 23)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // representative trivial queries (sub-second tail members)
    val trivial = Seq("q10_project", "q09_filter_range", "q08_month_extract",
      "q13_round", "q02_parquet_scan", "q30_window_rank", "q32_topk",
      "q36_approx_distinct", "q42_token_count", "q59_funnel",
      "q72_profile", "q84_rolling_range")

    def run(label: String): Unit = {
      // warm
      trivial.foreach(q => SparkEntry.queries(q)(spark, dir).count())
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        trivial.foreach(q => SparkEntry.queries(q)(spark, dir).count())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label%-40s min=${ts.min}%6.3f (${ts.min / trivial.size}%5.3f/q)  all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }

    run("warmA baseline")
    run("warmB baseline")
    run("baseline-1")
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    run("sp=8")
    spark.conf.set("spark.sql.shuffle.partitions", 23)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe=off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    run("baseline-2")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    run("aqe=off+sp=8")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", 23)
    run("baseline-3")
    spark.stop()
  }
}
