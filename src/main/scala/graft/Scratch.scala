package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

// Throwaway profiling harness for in-session step timing — not part of
// the library surface; deleted before commit.
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

    val jobStart = scala.collection.concurrent.TrieMap[Int, Long]()
    @volatile var jobs = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.get(je.jobId).foreach { t0 =>
          jobs.synchronized { jobs += ((je.jobId, (System.nanoTime() - t0) / 1e9)) }
        }
    })

    for (q <- Seq("q226_dsir_selection", "q227_gate_calibration")) {
      // warm
      SparkEntry.queries(q)(spark, dir).count()
      spark.catalog.clearCache()
      (1 to 2).foreach { rep =>
        jobs.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val js = jobs.sortBy(_._1).map { case (i, d) => f"$i:$d%.2f" }.mkString(" ")
        println(f"[scratch] $q rep$rep  ${dt}%6.3f s  jobs(${jobs.size}): $js")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
