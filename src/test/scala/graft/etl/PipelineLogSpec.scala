package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Reference-parity error-handling contract (wallmart_pipeline.py:6-14,
  * 51-65, 200-201): a failing stage writes the stage-attributed
  * `Error in <stage>():` line plus the `Critical error in main():` line
  * to the pipeline log, and the original exception still reaches the
  * caller (unlike the reference's main, which swallows it — a
  * script-level choice the library deliberately does not replicate).
  */
class PipelineLogSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("failing extract stage logs reference-shaped lines and propagates") {
    import scala.jdk.CollectionConverters._
    val logFile = java.nio.file.Paths.get(graft.ops.Core.tmp("graft_pipeline"), "pipeline.log")
    val outDir = graft.ops.Core.tmp("graft_logrun")
    PipelineLog.logFile = Some(logFile)
    try {
      val e = intercept[Exception] {
        WalmartPipeline.run(spark, "/nonexistent/grocery_sales.csv",
          "/root/reference/extra_data.parquet", outDir)
      }
      assert(e.getMessage != null)
      val lines = java.nio.file.Files.readAllLines(logFile).asScala
      assert(lines.exists(_.contains("Starting data pipeline execution.")))
      assert(lines.exists(l => l.contains(" - ERROR - ") && l.contains("Error in extract():")),
        s"no stage-attributed error line in:\n${lines.mkString("\n")}")
      assert(lines.exists(l => l.contains(" - CRITICAL - ") && l.contains("Critical error in main():")))
      assert(!lines.exists(_.contains("completed successfully")))
    } finally PipelineLog.logFile = None
  }

  test("successful run logs the full reference lifecycle") {
    import scala.jdk.CollectionConverters._
    val logFile = java.nio.file.Paths.get(graft.ops.Core.tmp("graft_pipeline"), "pipeline.log")
    val outDir = graft.ops.Core.tmp("graft_logrun_ok")
    PipelineLog.logFile = Some(logFile)
    try {
      WalmartPipeline.run(spark, "/root/reference/grocery_sales.csv",
        "/root/reference/extra_data.parquet", outDir)
      val lines = java.nio.file.Files.readAllLines(logFile).asScala
      for (expected <- Seq(
          "Starting data pipeline execution.",
          "Data successfully extracted and merged.",
          "Data transformation successful.",
          "Average weekly sales per month calculated successfully.",
          "saved successfully.",
          "validated successfully.",
          "Data pipeline execution completed successfully."))
        assert(lines.exists(_.contains(expected)), s"missing log line: $expected")
    } finally PipelineLog.logFile = None
  }
}
