package graft

import org.apache.spark.sql.SparkSession

/** Warm-timing harness for individual queries: runs each named query
  * REPS times (default 3) in one resident session and prints every
  * per-run time plus the min — the number the round workflow compares
  * against a query's bench slot before/after a perf change. Mirrors
  * Bench's session config (AQE on, shuffle.partitions = cores, UTC) and
  * its per-run `clearCache()` so internal persists can't cache-hit
  * across reps; run 1 is effectively the cold/codegen pass, runs 2+ are
  * the warm numbers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=26 \
  *   sbt -batch "runMain graft.WarmTime q206_pagerank_converge ..."
  */
object WarmTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "26").toInt,
      Runtime.getRuntime.availableProcessors())
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq.empty
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[warmtime] $name: NO SUCH QUERY")
        case Some(fn) =>
          val ts = (1 to reps).map { _ =>
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[warmtime] $name min=${ts.min}%.2fs runs=" +
            ts.map(t => f"$t%.2f").mkString(","))
      }
    }
    spark.stop()
  }
}
