package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: times named queries warm (k reps, min reported) in
  * one resident session — the steady-state number the bench's min-of-two
  * scoring converges to, without paying the full-suite warmup. Usage:
  * `sbt "runMain graft.Profile <sfDir> <reps> <query...>"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, dir).count() catch { case e: Throwable =>
        System.err.println(s"[profile] $n warmup failed: ${e.getMessage}") }
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
