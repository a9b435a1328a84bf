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
      // match the bench session: without this, multi-query profiling
      // re-measures Janino recompilation once the 100-entry default
      // codegen cache starts evicting (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Opt-in per-job breakdown (`-Dgraft.profile.jobs=true`): prints each
    // job's wall time + first stage name during the LAST timed rep, so a
    // slow query's cost attributes to its jobs (broadcast builds, persist
    // materializations, final collect) instead of one opaque total.
    // (env twin because build.sbt's forked run JVM doesn't inherit -D
    // flags passed to sbt itself)
    val jobDetail = sys.props.get("graft.profile.jobs").contains("true") ||
      sys.env.get("GRAFT_PROFILE_JOBS").contains("true")
    @volatile var traceJobs = false
    if (jobDetail) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          if (traceJobs) {
            val desc = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            starts.put(js.jobId, (System.nanoTime(), desc))
          }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          if (traceJobs) Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
            println(f"[job] #${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2fs  $desc")
          }
      })
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, dir).count() catch { case e: Throwable =>
        System.err.println(s"[profile] $n warmup failed: ${e.getMessage}") }
      val ts = (1 to reps).map { i =>
        spark.catalog.clearCache()
        traceJobs = jobDetail && i == reps
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      traceJobs = false
      println(f"[profile] $n min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
