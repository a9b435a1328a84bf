package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired A/B for the storage-partitioned join (q328): the SAME
  * clustered gcol orders⋈lineitem aggregate timed with the reported
  * KeyGroupedPartitioning honored (zero join exchanges) vs ignored
  * (both sides shuffled) — interleaved warm min-of-k in one session, so
  * the delta is the two table-wide exchanges and their sorts, nothing
  * else. Broadcast stays off on BOTH arms (the 100-TB design point:
  * neither side of a fact-fact join broadcasts). Run:
  *
  * {{{ sbt "runMain graft.sources.SpjBench /root/testdata/sf0.1" }}}
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (oPath, lPath) = graft.ops.Layout.ensureGcolSpjPair(spark, dir)

    def join(): Long = {
      val ro = spark.read.format("graft-columnar").load(oPath)
      val rl = spark.read.format("graft-columnar").load(lPath)
      ro.join(rl, ro("bkt") === rl("bkt") &&
          ro("o_orderkey") === rl("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
    }

    def arm(spj: Boolean): () => Long = () => {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        (!spj).toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      join()
    }

    def timeIt(f: () => Long): Double = {
      val t0 = System.nanoTime()
      val n = f()
      require(n > 0)
      (System.nanoTime() - t0) / 1e9
    }

    val spjArm = arm(spj = true)
    val exArm = arm(spj = false)
    // warmup once each, then interleaved min-of-k
    timeIt(spjArm); timeIt(exArm)
    var spjMin = Double.MaxValue
    var exMin = Double.MaxValue
    (0 until reps).foreach { _ =>
      spjMin = math.min(spjMin, timeIt(spjArm))
      exMin = math.min(exMin, timeIt(exArm))
    }
    println(f"""{"spj_join_sec":$spjMin%.3f,"exchange_join_sec":$exMin%.3f,""" +
      f""""speedup":${exMin / spjMin}%.2f,"sf":"$dir","cpus":$cpus,"reps":$reps}""")
    spark.stop()
  }
}
