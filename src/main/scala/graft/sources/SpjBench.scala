package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Paired A/Bs for the storage-partitioned join surfaces, all
  * interleaved warm min-of-k in one session so each delta isolates one
  * plan property. Broadcast stays off on every arm (the 100-TB design
  * point: neither side of a fact-fact join broadcasts).
  *
  *   - '''identity''' (q328): the clustered gcol orders⋈lineitem with
  *     the reported KeyGroupedPartitioning honored (zero join
  *     exchanges) vs ignored (both sides shuffled).
  *   - '''bucket''' (q339): the bucketSpec pair joined on the KEY
  *     through GcolCatalog's function resolution vs the same join with
  *     v2 bucketing off — measures what the bucket transform elides.
  *   - '''skew''': a pair whose cluster key is HOT (~28% of rows in one
  *     bucket), SPJ on in both arms, with vs without
  *     `partiallyClusteredDistribution` — the engine replicating the
  *     smaller side across the hot key's size-bounded splits instead of
  *     fusing them into one straggler task.
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

    def timeIt(f: () => Long): Double = {
      val t0 = System.nanoTime()
      val n = f()
      require(n > 0)
      (System.nanoTime() - t0) / 1e9
    }
    /** Interleaved warm min-of-k of two arms. */
    def pair(a: () => Long, b: () => Long): (Double, Double) = {
      timeIt(a); timeIt(b)
      var am = Double.MaxValue
      var bm = Double.MaxValue
      (0 until reps).foreach { _ =>
        am = math.min(am, timeIt(a))
        bm = math.min(bm, timeIt(b))
      }
      (am, bm)
    }
    def withConf(pairs: (String, String)*)(body: => Long): Long = {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    }
    val off = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")

    // ---- identity SPJ (q328) ------------------------------------------
    val (oPath, lPath) = graft.ops.Layout.ensureGcolSpjPair(spark, dir)
    def identityJoin(): Long = {
      val ro = spark.read.format("graft-columnar").load(oPath)
      val rl = spark.read.format("graft-columnar").load(lPath)
      ro.join(rl, ro("bkt") === rl("bkt") &&
          ro("o_orderkey") === rl("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
    }
    val (spjMin, exMin) = pair(
      () => withConf(off ++ Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false"): _*)(
        identityJoin()),
      () => withConf(off ++ Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "false",
        "spark.sql.requireAllClusterKeysForCoPartition" -> "true"): _*)(
        identityJoin()))

    // ---- bucket-transform SPJ (q339) ----------------------------------
    val (boPath, blPath) = graft.ops.Layout.ensureGcolBucketSpjPair(spark, dir)
    spark.conf.set("spark.sql.catalog.gcol_cat", "graft.sources.GcolCatalog")
    def bucketJoin(): Long = {
      val ro = spark.table(s"gcol_cat.`$boPath`")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val rl = spark.table(s"gcol_cat.`$blPath`")
        .select(col("l_orderkey"), col("l_quantity"))
      ro.join(rl, ro("o_orderkey") === rl("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
    }
    val (bSpjMin, bExMin) = pair(
      () => withConf(off ++ Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "true"): _*)(
        bucketJoin()),
      () => withConf(off ++ Seq(
        "spark.sql.sources.v2.bucketing.enabled" -> "false"): _*)(
        bucketJoin()))

    // ---- skewed SPJ: partiallyClusteredDistribution A/B ---------------
    // hot key: every orderkey % 4 == 0 collapses into bucket 0, so one
    // cluster value holds ~28% of both tables (bucket 0's natural share
    // plus a quarter of the table).
    // MEASURED (r16, spj_bench.json): a WASH at both SFs — 0.97× at
    // sf0.1, 0.98× at sf1. The fused hot partition still fits one
    // sub-second task at these scales, so replicating the smaller side
    // across the hot key's size-bounded splits buys back exactly the
    // overhead it adds. Keep PCD off as the default posture; its
    // crossover is a hot partition that is a multi-minute straggler
    // (the true 100-TB case) — re-measure there before flipping.
    val skewO = graft.ops.Core.tmp("graft_gcol_skew_o")
    val skewL = graft.ops.Core.tmp("graft_gcol_skew_l")
    def hot(c: org.apache.spark.sql.Column) =
      when(c % 4 === 0, lit(0)).otherwise(pmod(c, lit(32L)).cast(IntegerType))
    graft.Tables.orders(spark, dir)
      .select(hot(col("o_orderkey")).as("bkt"), col("o_orderkey"),
        col("o_orderpriority"))
      .write.format("graft-columnar").option("clusterBy", "bkt")
      .mode("overwrite").save(skewO)
    graft.Tables.lineitem(spark, dir)
      .select(hot(col("l_orderkey")).as("bkt"), col("l_orderkey"),
        col("l_quantity"))
      .write.format("graft-columnar").option("clusterBy", "bkt")
      .mode("overwrite").save(skewL)
    def skewJoin(): Long = {
      val ro = spark.read.format("graft-columnar").load(skewO)
      val rl = spark.read.format("graft-columnar").load(skewL)
      ro.join(rl, ro("bkt") === rl("bkt") &&
          ro("o_orderkey") === rl("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getLong(1)).sum
    }
    val spjOn = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val (pcdMin, fusedMin) = pair(
      () => withConf(off ++ spjOn ++ Seq(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true"): _*)(
        skewJoin()),
      () => withConf(off ++ spjOn ++ Seq(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "false"): _*)(
        skewJoin()))

    println(
      f"""{"spj_join_sec":$spjMin%.3f,"exchange_join_sec":$exMin%.3f,""" +
      f""""speedup":${exMin / spjMin}%.2f,""" +
      f""""bucket_spj_sec":$bSpjMin%.3f,"bucket_exchange_sec":$bExMin%.3f,""" +
      f""""bucket_speedup":${bExMin / bSpjMin}%.2f,""" +
      f""""skew_pcd_sec":$pcdMin%.3f,"skew_fused_sec":$fusedMin%.3f,""" +
      f""""skew_pcd_speedup":${fusedMin / pcdMin}%.2f,""" +
      f""""sf":"$dir","cpus":$cpus,"reps":$reps}""")
    spark.stop()
  }
}
