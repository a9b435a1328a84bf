package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired microbenchmark: the same scan-heavy aggregate over IDENTICAL
  * lineitem data stored as parquet (Spark's vectorized reader, snappy +
  * dictionary/RLE encodings) vs graft-columnar (this library's
  * uncompressed format). Interleaved timed runs in one session. Run:
  *
  * {{{ sbt "runMain graft.sources.FormatBench /root/testdata/sf0.1" }}}
  *
  * Three shapes, each isolating one claim:
  *   - `full_agg`: group-by over 4 columns, no filter — raw decode
  *     throughput (parquet's compression advantage shows here).
  *   - `selective`: a clustered-key range filter — gcol's zone-map
  *     BLOCK skipping vs parquet row-group stats.
  *   - `narrow`: 1-of-6-column sum — columnar projection on both.
  * Honest framing: parquet is two decades of format engineering; the
  * point of this bench is to MEASURE where the self-built format
  * stands, not to claim victory.
  */
object FormatBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.inject)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_returnflag")
    val src = graft.Tables.lineitem(spark, dir).select(cols.map(col): _*)
      .repartitionByRange(4, $"l_orderkey").sortWithinPartitions("l_orderkey")
    val pqDir = graft.ops.Core.tmp("fmt_pq")
    val gcDir = graft.ops.Core.tmp("fmt_gc")
    val gzDir = graft.ops.Core.tmp("fmt_gz")
    src.write.mode("overwrite").parquet(pqDir)
    src.write.format("graft-columnar").option("rowsPerBlock", "16384")
      .mode("overwrite").save(gcDir)
    src.write.format("graft-columnar").option("rowsPerBlock", "16384")
      .option("codec", "zstd").mode("overwrite").save(gzDir)
    val pqBytes = new java.io.File(pqDir).listFiles().map(_.length).sum
    val gcBytes = new java.io.File(gcDir).listFiles().map(_.length).sum
    val gzBytes = new java.io.File(gzDir).listFiles().map(_.length).sum

    def pq = spark.read.parquet(pqDir)
    def gc = spark.read.format("graft-columnar").load(gcDir)
    def gz = spark.read.format("graft-columnar").load(gzDir)

    val maxKey = src.agg(max($"l_orderkey")).collect().head.getLong(0)
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame => Long)] = Seq(
      "full_agg" -> (df => df.groupBy($"l_returnflag")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"),
          countDistinct($"l_suppkey")).count()),
      "selective" -> (df => df.filter($"l_orderkey" <= maxKey / 20)
        .agg(sum(floor($"l_extendedprice" * 100).cast("long")))
        .collect().head.getLong(0)),
      "narrow" -> (df =>
        df.agg(sum(floor($"l_quantity").cast("long")))
          .collect().head.getLong(0)))

    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); val r = f; require(r >= 0)
      (System.nanoTime() - t0) / 1e9
    }
    // warm all paths, then interleave
    shapes.foreach { case (_, q) => q(pq); q(gc); q(gz) }
    val out = shapes.map { case (name, q) =>
      val reps = (1 to 5).map(_ => (timeIt(q(pq)), timeIt(q(gc)), timeIt(q(gz))))
      val (p, g, z) =
        (reps.map(_._1).min, reps.map(_._2).min, reps.map(_._3).min)
      // cross-check: identical results on every path
      require(q(pq) == q(gc) && q(gc) == q(gz),
        s"$name: format results diverge")
      f""""$name":{"parquet_sec":$p%.3f,"gcol_sec":$g%.3f,"gcol_zstd_sec":$z%.3f}"""
    }
    println(out.mkString(
      s"""{"bytes":{"parquet":$pqBytes,"gcol":$gcBytes,"gcol_zstd":$gzBytes},""",
      ",", s""","sf":"$dir","cpus":$cpus}"""))
    spark.stop()
  }
}
