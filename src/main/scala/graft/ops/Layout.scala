package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Storage-layout operators: hive-style partitioned parquet + partition
  * pruning (q50) — the first scan-reduction lever a 100 TB deployment
  * reaches for, before bucketing. The reference's own `Month` derivation
  * (wallmart_pipeline.py:90) is exactly the column such a deployment
  * would partition on; BASELINE.md frames the approach as "DataFrame ETL
  * over Parquet/Delta", and hive-partitioned parquet is the
  * catalog-free half of that layout story (q48 covers the bucketed
  * half).
  */
object Layout {

  private val partitionedOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time date-partitioned ingest of orders
    * (`partitionBy(order_month)` → 12 directories), idempotent per dir,
    * written under Core's cleaned tmp root. Like q48's buckets this is
    * ingest-time layout work: the bench pre-pays it in the untimed setup
    * phase so the timed q50 measures the pruned scan the layout buys.
    */
  private[graft] def ensurePartitionedOrders(s: SparkSession, dir: String): String =
    partitionedOnce.getOrElseUpdate(dir, {
      val out = Core.tmp("graft_part_orders")
      Tables.orders(s, dir)
        .withColumn("order_month", month(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("order_month").parquet(out)
      out
    })

  // q50: partition-pruned scan + aggregate. The equality filter on the
  // partition key is resolved against directory names at PLANNING time —
  // the plan's PartitionFilters prune 11 of 12 directories and their row
  // groups are never opened (LayoutSpec asserts exactly one partition
  // survives). At 100 TB that is the difference between scanning ~8 TB
  // and scanning everything; no shuffle is added because the month
  // filter + 3-group aggregate still map-side combine.
  private def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensurePartitionedOrders(s, dir)
    s.read.parquet(path)
      .filter($"order_month" === 3)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_customers"),
        Num.roundAt(sum($"o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  /** Small-file compaction: rewrite a parquet directory into files near
    * `targetBytes` each. The small-file problem is the routine 100 TB
    * maintenance chore — streaming sinks and over-parallel writers leave
    * thousands of KB-sized files whose per-file open/footer cost comes to
    * dominate scans. `repartition(n)` (a shuffle) rather than
    * `coalesce(n)`: coalesce only merges co-located partitions, can't
    * split large ones, and skews output sizes; compaction wants uniform
    * files and pays one shuffle of data that was being rewritten anyway.
    * Returns (input file count, output file count).
    */
  def compact(s: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): (Int, Int) = {
    val df = s.read.parquet(inPath)
    val inFiles = df.inputFiles
    // Hadoop FileSystem, not java.nio: inputFiles URIs carry whatever
    // scheme the table lives on (file://, hdfs://, s3a://) and sizing
    // must work on all of them.
    val hconf = s.sparkContext.hadoopConfiguration
    val totalBytes = inFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(nOut).write.mode("overwrite").parquet(outPath)
    (inFiles.length, s.read.parquet(outPath).inputFiles.length)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_partition_prune" -> (partitionPrune _)
  )

  val oracle: Map[String, String] = Map(
    "q50_partition_prune" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE month(o_orderdate) = 3
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin
  )
}
