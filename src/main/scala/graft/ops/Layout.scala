package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  private val monthDimOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time 12-row calendar dimension (month -> quarter) written as
    * parquet, idempotent per dir. File-backed on purpose: a dim held as a
    * LocalRelation would have its filter constant-folded away before the
    * PartitionPruning rule runs, and real lakehouse dims live in the lake
    * anyway.
    */
  private[graft] def ensureMonthDim(s: SparkSession, dir: String): String =
    monthDimOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_month_dim")
      (1 to 12).map(m => (m, s"Q${(m - 1) / 3 + 1}"))
        .toDF("order_month", "quarter")
        .coalesce(1).write.mode("overwrite").parquet(out)
      out
    })

  // q90: dynamic partition pruning — the runtime companion of q50's
  // planning-time pruning. The filter sits on a DIM attribute (quarter),
  // so the surviving months are unknowable until the dim is scanned:
  // Spark plans a DynamicPruningSubquery on the fact's partition column,
  // reuses the join's broadcast exchange to evaluate it, and only then
  // opens the 3 surviving month directories (LayoutSpec asserts the
  // dynamicpruning filter is present and exactly 3 partitions are read).
  // At 100 TB this is the star-schema workhorse: every fact-to-calendar
  // join with a dim-side predicate skips fact I/O without the query
  // author naming a single partition value.
  private def dppJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = s.read.parquet(ensurePartitionedOrders(s, dir))
    val dim = s.read.parquet(ensureMonthDim(s, dir))
    fact.join(broadcast(dim.filter($"quarter" === "Q2")), Seq("order_month"))
      .groupBy($"order_month")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_customers"),
        Num.roundAt(sum($"o_totalprice"), 2).as("total"))
      .orderBy("order_month")
  }

  private val orcOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time ORC ingest of lineitem, idempotent per dir — ingest-time
    * layout work like the partitioned/bucketed copies, pre-paid in the
    * bench's untimed setup phase.
    */
  private[graft] def ensureOrcLineitem(s: SparkSession, dir: String): String =
    orcOnce.getOrElseUpdate(dir, {
      val out = Core.tmp("graft_orc_lineitem")
      graft.Tables.lineitem(s, dir).write.mode("overwrite").orc(out)
      out
    })

  // q82: ORC scan — the second columnar format a multi-team lake always
  // ends up holding (Hive-era tables are ORC; Spark's reader is
  // built-in). Same pushdown contract as parquet: the range predicate
  // reaches the ORC reader (searchArguments) and row groups outside
  // [45, ∞) are skipped via min/max stride stats; the projection prunes
  // to 4 of 16 columns. Oracle runs the identical SQL over the parquet
  // twin — format must not change a single bit of the result.
  private def orcScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureOrcLineitem(s, dir)
    s.read.orc(path)
      .filter($"l_quantity" >= 45.0)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        Num.roundAt(sum($"l_extendedprice"), 2).as("revenue"),
        Num.roundAt(avg($"l_discount"), 6).as("avg_disc"))
      .orderBy("l_returnflag")
  }

  // q86: z-order (Morton) clustering key — the multi-dimensional
  // data-skipping layout lever (Delta OPTIMIZE ZORDER, Iceberg sort
  // orders). Interleaving the bits of two filter dimensions makes rows
  // close in EITHER dimension close in the sort order, so per-file
  // min/max zone maps prune 2-D range filters that a single-column sort
  // can only prune on its leading key. The key is 20 exact integer
  // bit-ops per row (10 bits per dimension), identical on both engines;
  // the query reports per-tile occupancy + per-dimension spans (the
  // zone-map view: every 64-tile covers a 128x128 rectangle, which is
  // exactly why both `x BETWEEN` and `y BETWEEN` filters skip files
  // after a z-sort rewrite).
  /** (x, y, zkey) per order — the shared encode of q86 and the z-sorted
    * write LayoutSpec uses to verify per-file span bounds on real files.
    */
  private[graft] def zEncoded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def interleave(c: org.apache.spark.sql.Column, off: Int) =
      (0 until 10).map(i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i + off))
        .reduce(_ + _)
    Tables.orders(s, dir)
      .select(
        pmod($"o_custkey", lit(1024L)).as("x"),
        pmod(datediff(to_date($"o_orderdate"),
          lit("1970-01-01").cast(DateType)).cast(LongType), lit(1024L)).as("y"))
      .withColumn("zkey", interleave($"x", 0) + interleave($"y", 1))
  }

  private def zorderKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    zEncoded(s, dir)
      .groupBy(shiftright($"zkey", 14).as("ztile"))
      .agg(count(lit(1)).as("n"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy("ztile")
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
  /** DYNAMIC partition overwrite — the daily-reprocessing write pattern:
    * rewrite ONLY the partitions present in the incoming frame, leaving
    * every other partition's files untouched. Static overwrite (the
    * default) would truncate the whole table first — at 100 TB the
    * difference between rewriting one day and rewriting three years.
    * Scoped PER WRITE via the DataFrameWriter option — no session-conf
    * mutation, so concurrent writers on one session can't race on a
    * set/restore window. LayoutSpec pins both halves of the contract:
    * untouched partitions byte-identical (same files, same modification
    * times), targeted partition fully replaced.
    */
  def overwriteDayPartition(s: SparkSession, tablePath: String,
                            patch: DataFrame): Unit =
    patch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_day").parquet(tablePath)

  /** Day-partitioned events ingest for the dynamic-overwrite spec. */
  def writeDayPartitionedEvents(s: SparkSession, dir: String): String = {
    val out = Core.tmp("graft_dyn_part")
    Tables.events(s, dir)
      .withColumn("event_day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_day").parquet(out)
    out
  }

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
    "q50_partition_prune" -> (partitionPrune _),
    "q82_orc_scan"        -> (orcScan _),
    "q86_zorder_key"      -> (zorderKey _),
    "q90_dpp_join"        -> (dppJoin _)
  )

  private val zSumSql: String =
    (0 until 10).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  val oracle: Map[String, String] = Map(
    "q50_partition_prune" ->
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE month(o_orderdate) = 3
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "q90_dpp_join" ->
      """SELECT CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE month(o_orderdate) IN (4, 5, 6)
        |GROUP BY 1 ORDER BY order_month""".stripMargin,
    "q82_orc_scan" ->
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(l_extendedprice), 2) AS revenue,
        |       round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem WHERE l_quantity >= 45.0::DOUBLE
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q86_zorder_key" ->
      s"""WITH d AS (
        |  SELECT o_custkey % 1024 AS x,
        |         CAST(datediff('day', DATE '1970-01-01',
        |              CAST(o_orderdate AS DATE)) % 1024 AS BIGINT) AS y
        |  FROM orders),
        |z AS (SELECT x, y, $zSumSql AS zkey FROM d)
        |SELECT CAST(zkey >> 14 AS BIGINT) AS ztile,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
        |       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
        |FROM z GROUP BY 1 ORDER BY ztile""".stripMargin
  )
}
