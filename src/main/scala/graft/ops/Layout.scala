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

  // ---------------------------------------------------------------------
  // q210: encoding-choice census — the storage-layout audit behind
  // every parquet/ORC writer knob (PLAIN vs DICTIONARY vs RLE): per
  // column, the exact statistics each encoding's cost depends on — NDV
  // (dictionary code width = ⌈log₂ NDV⌉ bits), run count in the file's
  // write order (RLE pays per RUN, so sortedness is the whole game),
  // and the modeled bits under each scheme (64-bit plain values; dict =
  // n·codebits + NDV·64 dictionary pages; RLE = runs·(64+32) for
  // value+length). At 100 TB the same census, run over a sample or
  // per ingest batch, picks column encodings and SORT ORDER (compare
  // q86's z-order: clustering that multiplies run lengths is free
  // compression). Determinism: runs are counted within the (l_orderkey,
  // l_linenumber) write order via a partitioned lag window (each order
  // starts a run — never a global single-partition sort); code width
  // is Σ_k [NDV > 2^k], exact integer predicates, never a float log₂.
  private def encodingCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // l_linenumber is NOT unique within an order in this data, so the
    // write order tiebreaks on the value itself — rows tying on
    // (linenumber, v) are interchangeable for run counting, making the
    // census deterministic on both engines without a synthetic row id
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber", $"v")
    val censuses = Seq("l_returnflag", "l_shipdate", "l_quantity",
      "l_partkey").map { name =>
      val li = Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", col(name).as("v"))
      val runs = li.withColumn("prev", lag($"v", 1).over(w))
        .withColumn("newrun",
          when($"prev".isNull || $"v" =!= $"prev", 1L).otherwise(0L))
      val agg = runs.agg(count(lit(1)).as("n"),
        count_distinct($"v").as("ndv"), sum($"newrun").as("n_runs"))
      val codebits = (0 to 23).map(k =>
        when($"ndv" > (1L << k), 1L).otherwise(0L)).reduce(_ + _)
      agg.select(lit(name).as("col_name"), $"n", $"ndv", $"n_runs",
        codebits.as("dict_codebits"),
        (lit(64L) * $"n").as("plain_bits"),
        (codebits * $"n" + lit(64L) * $"ndv").as("dict_bits"),
        ($"n_runs" * lit(96L)).as("rle_bits"))
    }
    censuses.reduce(_ unionAll _)
      .withColumn("best",
        when($"rle_bits" <= $"dict_bits" && $"rle_bits" <= $"plain_bits",
          "rle")
          .when($"dict_bits" <= $"plain_bits", "dictionary")
          .otherwise("plain"))
      .orderBy($"col_name")
  }

  // ---------------------------------------------------------------------
  // q243: zone-map skipping census — min/max statistics are the cheapest
  // scan-reduction lever a columnar store has, and their value is pure
  // LAYOUT: the same stats skip ~nothing when the filter column is
  // scattered across row groups and ~everything when it is clustered.
  // The census simulates both layouts from the same table — natural
  // groups = ingest-order key ranges (l_orderkey div 1024: orderkeys
  // correlate only loosely with ship dates), clustered groups = one per
  // ship month (what a shipdate-sorted writer would produce) — builds
  // each group's [min,max] shipdate zone map, and prices three
  // quarter-long predicates in groups scanned, rows scanned and read
  // amplification. The q86/q90/q210 sibling: q86 builds the clustering
  // key, q210 chooses the encoding, this one measures what the
  // clustering buys at the scan. Determinism: zone maps and predicate
  // bounds are exact micros ints. Scale shape: group stats are one
  // map-side-combined aggregate per layout (groups are defined by key
  // arithmetic, NOT by a global sort — at production scale the sort is
  // the writer's, never this query's); the predicate sweep is a 3-row
  // broadcast against group-count-sized frames.
  private def zoneMapCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def dayUs(y: Int, m: Int): Long =
      java.time.LocalDate.of(y, m, 1).toEpochDay * 86400000000L
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", Num.epochUs($"l_shipdate").as("d"),
        (year($"l_shipdate") * 100 + month($"l_shipdate")).as("ship_month"))
    val preds = Seq(
      ("1996q1", dayUs(1996, 1), dayUs(1996, 4)),
      ("1998q3", dayUs(1998, 7), dayUs(1998, 10)),
      ("2001q1", dayUs(2001, 1), dayUs(2001, 4)))
      .toDF("pred", "lo", "hi")
    val matched = li.crossJoin(broadcast(preds))
      .groupBy($"pred")
      .agg(sum(when($"d" >= $"lo" && $"d" < $"hi", 1L).otherwise(0L))
        .as("rows_matched"))
    def census(layout: String, rgCol: org.apache.spark.sql.Column) = {
      val rg = li.withColumn("rg", rgCol)
        .groupBy($"rg")
        .agg(count(lit(1)).as("n_rows"), min($"d").as("mn"),
          max($"d").as("mx"))
      rg.crossJoin(broadcast(preds))
        .withColumn("hit", $"mx" >= $"lo" && $"mn" < $"hi")
        .groupBy($"pred")
        .agg(count(lit(1)).as("n_groups"),
          sum(when($"hit", 1L).otherwise(0L)).as("n_groups_scanned"),
          sum(when($"hit", $"n_rows").otherwise(0L)).as("rows_scanned"))
        .withColumn("layout", lit(layout))
    }
    census("a_natural", expr("l_orderkey div 1024"))
      .unionAll(census("b_clustered", $"ship_month"))
      .join(matched, Seq("pred"))
      .select($"layout", $"pred", $"n_groups", $"n_groups_scanned",
        $"rows_scanned", $"rows_matched",
        Num.roundAt(($"n_groups" - $"n_groups_scanned").cast(DoubleType) /
          $"n_groups".cast(DoubleType), 6).as("skip_frac"),
        when($"rows_matched" > 0, Num.roundAt(
          $"rows_scanned".cast(DoubleType) /
            $"rows_matched".cast(DoubleType), 4)).as("read_amp"))
      .orderBy($"layout", $"pred")
  }

  // ---------------------------------------------------------------------
  // q306: per-rowgroup Bloom-filter pruning census — the equality-
  // predicate complement of q243's zone maps: under the natural ingest
  // layout (rowgroups keyed by orderkey ranges) a point lookup on
  // l_suppkey finds zone min/max USELESS (suppkeys scatter across every
  // group, min..max covers any probe), which is exactly the case
  // parquet/lakehouse row-group bloom filters exist for. Simulated
  // honestly: per group, an m=4096-bit / k=2 filter over the group's
  // distinct suppkeys (bits = md5-derived h7, the q187 hash family —
  // deterministic on both engines); probes are 5 present + 5 absent
  // keys; the census prices groups-scanned under zone-map-only vs
  // +bloom against the true containing-group count, separating the
  // absent-key wins (bloom skips ~everything, FPR-bounded) from the
  // present-key floor (bloom can never skip a true member). All exact
  // integers. Scale shape: group stats and (group, bit) sets are
  // map-side reductions bounded by |groups|·m; probes are a 10-row
  // broadcast; every join is bit- or key-equi.
  private def bloomPruning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val M = 4096L
    val li = Tables.lineitem(s, dir)
      .select(expr("l_orderkey div 1024").as("rg"), $"l_suppkey".as("sk"))
    val rgKeys = li.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rgStats = rgKeys.groupBy($"rg")
      .agg(min($"sk").as("mn"), max($"sk").as("mx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def hb(tag: String, c: org.apache.spark.sql.Column) =
      graft.ops.Det.h7(concat(lit(tag), c.cast(org.apache.spark.sql.types.StringType))) % M
    val bits = rgKeys
      .select($"rg", explode(array(hb("b1:", $"sk"), hb("b2:", $"sk"))).as("bit"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = ((1L to 5L) ++ (1000001L to 1000005L)).toDF("probe_key")
      .select($"probe_key", hb("b1:", $"probe_key").as("h1"),
        hb("b2:", $"probe_key").as("h2"))
    val nGroups = rgStats.agg(count(lit(1)).as("n_groups"))
    val truth = probes.join(rgKeys, $"probe_key" === $"sk")
      .groupBy($"probe_key").agg(count(lit(1)).as("n_true"))
    val zone = probes.join(rgStats,
        $"mn" <= $"probe_key" && $"probe_key" <= $"mx")
      .groupBy($"probe_key").agg(count(lit(1)).as("n_zone"))
    val hit1 = probes.select($"probe_key", $"h1".as("bit"))
      .join(bits, Seq("bit")).select($"probe_key", $"rg")
    val hit2 = probes.select($"probe_key", $"h2".as("bit"))
      .join(bits, Seq("bit")).select($"probe_key", $"rg")
    val bloom = hit1.join(hit2, Seq("probe_key", "rg"))
      .groupBy($"probe_key").agg(count(lit(1)).as("n_bloom"))
    probes.select($"probe_key")
      .join(truth, Seq("probe_key"), "left")
      .join(zone, Seq("probe_key"), "left")
      .join(bloom, Seq("probe_key"), "left")
      .crossJoin(broadcast(nGroups))
      .select($"probe_key",
        (coalesce($"n_true", lit(0L)) > 0L).as("member"),
        $"n_groups",
        coalesce($"n_true", lit(0L)).as("n_true"),
        coalesce($"n_zone", lit(0L)).as("n_zone"),
        coalesce($"n_bloom", lit(0L)).as("n_bloom"),
        Num.roundAt(($"n_groups" - coalesce($"n_bloom", lit(0L)))
          .cast(DoubleType) / $"n_groups".cast(DoubleType), 6)
          .as("bloom_skip_frac"),
        Num.roundAt((coalesce($"n_bloom", lit(0L)) -
          coalesce($"n_true", lit(0L))).cast(DoubleType) /
          greatest($"n_groups" - coalesce($"n_true", lit(0L)), lit(1L))
            .cast(DoubleType), 6).as("false_positive_rate"))
      .orderBy($"probe_key")
  }

  // ---------------------------------------------------------------------
  // q318: partition-size planner — the sizing arithmetic behind every
  // `spark.sql.shuffle.partitions` / `maxPartitionBytes` / bucket-count
  // decision, computed from the data instead of guessed: per table, the
  // exact row count, an in-memory byte estimate from the schema's fixed
  // widths plus EXACT summed string lengths (ASCII corpus: length =
  // bytes), the partition count that lands ~128 MiB partitions, the
  // next power-of-two bucket count (bucket joins want stable widths;
  // pow2 via the q210 Σ[p > 2^k] predicate trick — never a float log),
  // and rows per partition. The planner's claim is falsifiable: spill
  // starts when a partition outgrows executor memory, and these are the
  // numbers that predict it. All integer arithmetic; one map-side
  // aggregate per table. Scale shape: four 1-row aggregates.
  private def partitionPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M128 = 134217728L
    def plan(name: String, df: DataFrame, fixed: Long,
             strCols: Seq[String]) = {
      val bytesPerRow = strCols.map(c => sum(length(col(c)))).toList match {
        case Nil => lit(0L)
        case h :: t => t.foldLeft(h)(_ + _)
      }
      df.agg(count(lit(1)).as("n_rows"), bytesPerRow.as("str_bytes"))
        .select(lit(name).as("table_name"), $"n_rows",
          ($"n_rows" * fixed + $"str_bytes").as("est_bytes"))
    }
    val plans = Seq(
      plan("1_lineitem", Tables.lineitem(s, dir), 68L,
        Seq("l_returnflag", "l_linestatus")),
      plan("2_orders", Tables.orders(s, dir), 32L,
        Seq("o_orderstatus", "o_orderpriority")),
      plan("3_events", Tables.events(s, dir), 32L,
        Seq("event_type", "props")),
      plan("4_documents", Tables.documents(s, dir), 16L,
        Seq("text", "lang", "source")))
      .reduce(_ unionAll _)
    plans
      .withColumn("parts_128mb", expr(s"(est_bytes + ${M128 - 1L}) div $M128"))
      .withColumn("p2bits", (0 to 30).map(k =>
        when($"parts_128mb" > (1L << k), 1).otherwise(0)).reduce(_ + _))
      .select($"table_name", $"n_rows", $"est_bytes",
        Num.roundAt($"est_bytes".cast(DoubleType) / lit(1048576.0), 2)
          .as("est_mb"),
        $"parts_128mb",
        expr("cast(shiftleft(cast(1 as bigint), p2bits) as bigint)")
          .as("bucket_pow2"),
        expr("n_rows div parts_128mb").as("rows_per_part"))
      .orderBy($"table_name")
  }

  private val gcolOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** One-time ingest of lineitem into the library's OWN columnar format
    * (sources/ColumnarSource.scala), range-clustered on `l_orderkey`
    * (repartitionByRange + sortWithinPartitions) so the per-block zone
    * maps are tight and disjoint on the probe key — the layout work that
    * makes q323's block skipping real. Bench pre-pays it untimed, like
    * the ORC/bucket/partition fixtures.
    */
  private[graft] def ensureColumnarLineitem(s: SparkSession, dir: String): String =
    gcolOnce.getOrElseUpdate(dir, {
      val out = Core.tmp("graft_gcol_lineitem")
      Tables.lineitem(s, dir)
        // l_partkey and l_suppkey ride along UNREFERENCED by q323 so the
        // plan guard can observe column pruning at the scan (their byte
        // segments are never read back)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_returnflag")
        .repartitionByRange(4, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.format("graft-columnar").option("rowsPerBlock", "8192")
        .mode("overwrite").save(out)
      out
    })

  // q323: graft-columnar scan — the round-trip oracle row for the
  // library's own columnar DSv2 source (round-13 verdict item #4: the
  // vectorization rung proved instead of taken on faith from parquet).
  // Lineitem is written to the .gcol format clustered on l_orderkey,
  // then read back through the connector: the range predicate is pushed
  // (SupportsPushDownFilters) and prunes whole BLOCKS via footer zone
  // maps before tasks are planned, the projection prunes column
  // segments at the byte level (SupportsPushDownRequiredColumns), and
  // the reader decodes straight into OnHeapColumnVectors
  // (ColumnarBatch path — PlanGuardsSpec asserts scan.supportsColumnar,
  // the ColumnarToRow bridge, and blocks-skipped > 0; ColumnarSourceSpec
  // holds the format contract). The oracle runs identical SQL over the
  // PARQUET twin — a custom format must not change one bit of the
  // result. Determinism: count + exact integer centi-sums only.
  // Scale shape: one task per surviving (file, block); the filter cuts
  // the task list itself, and unprojected columns are never read.
  private def columnarScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureColumnarLineitem(s, dir)
    s.read.format("graft-columnar").load(path)
      .filter($"l_orderkey" <= 30000L && $"l_quantity" >= 25.0)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        sum(floor($"l_quantity" * 100).cast(LongType)).as("qty_centi"),
        sum(floor($"l_extendedprice" * 100).cast(LongType)).as("price_cents"))
      .orderBy($"l_returnflag")
  }

  private val gcolOrdersOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Orders in graft-columnar, clustered on the UNIQUE o_orderkey —
    * the fixture for q327's deterministic topN (a unique sort key means
    * the top-n SET is well-defined; lineitem's keys all tie).
    */
  private[graft] def ensureColumnarOrders(s: SparkSession, dir: String): String =
    gcolOrdersOnce.getOrElseUpdate(dir, {
      val out = Core.tmp("graft_gcol_orders")
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      out
    })

  // q327: topN pushdown through graft-columnar — ORDER BY o_orderkey
  // DESC LIMIT 1000 plans only the tail blocks (the zone-map exclusion
  // rule: a block whose max sits below >= 1000 provably-larger rows
  // cannot reach the top set; sound with ties, exercised tie-free here
  // because o_orderkey is unique). The readout aggregates the selected
  // set so the row is order-insensitive: count, min/max key, exact
  // cents sum. Oracle runs the identical ORDER BY ... LIMIT over the
  // parquet twin. Scale shape: at any SF the scan opens
  // ceil(1000/2048)+boundary blocks, not the table — the "latest-N"
  // query pattern (most recent orders) made O(N) instead of O(table).
  private def columnarTopN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureColumnarOrders(s, dir)
    s.read.format("graft-columnar").load(path)
      .orderBy($"o_orderkey".desc).limit(1000)
      .agg(count(lit(1)).as("n_rows"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"),
        sum(floor($"o_totalprice" * 100).cast(LongType)).as("sum_cents"))
  }

  // q326: metadata-only aggregate through graft-columnar's
  // SupportsPushDownAggregates — ungrouped COUNT/MIN/MAX answered
  // ENTIRELY from file footers (row counts, null counts, zone maps):
  // planInputPartitions emits one pre-aggregated row and zero data
  // blocks are opened (PlanGuardsSpec pins aggregated=true and
  // plannedBlocks=0). This is the "SELECT count(*) in milliseconds at
  // any scale" contract parquet users expect, implemented and proven
  // on the library's own format; a filtered aggregate automatically
  // falls back to the block-reading path (footers cannot see row-level
  // predicates — ColumnarSourceSpec pins the fallback). Oracle runs the
  // identical SQL over the parquet twin. Determinism: counts and
  // min/max are exact values, no arithmetic at all.
  private def columnarMetadataAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureColumnarLineitem(s, dir)
    s.read.format("graft-columnar").load(path)
      .agg(
        count(lit(1)).as("n_rows"),
        count($"l_quantity").as("n_qty"),
        min($"l_orderkey").as("min_orderkey"),
        max($"l_orderkey").as("max_orderkey"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        min($"l_returnflag").as("min_flag"),
        max($"l_returnflag").as("max_flag"))
  }

  private val gcolSpjOnce = scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** Orders + lineitem in graft-columnar, each CLUSTERED on the shared
    * bucket key `bkt = o|l_orderkey % 32` via the write path's
    * `clusterBy` option: `RequiresDistributionAndOrdering` makes the
    * ENGINE shuffle+sort on bkt before any writer runs, and the writer
    * cuts blocks at value boundaries, so every block is pure
    * (zone-map min == max == its single bucket). That purity is what
    * the read side reports as `KeyGroupedPartitioning(identity(bkt))`.
    * Ingest-time layout work, pre-paid untimed like the q48 buckets.
    */
  private[graft] def ensureGcolSpjPair(s: SparkSession, dir: String): (String, String) =
    gcolSpjOnce.getOrElseUpdate(dir, {
      val oOut = Core.tmp("graft_gcol_spj_orders")
      val lOut = Core.tmp("graft_gcol_spj_lineitem")
      Tables.orders(s, dir)
        .select(pmod(col("o_orderkey"), lit(32L)).cast(IntegerType).as("bkt"),
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .write.format("graft-columnar").option("clusterBy", "bkt")
        .mode("overwrite").save(oOut)
      Tables.lineitem(s, dir)
        .select(pmod(col("l_orderkey"), lit(32L)).cast(IntegerType).as("bkt"),
          col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.format("graft-columnar").option("clusterBy", "bkt")
        .mode("overwrite").save(lOut)
      (oOut, lOut)
    })

  /** The lazy q328 join frame — factored out so PlanGuardsSpec can
    * inspect the executed plan under the same conf window the query
    * runs in (zero shuffle Exchange below the join).
    */
  private[graft] def gcolSpjFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (oPath, lPath) = ensureGcolSpjPair(s, dir)
    val ro = s.read.format("graft-columnar").load(oPath)
    val rl = s.read.format("graft-columnar").load(lPath)
    // join keys ⊇ partition keys: the bkt equality is IMPLIED by the
    // orderkey equality (bkt is the same function of the key on both
    // sides) — it is there to hand the planner the layout fact, not to
    // change semantics, so the oracle is the plain orderkey join
    ro.join(rl, ro("bkt") === rl("bkt") &&
        ro("o_orderkey") === rl("l_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor($"l_quantity" * 100).cast(LongType)).as("qty_centi"),
        sum(floor($"l_extendedprice" * 100).cast(LongType)).as("price_cents"))
      .orderBy($"o_orderpriority")
  }

  /** The SPJ conf window: storage-partitioned joins are opt-in
    * (`v2.bucketing.enabled`), the bkt⊂(bkt,key) co-partition shape
    * needs `requireAllClusterKeysForCoPartition=false`, and broadcast
    * is disabled because at the 100-TB design point NEITHER side of an
    * orders⋈lineitem join fits a broadcast — the measured plan should
    * be the one a cluster would run. Scoped snapshot+restore (q322
    * precedent) so nothing leaks into later queries.
    */
  private[graft] def withSpjConfs[T](s: SparkSession)(body: => T): T = {
    val settings = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = settings.map { case (k, _) => k -> s.conf.getOption(k) }
    settings.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private val gcolMergeOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Customer in graft-columnar, key-sorted into 4 files (tight disjoint
    * custkey ranges per file), with the q62 change classes MERGED in via
    * GcolRowOps.merge — the copy-on-write row-level rung. Built once per
    * (jvm, sf dir); the merge itself is the fixture's point: affected
    * files are found by a metadata range join, only they are rewritten,
    * inserts (+1e9 keys, outside every file range) land as new rows.
    */
  private[graft] def ensureGcolMerged(s: SparkSession, dir: String): String =
    gcolMergeOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_merge")
      val base = Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal")
      base.repartitionByRange(4, $"c_custkey")
        .sortWithinPartitions("c_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      // the q62 change classes in one batch: update %10 (+100 bal),
      // delete %7∧¬%10, insert %13 as shifted keys (U with no match)
      val changes = base.filter($"c_custkey" % 10 === 0)
        .select($"c_custkey", lit("U").as("op"),
          lit(null).cast(StringType).as("new_name"),
          ($"c_acctbal" + 100.0).as("new_bal"))
        .unionAll(base.filter($"c_custkey" % 7 === 3 && $"c_custkey" % 10 =!= 0)
          .select($"c_custkey", lit("D").as("op"),
            lit(null).cast(StringType).as("new_name"),
            lit(null).cast(DoubleType).as("new_bal")))
        .unionAll(base.filter($"c_custkey" % 13 === 0)
          .select(($"c_custkey" + 1000000000L).as("c_custkey"),
            lit("U").as("op"),
            concat(lit("Customer#new"), $"c_custkey".cast(StringType))
              .as("new_name"),
            lit(1000.0).as("new_bal")))
      graft.sources.GcolRowOps.merge(s, out, changes, "c_custkey",
        Map("c_name" -> "new_name", "c_acctbal" -> "new_bal"))
      out
    })

  // q329: MERGE INTO a graft-columnar table by copy-on-write — row-level
  // operations on the library's own format (GcolRowOps.merge): the
  // change keys range-join against BROADCAST footer ranges to pick the
  // affected files (metadata-sized work), only those files' rows are
  // re-read (the scan's `files` option) and rewritten through the q62
  // full-outer change algebra, and the commit moves uid-named files in,
  // drops the replaced ones, and journals the delta once
  // (ColumnarSourceSpec pins the exactly-once journal append and that
  // unaffected files survive byte-identical). Oracle: the q105 change
  // algebra in pure SQL over the parquet twin — a storage-level merge
  // must equal the logical merge exactly. Determinism: bal + 100.0 is
  // one exact IEEE add on both engines (q105 precedent); no other
  // arithmetic touches the hash.
  // Scale shape: cost is churn + affected-files, never table-sized —
  // the CoW contract that makes daily upserts affordable at 100 TB.
  private def gcolMerge(s: SparkSession, dir: String): DataFrame = {
    val path = ensureGcolMerged(s, dir)
    s.read.format("graft-columnar").load(path).orderBy("c_custkey")
  }

  private val gcolDupEventsOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Events in graft-columnar with a REPLAYED duplicate wave: arrival 1
    * is the full table, arrival 2 re-appends every event_id % 5 == 0 row
    * (an at-least-once upstream retrying — the duplication pattern
    * `dropDuplicatesWithinWatermark` exists for). The journal orders
    * the two arrivals for the streaming read.
    */
  private[graft] def ensureGcolDupEvents(s: SparkSession, dir: String): String =
    gcolDupEventsOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_events_dup")
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", $"ts", $"event_type")
      ev.write.format("graft-columnar").mode("overwrite").save(out)
      ev.filter($"event_id" % 5 === 0)
        .write.format("graft-columnar").mode("append").save(out)
      out
    })

  // q330: STREAMING DEDUPLICATION, live — the row itself runs a real
  // micro-batch query: readStream over the gcol journal (arrival 1 =
  // all events, arrival 2 = an at-least-once replay of every 5th event),
  // `withWatermark(ts) + dropDuplicatesWithinWatermark(event_id)`, the
  // state-bounded streaming twin of exact dedup q20/q78. Survivors land
  // in a scratch parquet via foreachBatch and the returned frame is
  // their per-day census (count + exact event_id checksum — the
  // checksum pins the surviving SET, not just its size). The oracle
  // builds the same duplicated union in SQL and dedups it: live
  // streaming == batch semantics, hash-checked (ColumnarSourceSpec
  // additionally pins the two-arrival exactly-once path and that state
  // EVICTS once the watermark passes). Determinism: duplicates are
  // exact copies, so the surviving set is the distinct-event set
  // regardless of which copy wins; integer epoch-day and id sums only.
  // Scale shape: dedup state is bounded by the watermark delay × event
  // rate, not corpus size — the property that makes streaming dedup
  // viable at 100 TB/day; census is calendar-bounded.
  private def streamDedupCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolDupEvents(s, dir)
    val stage = Core.tmp("gcol_dedup_out")
    val ckpt = Core.tmp("gcol_dedup_ckpt")
    val q = s.readStream.format("graft-columnar").load(path)
      // delay >> data span: nothing is late in the replayed-history
      // demo, so live must equal batch EXACTLY; production tunes this
      // to the real replay horizon and pays state for exactly that
      .withWatermark("ts", "3650 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(stage); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(stage)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("epoch_day"))
      .agg(count(lit(1)).as("n_events"),
        sum($"event_id").as("id_sum"),
        count(when($"event_type" === "purchase", 1)).as("n_purchases"))
      .orderBy($"epoch_day")
  }

  private val gcolMorOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Customer in graft-columnar with the q62 delete class applied as a
    * MERGE-ON-READ delete sidecar (GcolRowOps.deleteWhereMoR): no data
    * file rewritten, the deleted keys live under `_gcol_deletes/`.
    */
  private[graft] def ensureGcolMorTable(s: SparkSession, dir: String): String =
    gcolMorOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_mor")
      Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .repartitionByRange(4, $"c_custkey")
        .sortWithinPartitions("c_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      graft.sources.GcolRowOps.deleteWhereMoR(s, out, "c_custkey",
        "c_custkey % 7 = 3 AND c_custkey % 10 != 0")
      out
    })

  // q331: MERGE-ON-READ deletes on graft-columnar — the copy-on-write
  // complement (q329 is CoW): a delete writes ONLY the churn-sized key
  // sidecar (`_gcol_deletes/`, itself a gcol table invisible to the
  // main scan) and every read subtracts it with a key anti-join until
  // compaction folds it in — Iceberg v2's position/equality-delete
  // trade, delete-heavy tables pay O(churn) writes instead of O(file)
  // rewrites. The row reads through GcolRowOps.readMoR; the oracle is
  // the survivor predicate in SQL. ColumnarSourceSpec pins the other
  // halves SQL cannot see: the sidecar is invisible to the plain scan,
  // compact() makes plain == MoR and clears the sidecar, and the
  // anti-join build side is the delete set. Determinism: no arithmetic
  // at all — key-predicate row selection only.
  // Scale shape: the anti-join broadcasts the churn-sized delete set
  // against the streamed table scan; read amplification is bounded by
  // compaction cadence, the knob a 100-TB deployment tunes.
  private def gcolMorRead(s: SparkSession, dir: String): DataFrame = {
    val path = ensureGcolMorTable(s, dir)
    graft.sources.GcolRowOps.readMoR(s, path, "c_custkey")
      .orderBy("c_custkey")
  }

  private val gcolSessEventsOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Events (user_id, ts) in graft-columnar plus a far-future SENTINEL
    * arrival (user_id = -1): the closing tick that advances the final
    * watermark past every real session's inactivity timer.
    */
  private[graft] def ensureGcolSessionEvents(s: SparkSession, dir: String): String =
    gcolSessEventsOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_sess_events")
      val ev = Tables.events(s, dir).select($"user_id", $"ts")
      ev.write.format("graft-columnar").mode("overwrite").save(out)
      ev.agg(max($"ts").as("m")).select(lit(-1L).as("user_id"),
          ($"m" + expr("INTERVAL 3650 DAYS")).as("ts"))
        .write.format("graft-columnar").mode("append").save(out)
      out
    })

  // q332: EVENT-TIME TIMER sessionization, live — transformWithState
  // with timers (streaming/TimerSessionizer.scala), the half of the
  // arbitrary-state API no input row can drive: a session closes on
  // INACTIVITY, so the emit happens in handleExpiredTimer when the
  // WATERMARK passes `session end + 30 min`, not when data arrives.
  // The row runs the real micro-batch query over the gcol journal
  // (events + a sentinel closing tick) and returns every closed session
  // (user, start, end, event count). Oracle: the classic lag/gap-break
  // sessionization in SQL — timer-closed streaming sessions must equal
  // the batch gap algorithm exactly. Determinism: epoch-micro integers
  // only; within-batch rows are sorted per key before folding, and
  // same-timestamp ties merge into one session under both algorithms.
  // Scale shape: state = one (session, armed-expiry) pair per ACTIVE
  // user (concurrent-user-bounded, never event-volume); timers fire by
  // RocksDB expiry range scan, O(expired) not O(keys).
  private def timerSessions(s: SparkSession, dir: String): DataFrame = {
    val path = ensureGcolSessionEvents(s, dir)
    graft.streaming.TimerSessionizer
      .sessions(s, path, "q332_timer_sessions_" +
        java.util.UUID.randomUUID().toString.replace("-", "_"))
      .orderBy("user_id", "start_us")
  }

  // q333: METADATA COLUMNS on graft-columnar (SupportsMetadataColumns —
  // the hidden `_gcol_file` / `_gcol_block` / `_gcol_pos` provenance
  // surface Delta/Iceberg expose as `_metadata`, synthesized by the
  // reader, zero bytes on disk): a per-bucket census of the q328
  // clustered orders table proving the PHYSICAL layout the clustered
  // write promised — every bucket lives in exactly ONE file (the
  // engine's clustered distribution), its block count is exactly
  // ceil(n/rowsPerBlock) (blocks cut at value boundaries), and row
  // positions are block-local. The oracle derives all of it by pure
  // arithmetic from the bucket counts — layout metadata must be
  // PREDICTABLE from the write contract, not just present.
  // Determinism: counts and integer arithmetic only.
  // Scale shape: one scan + bucket-sized census; the metadata columns
  // are per-block constants/sequences, codegen-consumed like any other
  // vector.
  private def metadataCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (oPath, _) = ensureGcolSpjPair(s, dir)
    s.read.format("graft-columnar").load(oPath)
      .select($"bkt", col("_gcol_file"), col("_gcol_block"), col("_gcol_pos"))
      .groupBy($"bkt")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("_gcol_file")).as("n_files"),
        countDistinct(concat_ws(":", col("_gcol_file"),
          col("_gcol_block"))).as("n_blocks"),
        max(col("_gcol_pos")).cast(LongType).as("max_pos"))
      .orderBy($"bkt")
  }

  private val gcolPosMorOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Lineitem (no unique key!) in graft-columnar with a POSITION-delete
    * sidecar: every `l_quantity <= 5` row's (file, block, pos) address
    * recorded under `_gcol_pos_deletes/` — no data file rewritten.
    */
  private[graft] def ensureGcolPosMor(s: SparkSession, dir: String): String =
    gcolPosMorOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_posmor")
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
          $"l_returnflag")
        .write.format("graft-columnar").mode("overwrite").save(out)
      graft.sources.GcolRowOps.deleteWherePos(s, out, "l_quantity <= 5")
      out
    })

  // q334: POSITION-delete vectors on graft-columnar — the key-free twin
  // of q331's equality deletes, enabled by q333's metadata columns: a
  // delete records ROW ADDRESSES (file, block, pos), which works on
  // tables with NO unique key (lineitem) and can name one physical row
  // among value-identical duplicates — the case no key anti-join can
  // express (spec pins exactly that, plus: rewrites refuse while
  // addresses are pending, and compactPos folds the sidecar in and
  // converges plain == MoR). The row reads through readMoRPos and
  // censuses by returnflag with exact integer cents; the oracle applies
  // the survivor predicate in SQL. Determinism: the predicate selects
  // value-defined rows, so WHICH duplicate holds which address never
  // reaches the result.
  // Scale shape: O(churn) address rows written; reads pay a broadcast
  // anti-join on the address triple until compaction — read
  // amplification bounded by compaction cadence, as q331.
  private def gcolPosMorRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolPosMor(s, dir)
    graft.sources.GcolRowOps.readMoRPos(s, path)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(floor($"l_quantity" * 100).cast(LongType)).as("qty_centi"),
        sum(floor($"l_extendedprice" * 100).cast(LongType)).as("price_cents"))
      .orderBy($"l_returnflag")
  }

  private val gcolBloomOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Orders in graft-columnar sorted by CUSTKEY with a per-block bloom
    * on o_orderkey (`option("bloomFor","o_orderkey")`): the layout where
    * zone maps are BLIND for key lookups — every block's orderkey
    * [min,max] spans the whole domain because the sort key is something
    * else. The bloom is the point-predicate index for exactly this.
    */
  private[graft] def ensureGcolBloomOrders(s: SparkSession, dir: String): String =
    gcolBloomOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_bloom_orders")
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderpriority")
        .repartitionByRange(4, $"o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .option("bloomFor", "o_orderkey")
        .mode("overwrite").save(out)
      out
    })

  // q335: per-block BLOOM-filter pruning on graft-columnar — the
  // point-predicate index for columns zone maps cannot help (high-
  // cardinality, UNSORTED: here orderkey lookups in a custkey-sorted
  // table, the classic "find my order in a fact laid out for someone
  // else's query" shape). An opt-in footer bloom (1 byte/row, k=5,
  // ~2-3% false keeps) answers `=` and `IN` per block — and therefore
  // also sharpens runtime In-filters (DPP) for free, since both ride
  // mayMatch. The lookup census is hash-checked against the plain SQL
  // filter; ColumnarSourceSpec pins the PRUNING (unique-key lookup
  // opens ~1 of N blocks where zone maps alone open all N) and the
  // canonical-form contract (integral literal widths all match).
  // Determinism: bloom affects only which blocks are OPENED, never the
  // rows that survive the exact residual filter; exact cents sums.
  // Scale shape: footers grow 1 byte/row for the chosen column —
  // bounded, driver-metadata-scale; block IO for a point lookup drops
  // from O(table) to O(matches + fpp·blocks).
  private def gcolBloomLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolBloomOrders(s, dir)
    s.read.format("graft-columnar").load(path)
      .filter($"o_orderkey".isin(17L, 293L, 641L, 987L, 1361L))
      .agg(count(lit(1)).as("n_rows"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"),
        sum(floor($"o_totalprice" * 100).cast(LongType)).as("price_cents"))
  }

  private val gcolEvoOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Customer in graft-columnar taken through the FULL schema-evolution
    * ladder (GcolSchemaOps): written at v0 as (c_custkey, c_name,
    * c_acctbal), then rename c_acctbal → acct_bal, add loyalty_pts
    * (bigint, null in old files), drop c_name, then a v1 APPEND in the
    * evolved schema (shifted keys, loyalty populated). Data files are
    * never rewritten — the v0 files still carry their original footer
    * schema and read through the lineage.
    */
  private[graft] def ensureGcolEvolved(s: SparkSession, dir: String): String =
    gcolEvoOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_evolved")
      val base = Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal")
      base.repartitionByRange(4, $"c_custkey")
        .sortWithinPartitions("c_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      graft.sources.GcolSchemaOps.renameColumn(out, "c_acctbal", "acct_bal")
      graft.sources.GcolSchemaOps.addColumn(out, "loyalty_pts", LongType)
      graft.sources.GcolSchemaOps.dropColumn(out, "c_name")
      base.select(($"c_custkey" + 2000000000L).as("c_custkey"),
          $"c_acctbal".as("acct_bal"),
          ($"c_custkey" % 97).as("loyalty_pts"))
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("append").save(out)
      out
    })

  // q336: SCHEMA EVOLUTION on graft-columnar — add/drop/rename as
  // metadata-only DDL (GcolSchemaOps; the Iceberg/Delta `ALTER TABLE`
  // rung, r15 verdict item #1): old data files are NEVER rewritten and
  // read through a rename lineage in the table-level `_gcol_schema`
  // file — a renamed column keeps serving (and zone-map-PRUNING, the
  // scan pushes filters through the rename per file) from its old
  // segments, an added column synthesizes an all-null vector in
  // pre-DDL files, a dropped column's bytes just stop being read. The
  // census scans the evolved union (v0 files + v1 append) through one
  // schema; the oracle builds the same union in SQL. ColumnarSourceSpec
  // pins what SQL cannot see: v0 files byte-identical through all
  // three DDLs, pruning alive across the rename, type changes and name
  // recycling refused. Determinism: count + exact integer cents/sums.
  // Scale shape: each DDL is one O(files) driver metadata sweep plus an
  // atomic file write — `ALTER TABLE` on a 100 TB table in
  // milliseconds, the property every long-lived production table hits
  // within months.
  private def gcolSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolEvolved(s, dir)
    s.read.format("graft-columnar").load(path)
      .filter($"acct_bal" > 0.0)
      .groupBy(($"c_custkey" % 10).as("decile"))
      .agg(count(lit(1)).as("n_rows"),
        sum(floor($"acct_bal" * 100).cast(LongType)).as("bal_cents"),
        count($"loyalty_pts").as("n_loyal"),
        sum($"loyalty_pts").as("loyal_sum"))
      .orderBy($"decile")
  }

  private val gcolPosUpdOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Lineitem in graft-columnar with a POSITION-UPDATE vector applied
    * (GcolRowOps.updateWherePos): every `l_quantity <= 3` row's address
    * joins the delete vector and its patched replacement (price + 1.0,
    * returnflag 'U') lands in the upsert sidecar — NO data file
    * rewritten.
    */
  private[graft] def ensureGcolPosUpdated(s: SparkSession, dir: String): String =
    gcolPosUpdOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_posupd")
      Tables.lineitem(s, dir)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice",
          $"l_returnflag")
        .write.format("graft-columnar").mode("overwrite").save(out)
      graft.sources.GcolRowOps.updateWherePos(s, out, "l_quantity <= 3",
        Map("l_extendedprice" -> "l_extendedprice + 1.0",
          "l_returnflag" -> "'U'"))
      out
    })

  // q337: POSITION-UPDATE vectors on graft-columnar — UPDATE as a
  // delete+insert pair riding q334's position sidecars (r15 verdict
  // item #3, Iceberg v2's MoR update): the old row's ADDRESS joins the
  // delete vector, the patched replacement lands in an upsert sidecar,
  // and no data file is rewritten — a one-column UPDATE stops paying
  // q329's whole-file CoW rewrite. Reads anti-join the deletes and
  // union the upserts (readMoRPos); compactPos folds both back in and
  // plain == MoR converges (spec-pinned, along with data files byte-
  // identical through the update and the no-stacking refusal). Oracle:
  // the same UPDATE as a CASE expression in SQL — the storage-level
  // update must equal the logical one exactly. Determinism: price+1.0
  // is one exact IEEE add; census is count + exact integer cents.
  // Scale shape: O(churn) writes, read amplification bounded by
  // compaction cadence — the delete-heavy trade q331/q334 document,
  // now covering updates.
  private def gcolPosUpdateRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolPosUpdated(s, dir)
    graft.sources.GcolRowOps.readMoRPos(s, path)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(floor($"l_quantity" * 100).cast(LongType)).as("qty_centi"),
        sum(floor($"l_extendedprice" * 100).cast(LongType)).as("price_cents"))
      .orderBy($"l_returnflag")
  }

  private val gcolBloomRetroOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Orders in graft-columnar custkey-sorted WITHOUT write-time blooms,
    * then retrofitted via GcolIndexOps.addBloom(o_orderkey): the q335
    * layout reached by MAINTENANCE instead of foresight — footers
    * rewritten in place, data segments byte-identical (spec-pinned).
    */
  private[graft] def ensureGcolBloomRetrofit(s: SparkSession, dir: String): String =
    gcolBloomRetroOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_bloom_retro")
      Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderpriority")
        .repartitionByRange(4, $"o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      graft.sources.GcolIndexOps.addBloom(s, out, Set("o_orderkey"))
      out
    })

  // q338: RETROFITTED bloom indexes on graft-columnar — q335's
  // point-predicate blooms added to an EXISTING table by a maintenance
  // op (GcolIndexOps.addBloom, r15 verdict item #7), the way compact()
  // retrofits layout: existing tables were written before anyone knew
  // which column the lookups would hit, and re-ingesting 100 TB to gain
  // an index is not a plan. The op decodes only the indexed column,
  // one task per file, truncates the old footer off and appends one
  // carrying the blooms — file names unchanged (journal unaffected),
  // data segments byte-identical, idempotent on re-run (spec pins all
  // three plus the lookup pruning going green). Oracle: the identical
  // IN-lookup over the parquet twin — an index must change no row.
  // Determinism: blooms affect which blocks are OPENED, never the rows
  // surviving the exact residual filter; exact cents sums.
  // Scale shape: one column-scoped scan of the indexed column,
  // parallel per file; footer growth 1 byte/row.
  private def gcolBloomRetrofitLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolBloomRetrofit(s, dir)
    s.read.format("graft-columnar").load(path)
      .filter($"o_orderkey".isin(23L, 457L, 811L, 1201L, 1733L))
      .agg(count(lit(1)).as("n_rows"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"),
        sum(floor($"o_totalprice" * 100).cast(LongType)).as("price_cents"))
  }

  // q328: storage-partitioned gcol⋈gcol join — the last DSv2 rung
  // (SupportsReportPartitioning + SupportsReportOrdering): both tables
  // are clustered on the same bucket key at WRITE time, the scans
  // report KeyGroupedPartitioning(identity(bkt)), and Spark aligns the
  // 32 partition values directly — the join runs with ZERO shuffle
  // exchanges (PlanGuardsSpec pins it), the way q48 proves for parquet
  // buckets. The result is executed eagerly INSIDE the scoped conf
  // window (the plan, not the values, depends on the confs) and pinned
  // to a local relation. Oracle: the plain orderkey join over the
  // parquet twins — a layout must never change one bit of the result.
  // Determinism: count + exact integer centi-sums, ordered by the
  // 5-value priority dictionary.
  // Scale shape: at 100 TB this is THE avoidable cost on the native
  // format — two table-wide exchanges (the dominant shuffle of any
  // fact-fact join) elided by metadata; per-partition work stays a
  // local sort-merge over one bucket's blocks.
  private def gcolSpjJoin(s: SparkSession, dir: String): DataFrame =
    withSpjConfs(s) {
      val res = gcolSpjFrame(s, dir)
      val rows = res.collect() // execute inside the conf window
      s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
    }

  private val gcolBucketSpjOnce = scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** Orders + lineitem written with the `bucketSpec` layout: the
    * materialized bucket-id column (pmod(key, 32)) clusters the blocks,
    * and the footer declares it as bucket(32, orderkey) — so the scan
    * reports the TRANSFORM of the key, not identity of the id.
    */
  private[graft] def ensureGcolBucketSpjPair(s: SparkSession, dir: String): (String, String) =
    gcolBucketSpjOnce.getOrElseUpdate(dir, {
      val oOut = Core.tmp("graft_gcol_bspj_orders")
      val lOut = Core.tmp("graft_gcol_bspj_lineitem")
      Tables.orders(s, dir)
        .select(pmod(col("o_orderkey"), lit(32L)).cast(IntegerType).as("bkt"),
          col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .write.format("graft-columnar").option("clusterBy", "bkt")
        .option("bucketSpec", "o_orderkey:32")
        .mode("overwrite").save(oOut)
      Tables.lineitem(s, dir)
        .select(pmod(col("l_orderkey"), lit(32L)).cast(IntegerType).as("bkt"),
          col("l_orderkey"), col("l_quantity"))
        .write.format("graft-columnar").option("clusterBy", "bkt")
        .option("bucketSpec", "l_orderkey:32")
        .mode("overwrite").save(lOut)
      (oOut, lOut)
    })

  /** The lazy q339 join frame, factored for PlanGuardsSpec: loaded via
    * GcolCatalog (the function-catalog route that resolves `bucket`),
    * joined on the KEY ALONE — no bucket column in the join condition
    * or even the projection.
    */
  private[graft] def gcolBucketSpjFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (oPath, lPath) = ensureGcolBucketSpjPair(s, dir)
    s.conf.set("spark.sql.catalog.gcol_cat", "graft.sources.GcolCatalog")
    val ro = s.table(s"gcol_cat.`$oPath`")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    val rl = s.table(s"gcol_cat.`$lPath`")
      .select($"l_orderkey", $"l_quantity")
    ro.join(rl, ro("o_orderkey") === rl("l_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor($"l_quantity" * 100).cast(LongType)).as("qty_centi"),
        sum(floor($"o_totalprice" * 100).cast(LongType)).as("opri_cents"))
      .orderBy($"o_orderpriority")
  }

  // q339: BUCKET-transform storage-partitioned join — q328 taken from
  // identity clustering to the real lakehouse shape (r15 verdict item
  // #4): both tables are written with `bucketSpec` (a materialized
  // pmod(key, 32) id clustering the blocks, declared in the footer as
  // bucket(32, key)), the scans report KeyGroupedPartitioning of the
  // TRANSFORM, and Spark resolves the V2 `bucket` function through
  // GcolCatalog (TableCatalog + FunctionCatalog; a plain format() read
  // has no function catalog, so the transform would stay unresolved —
  // which is WHY this rung needs the catalog; the fallback is a normal
  // shuffle plan, spec-pinned sound). The join condition is the KEY
  // EQUALITY ALONE — the user never names the bucket column, and
  // differently-sized tables co-partition because their bucket-ID value
  // sets agree even though their key sets differ, the case identity
  // clustering cannot express. Zero shuffle exchanges below the join
  // (PlanGuardsSpec). Oracle: the plain orderkey join over the parquet
  // twins. Determinism: count + exact integer centi-sums.
  // Scale shape: the two table-wide exchanges of a fact-fact join
  // elided by metadata + one resolvable function — at 100 TB the
  // dominant avoidable cost, now without requiring both tables to
  // carry aligned value sets.
  private def gcolBucketSpjJoin(s: SparkSession, dir: String): DataFrame =
    withSpjConfs(s) {
      val res = gcolBucketSpjFrame(s, dir)
      val rows = res.collect() // execute inside the conf window
      s.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
    }

  private val gcolSnapOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Customer in graft-columnar with SNAPSHOT COMMITS enabled, then the
    * q329 change classes merged: v1 = the original table, v2 = the
    * merged state; the replaced files stay on disk backing v1.
    */
  private[graft] def ensureGcolSnapshots(s: SparkSession, dir: String): String =
    gcolSnapOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_snap")
      val base = Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_acctbal")
      base.repartitionByRange(4, $"c_custkey")
        .sortWithinPartitions("c_custkey")
        .write.format("graft-columnar").option("rowsPerBlock", "2048")
        .mode("overwrite").save(out)
      graft.sources.GcolSnapshots.enable(out)
      val changes = base.filter($"c_custkey" % 10 === 0)
        .select($"c_custkey", lit("U").as("op"),
          lit(null).cast(StringType).as("new_name"),
          ($"c_acctbal" + 100.0).as("new_bal"))
        .unionAll(base.filter($"c_custkey" % 7 === 3 && $"c_custkey" % 10 =!= 0)
          .select($"c_custkey", lit("D").as("op"),
            lit(null).cast(StringType).as("new_name"),
            lit(null).cast(DoubleType).as("new_bal")))
        .unionAll(base.filter($"c_custkey" % 13 === 0)
          .select(($"c_custkey" + 1000000000L).as("c_custkey"),
            lit("U").as("op"),
            concat(lit("Customer#new"), $"c_custkey".cast(StringType))
              .as("new_name"),
            lit(1000.0).as("new_bal")))
      graft.sources.GcolRowOps.merge(s, out, changes, "c_custkey",
        Map("c_name" -> "new_name", "c_acctbal" -> "new_bal"))
      out
    })

  // q340: SNAPSHOT COMMITS + TIME TRAVEL on graft-columnar — the
  // metadata-pointer commit model (GcolSnapshots; Delta/Iceberg's
  // answer to the one hole a directory-listing read path cannot close:
  // a reader racing a CoW publish seeing rewritten rows twice). Opt-in
  // per table: every commit writes `_gcol_snapshots/v{N}.json` and
  // atomically swaps the `_gcol_head` pointer LAST; replaced files are
  // KEPT on disk, so concurrent readers plan from the old version or
  // the new one, never a mix, and `option("asOf", N)` reproduces any
  // retained version exactly — the reproducible-training-run audit
  // surface. vacuum() is the explicit GC (reading a vacuumed version
  // fails loudly; spec-pinned, along with atomic-pointer content, kept
  // replaced files, append/overwrite bumps and the lost-update guard).
  // The row reads BOTH versions of a snapshot-merged table; the oracle
  // computes both states in SQL — time travel must be exact, not
  // approximate. Determinism: counts + exact cents/key sums; bal+100.0
  // is one exact IEEE add (q329 rule).
  // Scale shape: a snapshot is O(files) names, written once per commit
  // and read once per scan planning — the same driver metadata budget
  // the footer sweep pays; data file IO is untouched.
  private def gcolSnapshotTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolSnapshots(s, dir)
    def census(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n_rows"),
        sum(floor($"c_acctbal" * 100).cast(LongType)).as("bal_cents"),
        sum($"c_custkey").as("key_sum"))
        .select(lit(tag).as("state"), $"n_rows", $"bal_cents", $"key_sum")
    census(s.read.format("graft-columnar").option("asOf", "1").load(path),
        "1_original")
      .unionAll(census(s.read.format("graft-columnar").load(path),
        "2_merged"))
      .orderBy($"state")
  }

  private val gcolIncrOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Snapshot-enabled customer table with two APPEND commits after the
    * base: v1 = base, v2 = +2e9-shifted batch (bal + 10), v3 =
    * +3e9-shifted batch (bal + 25) — the append-mostly ingest shape
    * whose increments are exactly the added files.
    */
  private[graft] def ensureGcolIncremental(s: SparkSession, dir: String): String =
    gcolIncrOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_incr")
      val base = Tables.customer(s, dir).select($"c_custkey", $"c_acctbal")
      base.write.format("graft-columnar").mode("overwrite").save(out)
      graft.sources.GcolSnapshots.enable(out)
      base.select(($"c_custkey" + 2000000000L).as("c_custkey"),
          ($"c_acctbal" + 10.0).as("c_acctbal"))
        .write.format("graft-columnar").mode("append").save(out)
      base.select(($"c_custkey" + 3000000000L).as("c_custkey"),
          ($"c_acctbal" + 25.0).as("c_acctbal"))
        .write.format("graft-columnar").mode("append").save(out)
      out
    })

  // q341: INCREMENTAL snapshot reads — the file-level change feed
  // (GcolSnapshots.addedFiles): an incremental consumer that has
  // processed version N reads ONLY the files later commits added
  // (`option("files", addedFiles(N, head))`), O(delta) instead of
  // O(table) — the batch-side twin of the streaming journal, and the
  // shape every nightly ingest/dedup pipeline wants ("process what
  // arrived since my last run", the Delta CDF idea at file grain; for
  // CoW rewrites the added files also carry surviving rewritten rows —
  // consumers needing row-level +/- diff against removedFiles, still
  // O(churn)). The row censuses everything added AFTER v1 on a
  // three-commit table; the oracle builds the two appended batches in
  // SQL. Determinism: +10.0/+25.0 are single exact IEEE adds; count +
  // exact cents/key sums.
  // Scale shape: planning is two O(files) name-list diffs; the scan
  // reads only the delta's bytes.
  private def gcolIncrementalRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolIncremental(s, dir)
    val head = graft.sources.GcolSnapshots.headVersion(path).get
    val added = graft.sources.GcolSnapshots.addedFiles(path, 1L, head)
    s.read.format("graft-columnar")
      .option("files", added.mkString(",")).load(path)
      .agg(count(lit(1)).as("n_rows"),
        sum(floor($"c_acctbal" * 100).cast(LongType)).as("bal_cents"),
        sum($"c_custkey").as("key_sum"))
  }

  private val gcolCompactOnce = scala.collection.concurrent.TrieMap[String, String]()

  /** Customer sprayed into 64 tiny gcol files (the streaming-sink
    * small-file pathology), snapshot-enabled, then bin-packed by
    * GcolRowOps.compactFiles — published atomically via the head swap.
    */
  private[graft] def ensureGcolCompacted(s: SparkSession, dir: String): String =
    gcolCompactOnce.getOrElseUpdate(dir, {
      import s.implicits._
      val out = Core.tmp("graft_gcol_compacted")
      Tables.customer(s, dir).select($"c_custkey", $"c_name", $"c_acctbal")
        .repartition(64)
        .write.format("graft-columnar").mode("overwrite").save(out)
      graft.sources.GcolSnapshots.enable(out)
      graft.sources.GcolRowOps.compactFiles(s, out,
        targetBytes = 8L * 1024 * 1024)
      out
    })

  // q342: SMALL-FILE COMPACTION on graft-columnar — the routine 100-TB
  // maintenance chore (streaming sinks and over-parallel writers leave
  // thousands of KB files whose per-file open/footer cost dominates
  // scans; q318 prices it, Layout.compact does it for parquet, this is
  // the native format's version): GcolRowOps.compactFiles bin-packs
  // the sub-threshold files into ~target-sized outputs through a
  // `files`-scoped scan + one shuffle, preserves codec/clusterBy/
  // bucketSpec (clustered tables keep their storage-partitioned
  // joins), refuses while position sidecars are pending, and publishes
  // through the shared CoW tail — on snapshot tables the head-pointer
  // swap makes the layout change ATOMIC to readers, with the
  // pre-compaction version still time-travelable. Oracle: the plain
  // customer census — compaction must not change one bit. Spec pins
  // the file-count collapse, content equality, snapshot atomicity and
  // the untouched-large-file guarantee. Determinism: no arithmetic
  // beyond exact cents.
  // Scale shape: O(small-file bytes) read + one shuffle into
  // ceil(bytes/target) writers — never table-sized when the table is
  // mostly healthy.
  private def gcolCompactedRead(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = ensureGcolCompacted(s, dir)
    s.read.format("graft-columnar").load(path)
      .agg(count(lit(1)).as("n_rows"),
        sum(floor($"c_acctbal" * 100).cast(LongType)).as("bal_cents"),
        sum($"c_custkey").as("key_sum"),
        sum(length($"c_name")).as("name_len_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q342_gcol_compaction" -> (gcolCompactedRead _),
    "q341_gcol_incremental" -> (gcolIncrementalRead _),
    "q340_gcol_snapshots" -> (gcolSnapshotTimeTravel _),
    "q339_gcol_bucket_spj" -> (gcolBucketSpjJoin _),
    "q338_gcol_bloom_retrofit" -> (gcolBloomRetrofitLookup _),
    "q337_gcol_pos_update" -> (gcolPosUpdateRead _),
    "q336_schema_evolution" -> (gcolSchemaEvolution _),
    "q335_gcol_bloom" -> (gcolBloomLookup _),
    "q334_gcol_pos_delete" -> (gcolPosMorRead _),
    "q333_metadata_cols" -> (metadataCensus _),
    "q332_timer_sessions" -> (timerSessions _),
    "q331_gcol_mor" -> (gcolMorRead _),
    "q330_stream_dedup" -> (streamDedupCensus _),
    "q329_gcol_merge" -> (gcolMerge _),
    "q328_gcol_spj_join" -> (gcolSpjJoin _),
    "q327_columnar_topn" -> (columnarTopN _),
    "q326_metadata_agg" -> (columnarMetadataAgg _),
    "q323_columnar_scan" -> (columnarScan _),
    "q318_partition_planner" -> (partitionPlanner _),
    "q306_bloom_pruning" -> (bloomPruning _),
    "q243_zonemap_census" -> (zoneMapCensus _),
    "q210_encoding_census" -> (encodingCensus _),
    "q50_partition_prune" -> (partitionPrune _),
    "q82_orc_scan"        -> (orcScan _),
    "q86_zorder_key"      -> (zorderKey _),
    "q90_dpp_join"        -> (dppJoin _)
  )

  private val zSumSql: String =
    (0 until 10).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** q210 per-column census twin; code width via exact 2^k predicates. */
  private val encCodebits: String = "CAST(" +
    (0 to 23).map(k => s"(CASE WHEN ndv > ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ") + " AS BIGINT)"

  private def encColSql(c: String): String =
    s"""SELECT '$c' AS col_name, n, ndv, n_runs,
       |       $encCodebits AS dict_codebits,
       |       64 * n AS plain_bits,
       |       $encCodebits * n + 64 * ndv AS dict_bits,
       |       n_runs * 96 AS rle_bits
       |FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(count(DISTINCT v) AS BIGINT) AS ndv,
       |         CAST(sum(newrun) AS BIGINT) AS n_runs
       |  FROM (
       |    SELECT v, CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END
       |             AS newrun
       |    FROM (
       |      SELECT v, lag(v) OVER (PARTITION BY l_orderkey
       |               ORDER BY l_linenumber, v) AS prev
       |      FROM (SELECT l_orderkey, l_linenumber,
       |              $c AS v FROM lineitem))))""".stripMargin

  /** q318 pow2 twin: 1 << Σ[p > 2^k] — same predicate trick as q210. */
  private val pow2Sql: String = "CAST(1 << (" +
    (0 to 30).map(k =>
      s"(CASE WHEN parts_128mb > ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ") + ") AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // compaction must not change one bit of the table
    "q342_gcol_compaction" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |  CAST(sum(length(c_name)) AS BIGINT) AS name_len_sum
        |FROM customer""".stripMargin,
    // the increment == exactly the two appended batches
    "q341_gcol_incremental" ->
      """WITH delta AS (
        |  SELECT c_custkey + 2000000000 AS c_custkey,
        |         c_acctbal + 10.0 AS c_acctbal FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 3000000000, c_acctbal + 25.0 FROM customer)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum
        |FROM delta""".stripMargin,
    // time travel must be exact: v1 == the original table, head == the
    // q329 merge algebra
    "q340_gcol_snapshots" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |del AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0),
        |merged AS (
        |  SELECT c.c_custkey,
        |         coalesce(u.new_bal, c.c_acctbal) AS c_acctbal
        |  FROM customer c
        |  LEFT JOIN upd u USING (c_custkey)
        |  LEFT JOIN del d USING (c_custkey)
        |  WHERE d.c_custkey IS NULL
        |  UNION ALL
        |  SELECT c_custkey + 1000000000, 1000.0::DOUBLE
        |  FROM customer WHERE c_custkey % 13 = 0)
        |SELECT '1_original' AS state, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_sum
        |FROM customer
        |UNION ALL
        |SELECT '2_merged', CAST(count(*) AS BIGINT),
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT),
        |  CAST(sum(c_custkey) AS BIGINT)
        |FROM merged ORDER BY state""".stripMargin,
    // a bucket layout must never change one bit of the join result
    "q339_gcol_bucket_spj" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_centi,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS opri_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // a retrofitted index must change no row
    "q338_gcol_bloom_retrofit" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders
        |WHERE o_orderkey IN (23, 457, 811, 1201, 1733)""".stripMargin,
    // the storage-level MoR update == the logical UPDATE as a CASE
    "q337_gcol_pos_update" ->
      """WITH updated AS (
        |  SELECT l_orderkey, l_quantity,
        |    CASE WHEN l_quantity <= 3 THEN l_extendedprice + 1.0
        |         ELSE l_extendedprice END AS l_extendedprice,
        |    CASE WHEN l_quantity <= 3 THEN 'U'
        |         ELSE l_returnflag END AS l_returnflag
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_centi,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM updated GROUP BY 1 ORDER BY 1""".stripMargin,
    // the evolved table == the v0 rows (renamed bal, null loyalty,
    // dropped name) plus the v1 append, read through ONE schema
    "q336_schema_evolution" ->
      """WITH evolved AS (
        |  SELECT c_custkey, c_acctbal AS acct_bal,
        |         CAST(NULL AS BIGINT) AS loyalty_pts
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 2000000000, c_acctbal, c_custkey % 97
        |  FROM customer)
        |SELECT CAST(c_custkey % 10 AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(acct_bal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(count(loyalty_pts) AS BIGINT) AS n_loyal,
        |  CAST(sum(loyalty_pts) AS BIGINT) AS loyal_sum
        |FROM evolved WHERE acct_bal > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // bloom pruning opens fewer blocks but must change no row
    "q335_gcol_bloom" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders WHERE o_orderkey IN (17, 293, 641, 987, 1361)""".stripMargin,
    // position deletes == the survivor predicate (addresses are an
    // implementation detail the result must not see)
    "q334_gcol_pos_delete" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_centi,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM lineitem WHERE NOT (l_quantity <= 5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the physical layout is PREDICTABLE from the write contract:
    // 1 file per bucket (clustered distribution), ceil(n/16384) blocks
    // (value-boundary cuts), block-local positions
    "q333_metadata_cols" ->
      """SELECT CAST(o_orderkey % 32 AS INTEGER) AS bkt,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS n_files,
        |  CAST((count(*) + 16383) // 16384 AS BIGINT) AS n_blocks,
        |  CAST(CASE WHEN count(*) >= 16384 THEN 16383
        |            ELSE count(*) - 1 END AS BIGINT) AS max_pos
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // timer-closed streaming sessions == the batch lag/gap algorithm
    "q332_timer_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |m AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER w IS NULL
        |                  OR t - lag(t) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |g AS (SELECT user_id, t,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, CAST(min(t) AS BIGINT) AS start_us,
        |       CAST(max(t) AS BIGINT) AS end_us,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    // merge-on-read == the survivor predicate (no arithmetic at all)
    "q331_gcol_mor" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT (c_custkey % 7 = 3 AND c_custkey % 10 != 0)
        |ORDER BY c_custkey""".stripMargin,
    // the duplicated union deduped in SQL: live streaming == batch
    "q330_stream_dedup" ->
      """WITH raw AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  UNION ALL
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_id % 5 = 0),
        |ded AS (SELECT DISTINCT event_id, ts, event_type FROM raw)
        |SELECT epoch_us(ts) // 86400000000 AS epoch_day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |    AS BIGINT) AS n_purchases
        |FROM ded GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q105 change algebra in pure SQL (table/TableOps.scala twin):
    // a storage-level copy-on-write merge must equal the logical merge
    "q329_gcol_merge" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |del AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_custkey % 7 = 3 AND c_custkey % 10 != 0),
        |survivors AS (
        |  SELECT c.c_custkey, c.c_name,
        |         coalesce(u.new_bal, c.c_acctbal) AS c_acctbal
        |  FROM customer c
        |  LEFT JOIN upd u USING (c_custkey)
        |  LEFT JOIN del d USING (c_custkey)
        |  WHERE d.c_custkey IS NULL)
        |SELECT c_custkey, c_name, c_acctbal FROM survivors
        |UNION ALL
        |SELECT c_custkey + 1000000000,
        |       'Customer#new' || CAST(c_custkey AS VARCHAR), 1000.0::DOUBLE
        |FROM customer WHERE c_custkey % 13 = 0
        |ORDER BY c_custkey""".stripMargin,
    "q328_gcol_spj_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_centi,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q327_columnar_topn" ->
      """WITH sel AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  ORDER BY o_orderkey DESC LIMIT 1000)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM sel""".stripMargin,
    "q326_metadata_agg" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(l_quantity) AS BIGINT) AS n_qty,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
        |  CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag
        |FROM lineitem""".stripMargin,
    "q323_columnar_scan" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_centi,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM lineitem
        |WHERE l_orderkey <= 30000 AND l_quantity >= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q318_partition_planner" ->
      s"""WITH li AS (SELECT '1_lineitem' AS table_name,
        |      CAST(count(*) AS BIGINT) AS n_rows,
        |      CAST(count(*) * 68 + sum(length(l_returnflag))
        |        + sum(length(l_linestatus)) AS BIGINT) AS est_bytes
        |    FROM lineitem),
        |oo AS (SELECT '2_orders', CAST(count(*) AS BIGINT),
        |      CAST(count(*) * 32 + sum(length(o_orderstatus))
        |        + sum(length(o_orderpriority)) AS BIGINT)
        |    FROM orders),
        |ee AS (SELECT '3_events', CAST(count(*) AS BIGINT),
        |      CAST(count(*) * 32 + sum(length(event_type))
        |        + sum(length(props)) AS BIGINT)
        |    FROM events),
        |dd AS (SELECT '4_documents', CAST(count(*) AS BIGINT),
        |      CAST(count(*) * 16 + sum(length(text)) + sum(length(lang))
        |        + sum(length(source)) AS BIGINT)
        |    FROM documents),
        |u AS (SELECT * FROM li UNION ALL SELECT * FROM oo
        |      UNION ALL SELECT * FROM ee UNION ALL SELECT * FROM dd),
        |p AS (SELECT table_name, n_rows, est_bytes,
        |      (est_bytes + 134217727) // 134217728 AS parts_128mb FROM u)
        |SELECT table_name, n_rows, est_bytes,
        |  round(CAST(est_bytes AS DOUBLE) / 1048576.0, 2) AS est_mb,
        |  parts_128mb,
        |  $pow2Sql AS bucket_pow2,
        |  n_rows // parts_128mb AS rows_per_part
        |FROM p ORDER BY table_name""".stripMargin,

    "q306_bloom_pruning" ->
      """WITH li AS (
        |  SELECT l_orderkey // 1024 AS rg, l_suppkey AS sk FROM lineitem),
        |rgk AS (SELECT DISTINCT rg, sk FROM li),
        |rgstats AS (SELECT rg, CAST(min(sk) AS BIGINT) AS mn,
        |        CAST(max(sk) AS BIGINT) AS mx FROM rgk GROUP BY 1),
        |bits AS (SELECT DISTINCT rg, bit FROM (
        |    SELECT rg, CAST(concat('0x', substring(md5(
        |        concat('b1:', CAST(sk AS VARCHAR))), 1, 7)) AS BIGINT) % 4096
        |      AS bit FROM rgk
        |    UNION ALL
        |    SELECT rg, CAST(concat('0x', substring(md5(
        |        concat('b2:', CAST(sk AS VARCHAR))), 1, 7)) AS BIGINT) % 4096
        |      AS bit FROM rgk)),
        |probes AS (SELECT CAST(k AS BIGINT) AS probe_key,
        |    CAST(concat('0x', substring(md5(
        |      concat('b1:', CAST(k AS VARCHAR))), 1, 7)) AS BIGINT) % 4096 AS h1,
        |    CAST(concat('0x', substring(md5(
        |      concat('b2:', CAST(k AS VARCHAR))), 1, 7)) AS BIGINT) % 4096 AS h2
        |  FROM (SELECT unnest([1, 2, 3, 4, 5, 1000001, 1000002, 1000003,
        |      1000004, 1000005]) AS k)),
        |ng AS (SELECT CAST(count(*) AS BIGINT) AS n_groups FROM rgstats),
        |truth AS (SELECT probe_key, CAST(count(*) AS BIGINT) AS n_true
        |      FROM probes JOIN rgk ON sk = probe_key GROUP BY 1),
        |zone AS (SELECT probe_key, CAST(count(*) AS BIGINT) AS n_zone
        |      FROM probes JOIN rgstats
        |        ON mn <= probe_key AND probe_key <= mx GROUP BY 1),
        |hb1 AS (SELECT probe_key, rg FROM probes JOIN bits ON bit = h1),
        |hb2 AS (SELECT probe_key, rg FROM probes JOIN bits ON bit = h2),
        |bloom AS (SELECT probe_key, CAST(count(*) AS BIGINT) AS n_bloom
        |      FROM hb1 JOIN hb2 USING (probe_key, rg) GROUP BY 1)
        |SELECT p.probe_key, coalesce(n_true, 0) > 0 AS member, n_groups,
        |  CAST(coalesce(n_true, 0) AS BIGINT) AS n_true,
        |  CAST(coalesce(n_zone, 0) AS BIGINT) AS n_zone,
        |  CAST(coalesce(n_bloom, 0) AS BIGINT) AS n_bloom,
        |  round(CAST(n_groups - coalesce(n_bloom, 0) AS DOUBLE)
        |    / CAST(n_groups AS DOUBLE), 6) AS bloom_skip_frac,
        |  round(CAST(coalesce(n_bloom, 0) - coalesce(n_true, 0) AS DOUBLE)
        |    / CAST(greatest(n_groups - coalesce(n_true, 0), 1) AS DOUBLE), 6)
        |    AS false_positive_rate
        |FROM probes p LEFT JOIN truth USING (probe_key)
        |LEFT JOIN zone USING (probe_key)
        |LEFT JOIN bloom USING (probe_key), ng
        |ORDER BY probe_key""".stripMargin,

    "q243_zonemap_census" ->
      """WITH li AS (
        |  SELECT l_orderkey, epoch_us(l_shipdate) AS d,
        |         year(l_shipdate) * 100 + month(l_shipdate) AS ship_month
        |  FROM lineitem),
        |pr AS (
        |  SELECT * FROM (VALUES
        |    ('1996q1', epoch_us(TIMESTAMP '1996-01-01'),
        |               epoch_us(TIMESTAMP '1996-04-01')),
        |    ('1998q3', epoch_us(TIMESTAMP '1998-07-01'),
        |               epoch_us(TIMESTAMP '1998-10-01')),
        |    ('2001q1', epoch_us(TIMESTAMP '2001-01-01'),
        |               epoch_us(TIMESTAMP '2001-04-01')))
        |    t(pred, lo, hi)),
        |matched AS (
        |  SELECT pred, CAST(sum(CASE WHEN d >= lo AND d < hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS rows_matched
        |  FROM li, pr GROUP BY 1),
        |rgn AS (
        |  SELECT l_orderkey // 1024 AS rg, CAST(count(*) AS BIGINT)
        |           AS n_rows, min(d) AS mn, max(d) AS mx
        |  FROM li GROUP BY 1),
        |rgc AS (
        |  SELECT ship_month AS rg, CAST(count(*) AS BIGINT) AS n_rows,
        |         min(d) AS mn, max(d) AS mx
        |  FROM li GROUP BY 1),
        |cn AS (
        |  SELECT 'a_natural' AS layout, pred,
        |         CAST(count(*) AS BIGINT) AS n_groups,
        |         CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_groups_scanned,
        |         CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN n_rows
        |           ELSE 0 END) AS BIGINT) AS rows_scanned
        |  FROM rgn, pr GROUP BY 2
        |  UNION ALL
        |  SELECT 'b_clustered' AS layout, pred,
        |         CAST(count(*) AS BIGINT) AS n_groups,
        |         CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_groups_scanned,
        |         CAST(sum(CASE WHEN mx >= lo AND mn < hi THEN n_rows
        |           ELSE 0 END) AS BIGINT) AS rows_scanned
        |  FROM rgc, pr GROUP BY 2)
        |SELECT c.layout, c.pred, c.n_groups, c.n_groups_scanned,
        |       c.rows_scanned, m.rows_matched,
        |       round(CAST(c.n_groups - c.n_groups_scanned AS DOUBLE)
        |         / c.n_groups, 6) AS skip_frac,
        |       CASE WHEN m.rows_matched > 0 THEN
        |         round(CAST(c.rows_scanned AS DOUBLE) / m.rows_matched, 4)
        |       END AS read_amp
        |FROM cn c JOIN matched m USING (pred)
        |ORDER BY c.layout, c.pred""".stripMargin,

    "q210_encoding_census" ->
      s"""WITH u AS (
        |${Seq("l_returnflag", "l_shipdate", "l_quantity", "l_partkey")
          .map(encColSql).mkString("\n UNION ALL\n")}
        |)
        |SELECT col_name, n, ndv, n_runs, dict_codebits, plain_bits,
        |       dict_bits, rle_bits,
        |       CASE WHEN rle_bits <= dict_bits AND rle_bits <= plain_bits
        |              THEN 'rle'
        |            WHEN dict_bits <= plain_bits THEN 'dictionary'
        |            ELSE 'plain' END AS best
        |FROM u ORDER BY col_name""".stripMargin,
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
