package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Storage-layout invariants: the q50 partitioned write produces a
  * hive-style directory per month, and the partition-key filter prunes
  * at PLANNING time — the scan's selected partitions must be exactly the
  * one matching directory, not all twelve. This is the assertion the
  * plan comment in Layout.scala promises: pruning happens before any row
  * group is opened, so at 100 TB the query reads ~1/12th of the table.
  */
class LayoutSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("q210: encoding census stats are consistent and the model picks sanely") {
    import spark.implicits._
    val out = Layout.queries("q210_encoding_census")(spark, "/root/testdata/sf0.001")
      .cache()
    val rows = out.collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.keySet == Set("l_returnflag", "l_shipdate", "l_quantity",
      "l_partkey"))
    val n = graft.Tables.lineitem(spark, "/root/testdata/sf0.001").count()
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      // run structure: at least one run per distinct value, at most n
      assert(r.getAs[Long]("n_runs") >= r.getAs[Long]("ndv"))
      assert(r.getAs[Long]("n_runs") <= n)
      // code width really is ceil(log2(ndv))
      val ndv = r.getAs[Long]("ndv")
      val expectBits = if (ndv <= 1) 0L
        else 64 - java.lang.Long.numberOfLeadingZeros(ndv - 1)
      assert(r.getAs[Long]("dict_codebits") == expectBits,
        s"${r.getString(0)}: codebits ${r.getAs[Long]("dict_codebits")} != $expectBits")
      // the chosen encoding has the minimal modeled size
      val sizes = Map("plain" -> r.getAs[Long]("plain_bits"),
        "dictionary" -> r.getAs[Long]("dict_bits"),
        "rle" -> r.getAs[Long]("rle_bits"))
      assert(sizes(r.getAs[String]("best")) == sizes.values.min)
    }
    // low-cardinality flag column must prefer dictionary over plain
    assert(rows("l_returnflag").getAs[Long]("dict_bits") <
      rows("l_returnflag").getAs[Long]("plain_bits"))
    out.unpersist()
  }

  test("q50: partitioned layout is one directory per order month") {
    val path = Layout.ensurePartitionedOrders(spark, dir)
    val parts = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("order_month="))
    assert(parts.length == 12, s"expected 12 month partitions, got ${parts.toSeq}")
  }

  test("q50: month filter prunes to exactly one partition at planning time") {
    val df = Layout.queries("q50_partition_prune")(spark, dir)
    // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
    // node whose children aren't visible to collectLeaves before execution
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "month predicate must be a partition filter, not a data filter")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 surviving partition, got ${scan.selectedPartitions.partitionCount}")
  }

  test("q90: dim-side filter prunes fact partitions via dynamic pruning") {
    val df = Layout.queries("q90_dpp_join")(spark, dir)
    // planning time: the fact scan must carry a DynamicPruningSubquery on
    // the partition column — the months are not statically known
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec if f.partitionFilters.nonEmpty => f
    }
    assert(scans.nonEmpty, "expected a partition-filtered fact scan")
    assert(scans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning"))),
      s"expected a dynamicpruning partition filter, got ${scans.map(_.partitionFilters)}")
    // runtime: only the 3 Q2 month directories are read
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("order_month")).toSeq == Seq(4, 5, 6))
    // AQE materializes stages as leaf nodes; recurse through them (and
    // reused exchanges) to reach the actual executed scan instances
    def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case f: FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          allScans(r.child)
        case other => other.children.flatMap(allScans)
      }
    val factScan = allScans(df.queryExecution.executedPlan)
      .filter(_.partitionFilters.nonEmpty)
    assert(factScan.nonEmpty, "expected the fact scan in the executed plan")
    val partsRead = factScan.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(3L),
      s"expected 3 partitions read after dynamic pruning, got $partsRead")
  }

  test("compact: merges small files to the size target without changing content") {
    import spark.implicits._
    val scratch = graft.ops.Core.tmp("graft_compact")
    // simulate a streaming sink's debris: 64 tiny files
    graft.Tables.events(spark, dir).repartition(64)
      .write.mode("overwrite").parquet(s"$scratch/small")
    val (nIn, nOut) = Layout.compact(spark, s"$scratch/small", s"$scratch/compacted",
      targetBytes = 1L << 20)
    assert(nIn == 64, s"expected 64 input files, got $nIn")
    assert(nOut < nIn / 8, s"compaction left $nOut files from $nIn")
    val before = spark.read.parquet(s"$scratch/small")
    val after = spark.read.parquet(s"$scratch/compacted")
    assert(before.count() == after.count())
    assert(before.exceptAll(after).count() == 0)
    assert(after.exceptAll(before).count() == 0)
  }

  test("q86: z-sorted files bound BOTH dimension spans; a linear sort bounds only one") {
    import spark.implicits._
    val enc = Layout.zEncoded(spark, dir).cache()
    val scratch = graft.ops.Core.tmp("graft_zsort")
    // the OPTIMIZE ZORDER write: range-partition + sort on the z-key
    enc.repartitionByRange(16, $"zkey").sortWithinPartitions($"zkey")
      .write.mode("overwrite").parquet(s"$scratch/z")
    // the naive clustering: sort on x alone
    enc.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(s"$scratch/linear")
    def spans(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
      .agg(max($"sx"), max($"sy")).head()
    val (zx, zy) = { val r = spans(s"$scratch/z"); (r.getLong(0), r.getLong(1)) }
    val (lx, ly) = { val r = spans(s"$scratch/linear"); (r.getLong(0), r.getLong(1)) }
    // z-sort: every file covers a bounded rectangle in BOTH dims — this
    // is what lets parquet min/max stats prune 2-D range filters
    assert(zx <= 512 && zy <= 512, s"z-sorted spans too wide: x=$zx y=$zy")
    // linear sort: x tight, y unbounded (~ the full 0..1023 domain)
    assert(lx <= 256, s"x-sorted files should have tight x spans, got $lx")
    assert(ly >= 768, s"x-sorted files should span ~full y, got $ly")
    enc.unpersist()
  }

  test("q82: ORC scan pushes the predicate and matches the parquet twin") {
    import spark.implicits._
    val df = Layout.queries("q82_orc_scan")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf over the ORC copy")
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_quantity"),
      s"quantity range predicate must reach the ORC reader, got: $pushed")
    val expect = graft.Tables.lineitem(spark, dir)
      .filter($"l_quantity" >= 45.0)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        Num.roundAt(sum($"l_extendedprice"), 2).as("revenue"),
        Num.roundAt(avg($"l_discount"), 6).as("avg_disc"))
      .orderBy("l_returnflag")
      .collect()
    assert(df.collect().toSeq == expect.toSeq,
      "ORC and parquet scans of the same rows must agree bit-for-bit")
  }

  test("q86: every z-tile spans at most 128 values in BOTH dimensions") {
    import spark.implicits._
    val rows = Layout.queries("q86_zorder_key")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 127,
        s"tile ${r.getAs[Long]("ztile")} x-span too wide — interleave broken")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 127,
        s"tile ${r.getAs[Long]("ztile")} y-span too wide — interleave broken")
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables.orders(spark, dir).count(),
      "tile occupancies must partition the table")
  }

  test("q50: pruned aggregate matches the unpartitioned computation") {
    import spark.implicits._
    val out = Layout.queries("q50_partition_prune")(spark, dir).collect()
    val expect = graft.Tables.orders(spark, dir)
      .filter(month($"o_orderdate") === 3)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_customers"),
        Num.roundAt(sum($"o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
      .collect()
    assert(out.toSeq == expect.toSeq)
  }

  test("dynamic partition overwrite rewrites only the patched day; other partitions' files untouched") {
    import spark.implicits._
    val path = Layout.writeDayPartitionedEvents(spark, dir)
    def fileState(p: String): Map[String, Long] = {
      val root = new java.io.File(p)
      root.listFiles().filter(_.isDirectory).flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())
      }.toMap
    }
    val before = fileState(path)
    val days = spark.read.parquet(path).select($"event_day").distinct()
      .as[java.sql.Date].collect().sorted
    assert(days.length > 1, "fixture must span multiple days")
    val target = days.head
    // patch: one synthetic row for the target day only
    val patch = Seq((999999L, java.sql.Timestamp.valueOf(s"${target} 12:00:00"),
      42L, "patched", 1.0, "{}", target))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "event_day")
    Layout.overwriteDayPartition(spark, path, patch)
    val after = fileState(path)
    val dirOf = (k: String) => k.split("/")(0)
    val targetDir = s"event_day=$target"
    // untouched partitions: identical file names AND modification times
    assert(before.filter(kv => dirOf(kv._1) != targetDir) ==
      after.filter(kv => dirOf(kv._1) != targetDir),
      "dynamic overwrite must not rewrite unpatched partitions")
    // target partition fully replaced by the patch
    val targetRows = spark.read.parquet(path)
      .filter($"event_day" === lit(target)).collect()
    assert(targetRows.length == 1 && targetRows.head.getAs[String]("event_type") == "patched")
    // static overwrite (the default) would have truncated everything: prove
    // the other days' data is still there
    assert(spark.read.parquet(path).count() > 1)
  }

  test("q243: zone maps never skip a matching row; clustering pays") {
    import spark.implicits._
    val out = Layout.queries("q243_zonemap_census")(spark, dir).cache()
    assert(out.count() == 6) // 2 layouts x 3 predicates
    // completeness: every scanned superset contains all matching rows
    assert(out.filter($"rows_scanned" < $"rows_matched").count() == 0)
    assert(out.filter($"n_groups_scanned" > $"n_groups").count() == 0)
    // the clustered layout must skip strictly more than the natural one
    // for every predicate (that's what the layout buys)
    val nat = out.filter($"layout" === "a_natural")
      .select($"pred", $"rows_scanned".as("rs_nat"))
    val clu = out.filter($"layout" === "b_clustered")
      .select($"pred", $"rows_scanned".as("rs_clu"))
    assert(nat.join(clu, "pred").filter($"rs_clu" >= $"rs_nat")
      .count() == 0, "clustering must reduce rows scanned")
    out.unpersist()
  }
}
