package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.ColumnarToRowExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The `graft-columnar` format + connector contract: lossless round
  * trip over every supported type (nulls included), column pruning that
  * reaches the scan, zone-map BLOCK skipping under pushed filters, the
  * vectorized (ColumnarBatch) read path, and overwrite semantics.
  */
class ColumnarSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tmp(): String =
    Files.createTempDirectory("gcol_spec").toString

  // AQE wraps plans in AdaptiveSparkPlanExec / QueryStageExec whose
  // collect() does not descend into the wrapped plan; walk through them
  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(collectAll(_)(pf))
  }

  private def gcolScan(df: DataFrame): GcolScan = {
    val scans = collectAll(df.queryExecution.executedPlan) {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size == 1, s"expected one BatchScan:\n${df.queryExecution}")
    scans.head.asInstanceOf[GcolScan]
  }

  private lazy val sample: DataFrame = {
    import spark.implicits._
    spark.range(0, 10000, 1, 4).select(
      $"id".as("k"),
      ($"id" * 2).cast(IntegerType).as("i"),
      when($"id" % 7 === 0, lit(null)).otherwise($"id".cast(DoubleType) / 3.0)
        .as("d"),
      when($"id" % 11 === 0, lit(null))
        .otherwise(concat(lit("row-"), format_string("%05d", $"id")))
        .as("s"),
      ($"id" % 3 === 0).as("b"),
      date_add(lit("1995-01-01").cast(DateType), ($"id" % 1000).cast(IntegerType))
        .as("dt"),
      timestamp_seconds($"id" * 1000).as("ts"))
  }

  test("round trip preserves every supported type, nulls included") {
    val dir = tmp()
    sample.write.format("graft-columnar").mode("overwrite").save(dir)
    val back = spark.read.format("graft-columnar").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      sample.schema.map(f => (f.name, f.dataType)))
    val a = sample.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.length === b.length)
    assert(a.sameElements(b), "row content drifted through the round trip")
  }

  test("the scan is columnar and bridges through ColumnarToRow") {
    val dir = tmp()
    sample.write.format("graft-columnar").mode("overwrite").save(dir)
    val df = spark.read.format("graft-columnar").load(dir)
      .groupBy().agg(sum("k"))
    assert(df.collect().head.getLong(0) === (0L until 10000L).sum)
    val plan = df.queryExecution.executedPlan
    val batchScans = collectAll(plan) { case b: BatchScanExec => b }
    assert(batchScans.size == 1)
    assert(batchScans.head.supportsColumnar,
      "BatchScan did not take the vectorized path")
    assert(collectAll(plan) { case c: ColumnarToRowExec => c }.nonEmpty,
      s"no ColumnarToRow bridge in:\n$plan")
  }

  test("column pruning reaches the scan (readSchema shrinks to the projection)") {
    val dir = tmp()
    sample.write.format("graft-columnar").mode("overwrite").save(dir)
    val df = spark.read.format("graft-columnar").load(dir).select("s", "k")
    val scan = gcolScan(df)
    assert(scan.readSchema().fieldNames.toSet === Set("k", "s"),
      s"scan reads ${scan.readSchema().fieldNames.mkString(",")}")
    assert(df.count() === 10000)
  }

  test("zone maps skip blocks under a selective pushed filter") {
    val dir = tmp()
    // sorted by k, small blocks -> tight non-overlapping zone maps
    sample.orderBy("k").repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir)
    val df = spark.read.format("graft-columnar").load(dir)
      .filter(col("k") >= 9200L && col("k") < 9300L)
    val rows = df.collect()
    assert(rows.length === 100, "filter result wrong after block skipping")
    val scan = gcolScan(df)
    assert(scan.totalBlocks === 10, s"expected 10 blocks, ${scan.totalBlocks}")
    assert(scan.plannedBlocks === 1,
      s"zone maps kept ${scan.plannedBlocks}/${scan.totalBlocks} blocks")
    assert(scan.description().contains("PushedFilters"))
    assert(scan.pushedAccepted.nonEmpty, "range filter was not accepted")
  }

  test("string and null-test filters prune; unsupported shapes survive") {
    val dir = tmp()
    sample.orderBy("s").repartition(1).sortWithinPartitions("s")
      .write.format("graft-columnar").option("rowsPerBlock", "2000")
      .mode("overwrite").save(dir)
    // string equality on a sorted column: most blocks skipped
    val eq = spark.read.format("graft-columnar").load(dir)
      .filter(col("s") === "row-00042")
    assert(eq.count() === 1)
    val sEq = gcolScan(eq)
    assert(sEq.plannedBlocks < sEq.totalBlocks,
      s"string zone map never skipped (${sEq.plannedBlocks}/${sEq.totalBlocks})")
    // IsNull matches only blocks that actually hold nulls
    val nn = spark.read.format("graft-columnar").load(dir)
      .filter(col("s").isNull)
    assert(nn.count() === sample.filter(col("s").isNull).count())
  }

  test("overwrite replaces prior data; append accumulates") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-columnar").mode("overwrite").save(dir)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft-columnar").mode("append").save(dir)
    assert(spark.read.format("graft-columnar").load(dir).count() === 3)
    Seq((9L, "z")).toDF("k", "v")
      .write.format("graft-columnar").mode("overwrite").save(dir)
    val rows = spark.read.format("graft-columnar").load(dir).collect()
    assert(rows.toSeq === Seq(Row(9L, "z")))
  }

  test("unsupported column types fail at write-build time, named") {
    import spark.implicits._
    val dir = tmp()
    val err = intercept[Exception] {
      Seq((1, Array(1.0f))).toDF("k", "emb")
        .write.format("graft-columnar").mode("overwrite").save(dir)
    }
    assert(err.getMessage.contains("emb"), s"column not named: ${err.getMessage}")
  }

  test("runtime filtering replans blocks when a join hands the scan In-values") {
    import spark.implicits._
    val dir = tmp()
    spark.range(0, 10000).select($"id".as("k"), ($"id" * 3).as("payload"))
      .repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir)
    // contract level: Spark hands In-values post-build-side; the scan
    // must shrink its block list on replan
    val df = spark.read.format("graft-columnar").load(dir)
    val scan = gcolScan(df)
    assert(scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
      .filterAttributes().map(_.describe()).contains("k"))
    scan.toBatch.planInputPartitions()
    val before = scan.plannedBlocks
    assert(before === 10)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(42L, 43L, 8500L))))
    scan.toBatch.planInputPartitions()
    val after = scan.plannedBlocks
    assert(after === 2, s"runtime In did not prune: $before -> $after")
    assert(scan.runtimeApplied.nonEmpty)
    // integration level: the ENGINE drives it end-to-end — a dim with a
    // key-opaque selective predicate (tag, not k, so nothing is
    // statically inferable onto the fact side) broadcast-joins the gcol
    // fact; DPP executes the dim, hands the scan In(k, <dim keys>) and
    // the replan keeps only the blocks holding those keys
    // (DPP's benefit heuristic wants a fact side worth pruning: 100k
    // rows / 100 blocks clears it; 10k did not)
    val factDir = tmp()
    val dimDir = tmp()
    spark.range(0, 100000).select($"id".as("k"), ($"id" * 3).as("payload"))
      .repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(factDir)
    spark.range(0, 100000).select($"id".as("k"),
        ($"id" / 1000L).cast("long").as("tag"))
      .write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.format("graft-columnar").load(factDir)
      .join(spark.read.parquet(dimDir).filter($"tag" === 42L), "k")
    // execute JOINED itself (count() spawns a separate QueryExecution
    // whose scan instance is not the one inspected below)
    assert(joined.collect().length === 1000)
    val jScan = gcolScan(joined)
    assert(jScan.runtimeApplied.nonEmpty,
      "engine never invoked SupportsRuntimeFiltering.filter")
    assert(jScan.plannedBlocks === 1 && jScan.totalBlocks === 100,
      s"runtime pruning kept ${jScan.plannedBlocks}/${jScan.totalBlocks}")
  }

  test("limit pushdown caps planned blocks; filters disable the cap") {
    import spark.implicits._
    val dir = tmp()
    spark.range(0, 10000).select($"id".as("k"))
      .repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir)
    val lim = spark.read.format("graft-columnar").load(dir).limit(1500)
    assert(lim.collect().length === 1500)
    val scan = gcolScan(lim)
    assert(scan.plannedBlocks === 2,
      s"LIMIT 1500 should plan 2 of 10 blocks, got ${scan.plannedBlocks}")
    // with a filter, block granularity could under-deliver — the cap
    // must not apply and the result stays exact
    val fl = spark.read.format("graft-columnar").load(dir)
      .filter($"k" >= 9000L).limit(500)
    assert(fl.collect().length === 500)
    assert(fl.collect().forall(_.getLong(0) >= 9000L))
  }

  test("per-segment compression: zstd/lz4 round-trip, shrink, and keep pruning") {
    val none = tmp(); val zstd = tmp(); val lz4 = tmp()
    val clustered = sample.orderBy("k").repartition(1).sortWithinPartitions("k")
    clustered.write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(none)
    clustered.write.format("graft-columnar").option("rowsPerBlock", "1000")
      .option("codec", "zstd").mode("overwrite").save(zstd)
    clustered.write.format("graft-columnar").option("rowsPerBlock", "1000")
      .option("codec", "lz4").mode("overwrite").save(lz4)
    def bytes(d: String) = ColumnarFormat.listFiles(d).map(_.toFile.length).sum
    assert(bytes(zstd) < bytes(none) && bytes(lz4) < bytes(none),
      s"codecs did not shrink: none=${bytes(none)} zstd=${bytes(zstd)} lz4=${bytes(lz4)}")
    val ref = spark.read.format("graft-columnar").load(none)
      .collect().map(_.toString).sorted
    Seq(zstd, lz4).foreach { d =>
      val got = spark.read.format("graft-columnar").load(d)
        .collect().map(_.toString).sorted
      assert(got.sameElements(ref), s"$d: compressed round-trip drifted")
      // zone maps live in the footer — pruning is codec-independent
      val fl = spark.read.format("graft-columnar").load(d)
        .filter(col("k") >= 9200L && col("k") < 9300L)
      assert(fl.count() === 100)
      val sc = gcolScan(fl)
      assert(sc.plannedBlocks === 1,
        s"$d: pruning broke under compression (${sc.plannedBlocks})")
    }
    val err = intercept[Exception] {
      sample.write.format("graft-columnar").option("codec", "gzip")
        .mode("overwrite").save(tmp())
    }
    assert(err.getMessage.contains("gzip"))
  }

  test("topN pushdown keeps only blocks that can reach the top n") {
    import spark.implicits._
    val dir = tmp()
    // clustered on k: block maxes are strictly increasing, so ORDER BY
    // k ASC LIMIT 500 provably needs only the first block
    spark.range(0, 10000).select($"id".as("k"), ($"id" * 7).as("v"))
      .repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir)
    val asc = spark.read.format("graft-columnar").load(dir)
      .orderBy($"k").limit(500)
    val ascRows = asc.collect()
    assert(ascRows.map(_.getLong(0)).toSeq === (0L until 500L))
    assert(gcolScan(asc).plannedBlocks === 1,
      s"asc topN kept ${gcolScan(asc).plannedBlocks} blocks")
    val desc = spark.read.format("graft-columnar").load(dir)
      .orderBy($"k".desc).limit(2500)
    assert(desc.collect().map(_.getLong(0)).toSeq ===
      (9999L to 7500L by -1L))
    assert(gcolScan(desc).plannedBlocks === 3,
      s"desc topN kept ${gcolScan(desc).plannedBlocks} blocks")
    // interleaved data: every block overlaps the top range — nothing is
    // excludable and the result must still be exact
    val dir2 = tmp()
    spark.range(0, 10000).select(($"id" % 10).as("k"), $"id".as("v"))
      .repartition(1)
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir2)
    val flat = spark.read.format("graft-columnar").load(dir2)
      .orderBy($"k").limit(100)
    assert(flat.collect().forall(_.getLong(0) === 0L))
    assert(gcolScan(flat).plannedBlocks === 10, "overlapping blocks pruned")
  }

  test("metadata-only aggregates: COUNT/MIN/MAX answered from footers, zero blocks read") {
    import spark.implicits._
    val dir = tmp()
    sample.repartition(4).write.format("graft-columnar")
      .option("rowsPerBlock", "1000").mode("overwrite").save(dir)
    val df = spark.read.format("graft-columnar").load(dir)
      .agg(count(lit(1)).as("n"), count($"s").as("n_s"),
        min($"k").as("min_k"), max($"k").as("max_k"),
        min($"s").as("min_s"), max($"d").as("max_d"))
    val row = df.collect().head
    assert(row.getLong(0) === 10000L)
    assert(row.getLong(1) === sample.filter($"s".isNotNull).count())
    assert(row.getLong(2) === 0L && row.getLong(3) === 9999L)
    assert(row.getString(4) === "row-00001") // id 0 % 11 == 0 -> null
    assert(row.getDouble(5) === sample.agg(max($"d")).collect().head.getDouble(0))
    val scan = gcolScan(df)
    assert(scan.aggregated, s"aggregation not pushed:\n${df.queryExecution}")
    assert(scan.plannedBlocks === 0, "metadata query read data blocks")
    assert(scan.description().contains("PushedAggregates"))
    // a FILTERED aggregate must NOT push (footers can't see row-level
    // predicates) — it takes the normal block-reading path
    val filtered = spark.read.format("graft-columnar").load(dir)
      .filter($"k" >= 5000L).agg(count(lit(1)))
    assert(filtered.collect().head.getLong(0) === 5000L)
    assert(!gcolScan(filtered).aggregated, "filtered aggregate was pushed")
  }

  test("micro-batch streaming read: journal offsets deliver appends exactly once") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-columnar").mode("overwrite").save(dir)
    val stream = spark.readStream.format("graft-columnar")
      .load(dir)
      .writeStream.format("memory").queryName("gcol_stream")
      .option("checkpointLocation", tmp())
      .start()
    try {
      stream.processAllAvailable()
      assert(spark.table("gcol_stream").count() === 2)
      // appends surface incrementally — and ONLY the new file's rows
      Seq((3L, "c"), (4L, "d")).toDF("k", "v")
        .write.format("graft-columnar").mode("append").save(dir)
      stream.processAllAvailable()
      val rows = spark.table("gcol_stream").as[(Long, String)]
        .collect().sorted
      assert(rows.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
        s"stream drifted: ${rows.mkString(",")}")
    } finally stream.stop()
  }

  test("streaming read filters correctly; engine does not push filters to micro-batch scans") {
    import spark.implicits._
    val dir = tmp()
    spark.range(0, 4000).select($"id".as("k"))
      .repartition(1).sortWithinPartitions("k")
      .write.format("graft-columnar").option("rowsPerBlock", "1000")
      .mode("overwrite").save(dir)
    val stream = spark.readStream.format("graft-columnar").load(dir)
      .filter($"k" >= 3500L)
      .writeStream.format("memory").queryName("gcol_stream_pruned")
      .option("checkpointLocation", tmp())
      .start()
    try {
      stream.processAllAvailable()
      assert(spark.table("gcol_stream_pruned").count() === 500)
      // DOCUMENTED ENGINE BEHAVIOR, pinned so an upgrade that starts
      // pushing filters into micro-batch V2 scans gets noticed: Spark 4
      // applies V2 pushdown to BATCH relations only, so the streaming
      // side surfaces every block's rows and filters above the scan
      // (the zone-map plumbing is in place — GcolMicroBatchStream
      // prunes with whatever `filters` the ScanBuilder received).
      val scanned = stream.lastProgress.sources.head.numInputRows
      assert(scanned === 4000,
        s"engine pushdown behavior changed: $scanned input rows — " +
          "streaming block pruning may now be active; update the scaladoc")
    } finally stream.stop()
  }

  test("multi-file writes parallelize and statistics see pruned sizes") {
    val dir = tmp()
    sample.repartition(4).write.format("graft-columnar")
      .option("rowsPerBlock", "1000").mode("overwrite").save(dir)
    assert(ColumnarFormat.listFiles(dir).size === 4, "one file per task")
    val all = spark.read.format("graft-columnar").load(dir)
    assert(all.count() === 10000)
    val pruned = spark.read.format("graft-columnar").load(dir).select("k")
    val scanAll = gcolScan(all.filter(col("k") >= 0L))
    val scanK = gcolScan(pruned.filter(col("k") >= 0L))
    pruned.filter(col("k") >= 0L).count()
    all.filter(col("k") >= 0L).count()
    val sAll = scanAll.estimateStatistics()
    val sK = scanK.estimateStatistics()
    assert(sK.sizeInBytes().getAsLong < sAll.sizeInBytes().getAsLong,
      "pruned scan should report fewer bytes")
    assert(sK.numRows().getAsLong === 10000L)
  }
}
