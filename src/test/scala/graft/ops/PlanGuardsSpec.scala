package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Plan-shape regression guards for the scale-critical properties the
  * operator comments promise. These inspect `sparkPlan` (pre-AQE — the
  * adaptive wrapper hides children from collectLeaves) and fail if a
  * future refactor silently loses a pushdown, a pruned schema, a
  * broadcast side or bucket alignment. Complements LayoutSpec's
  * partition-pruning count and TextRelationalSpec's salt-key check.
  */
class PlanGuardsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): (DataFrame, String) = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    (df, df.queryExecution.sparkPlan.toString)
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  test("q296: the degree join never cartesians and the census aggregates partially") {
    // the pair frame is persisted, so the file scans sit inside an
    // InMemoryRelation this plan-string check can still see through
    val (_, p) = plan("q296_degree_assortativity")
    assert(!p.contains("CartesianProduct"), "cartesian in the degree join")
    assert(p.contains("HashAggregate"), s"no hash aggregation in:\n$p")
  }

  test("q303/q309/q315: the customer/arm dimension joins stay broadcast") {
    Seq("q303_mantel_haenszel", "q307_winners_curse").foreach { q =>
      val (_, p) = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q grew a cartesian")
    }
  }

  test("q310: FD candidates partial-aggregate before the exchange") {
    val (_, p) = plan("q310_fd_discovery")
    // every countDistinct plans partial_count + expand/partial aggregate
    // below its exchange — a plain global distinct would ship raw rows
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"no partial aggregation in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q316: the Shapley lattice joins are broadcast on census-sized sides") {
    val (_, p) = plan("q316_shapley_attribution")
    assert("BroadcastHashJoin".r.findAllIn(p).size +
      "BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"lattice joins not broadcast:\n$p")
  }

  test("q101: dimension joins broadcast; at most one shuffle-side join moves fact data") {
    val (_, p) = plan("q101_local_supplier")
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).size
    val nShuffleJoin = ("SortMergeJoin".r.findAllIn(p).size
      + "ShuffledHashJoin".r.findAllIn(p).size)
    assert(nBroadcast >= 3,
      s"expected region/nation/customer/supplier joins to broadcast, got $nBroadcast in:\n$p")
    assert(nShuffleJoin <= 2,
      s"too many shuffle joins ($nShuffleJoin) — dimension join leaked into a shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), "cartesian product in the star join")
  }

  test("q09: the range predicate reaches the parquet scan as a pushed filter") {
    val (df, _) = plan("q09_filter_range")
    val pushed = scans(df).flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan") || pushed.contains("IsNotNull"),
      s"no pushed filters on the scan: $pushed")
  }

  test("q10: projection prunes the scan to the selected columns") {
    val (df, _) = plan("q10_project")
    val scan = scans(df).head
    // lineitem has 11 columns; the projection needs at most 6
    assert(scan.requiredSchema.size <= 6,
      s"scan reads ${scan.requiredSchema.size} cols: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q04: the dimension side joins via broadcast hash") {
    val (_, p) = plan("q04_join_inner")
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$p")
  }

  test("q38: the nation dim is broadcast") {
    val (_, p) = plan("q38_outer_broadcast")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected a broadcast join:\n$p")
  }

  test("q48: bucket-aligned sort-merge join has no exchange below the join") {
    val (_, p) = plan("q48_bucketed_join")
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin:\n$p")
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      s"shuffle below the bucketed join:\n$below")
  }

  // EnsureRequirements inserts join exchanges only into executedPlan —
  // sparkPlan NEVER shows them (verified empirically: a forced
  // sort-merge join prints zero Exchange nodes in sparkPlan), so a
  // no-Exchange assertion there is vacuous. These guards walk the
  // EXECUTED plan, descending through the AQE wrappers.
  private def collectExec[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ kids.flatMap(collectExec(_)(pf))
  }

  /** The join subtree holds no ShuffleExchange (the SinglePartition
    * merge of a final ungrouped aggregate above it is allowed).
    */
  private def assertSpjShuffleFree(df: DataFrame, what: String): Unit = {
    df.collect() // finalize AQE so executedPlan is the real one
    val joins = collectExec(df.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(joins.nonEmpty, s"$what: expected a shuffle-family join:\n" +
      df.queryExecution.executedPlan)
    joins.foreach { j =>
      val ex = collectExec(j) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(ex.isEmpty, s"$what: shuffle below the join:\n$j")
    }
  }

  test("q328: the storage-partitioned gcol join executes ZERO exchanges below the join") {
    // the q328 query executes eagerly inside its conf window and returns
    // a local relation, so the guard inspects the factored-out frame
    // under the same confs (Layout.withSpjConfs)
    graft.ops.Layout.withSpjConfs(spark) {
      val df = graft.ops.Layout.gcolSpjFrame(spark, dir)
      assertSpjShuffleFree(df, "q328")
      val p = df.queryExecution.executedPlan.toString
      assert("graft-columnar".r.findAllIn(p).size >= 2, s"not both gcol:\n$p")
    }
    // negative control — the guard can actually fail: with v2
    // bucketing off the same frame DOES shuffle below its join
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.ops.Layout.gcolSpjFrame(spark, dir)
      df.collect()
      val joins = collectExec(df.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.exists(j => collectExec(j) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.nonEmpty), "control: expected the unoptimized plan to shuffle")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q339: the BUCKET-transform gcol join executes ZERO exchanges, keyed on the key alone") {
    graft.ops.Layout.withSpjConfs(spark) {
      // the join keys are the ORDER KEYS — the bucket id column is
      // never in the condition, the projection, or any shuffle
      val df = graft.ops.Layout.gcolBucketSpjFrame(spark, dir)
      assertSpjShuffleFree(df, "q339")
      val p = df.queryExecution.executedPlan.toString
      assert("graft-columnar".r.findAllIn(p).size >= 2, s"not both gcol:\n$p")
    }
  }

  test("q66: the eval side of the decontamination join is the broadcast build") {
    val (_, p) = plan("q66_decontamination")
    // eval is the join's LEFT input, so the hinted broadcast must plan as
    // BuildLeft — a regression to size-picking the train side would flip
    // this to BuildRight at scale
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.contains("BuildLeft"), s"broadcast build is not the eval (left) side:\n$p")
    // the shingle-hash key must never be a shuffle key: the broadcast
    // probe is the whole point (an 'Exchange hashpartitioning(h...' would
    // mean the posting join regressed to a shuffle join)
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning(h#")),
      s"train postings shuffled on the shingle hash:\n$p")
    // exactly ONE full exchange of train data (the deliberate round-robin
    // compute spread); everything after the join is eval-pair-sized
    assert("RoundRobinPartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one round-robin spread of the train side:\n$p")
  }

  test("q32: top-k plans as TakeOrderedAndProject, not a global sort") {
    val (_, p) = plan("q32_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
  }

  test("q78: the arrivals batch, not the index, is the broadcast build") {
    val (_, p) = plan("q78_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(p.contains("BuildLeft"), s"broadcast build is not the arrivals (left) side:\n$p")
  }

  test("q84: the rolling window runs a RANGE frame, not a ROWS approximation") {
    val (_, p) = plan("q84_rolling_range")
    assert(p.contains("RangeFrame") || p.contains("RANGE BETWEEN"),
      s"expected a RANGE window frame:\n$p")
  }

  test("q83: the BM25 ranking is a bounded local frame — no global window, rank 1..20 intact") {
    // The top-20 now executes eagerly through orderBy+limit (planned as
    // TakeOrderedAndProject — distributed partial top-k) and rank derives
    // from the collected order, so the RETURNED plan must be a local
    // ≤20-row frame with no WindowExec (the shape this guard previously
    // pinned via the TakeOrderedAndProject string) and no global sort of
    // anything bigger.
    val (df, p) = plan("q83_bm25")
    assert(!p.contains("WindowExec"), s"a window crept back into q83:\n$p")
    assert(p.contains("LocalTableScan"), s"expected the ranked local frame:\n$p")
    val ranks = df.select("rank").collect().map(_.getInt(0)).toSeq
    assert(ranks == (1 to ranks.length), s"ranks not dense from 1: $ranks")
  }

  test("q88: both percentile join-backs broadcast the per-group scalars") {
    val (_, p) = plan("q88_robust_anomaly")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"expected 2 broadcast join-backs, found $n:\n$p")
  }

  test("q21: the band self-join is an equi-join, never a cartesian product") {
    val (_, p) = plan("q21_dedup_minhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band candidate join degenerated to all-pairs:\n$p")
  }

  test("q64: the fuzzy join is equi-keyed on the 3-feature block key, never all-pairs") {
    val (df, p) = plan("q64_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degenerated to all-pairs:\n$p")
    // all three block dimensions must stay the join's equi keys —
    // levenshtein may only appear as a post-join filter
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
    }
    assert(joins.nonEmpty, s"no equi-join in the fuzzy-join plan:\n$p")
    val keys = joins.head.mkString(",")
    Seq("bk_tok", "bk_ch", "bk_len").foreach(k =>
      assert(keys.contains(k), s"join keys miss block dimension $k: $keys"))
  }

  test("AQE splits a skewed join partition — the automatic answer to q51's manual salting") {
    // q51 demonstrates MANUAL salting; this pins the engine's automatic
    // path: with adaptive skew-join thresholds scaled to test data, AQE's
    // OptimizeSkewedJoin must split the hot partition of a sort-merge
    // join at runtime (SortMergeJoin prints skew=true in the final
    // adaptive plan). At 100 TB these two are the complete answer to
    // skew: AQE for the common case, explicit salting where a single key
    // exceeds what partition-splitting can fix (the dim side must
    // replicate per sub-split, which AQE does for free here).
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, when}
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~90% of the fact lands on key 1 — one hot reduce partition
      val fact = spark.range(0, 300000).select(
        when($"id" % 10 === 0, $"id" % 50 + 1).otherwise(lit(1L)).as("k"),
        $"id".as("payload"))
      val dim = spark.range(1, 51).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = fact.join(dim, "k")
      // collect() executes THIS QueryExecution, finalizing its adaptive
      // plan (count() would plan a separate aggregate query and leave
      // this one unexecuted: isFinalPlan=false)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"OptimizeSkewedJoin did not fire:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("runtime bloom filter: a selective dim filter injects might_contain on the fact scan") {
    // the engine's automatic semi-join pre-filter (InjectRuntimeFilter):
    // when a shuffled join's small side carries a selective predicate,
    // the optimizer builds a bloom filter over its join keys and guards
    // the FACT side's scan with might_contain — rows that cannot match
    // never enter the shuffle. At 100 TB this is the standard answer to
    // "exact referential joins shuffle both sides" (q96's FK-check note
    // names a bloom pre-pass as the first candidate); DPP (q90) does the
    // same for partition columns, this covers arbitrary keys. Thresholds
    // are scaled to test data — defaults want a 10 GB application side.
    import org.apache.spark.sql.functions.count
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // broadcast would filter already
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = graft.Tables.lineitem(spark, dir)
      val o = graft.Tables.orders(spark, dir).filter("o_totalprice > 500000")
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus").agg(count("*"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("q112: the bucketized range join is an equi-join on bucket, never a nested loop") {
    val (df, p) = plan("q112_bucketed_range")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketized range join degenerated to a nested loop:\n$p")
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
    }
    assert(joins.nonEmpty && joins.head.mkString(",").contains("bucket"),
      s"join is not equi-keyed on bucket: ${joins.map(_.mkString(",")).mkString(" | ")}")
  }

  test("q106: the LATERAL LIMIT decorrelates to the native partial top-k, not a nested loop") {
    val (df, p) = plan("q106_lateral_topn")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral subquery planned as a nested loop:\n$p")
    // the correlated LIMIT decorrelates to the row_number idiom, which the
    // graft extension (plans.NativeTopK) plans as heap-based partial +
    // final TopKPerGroup — ≤3 rows per customer leave each task BEFORE
    // the shuffle, and no sort materializes a partition. (Stock Spark
    // would use Partial WindowGroupLimit + sorts here; the native
    // operator subsumes it.)
    val topks = df.queryExecution.sparkPlan.collect {
      case t: graft.plans.TopKPerGroupExec => t.partial
    }
    assert(topks.sorted == Seq(false, true),
      s"expected partial+final native top-k in:\n$p")
    // no sort ever sees the RAW data — the final stage's survivor sort
    // (≤k rows per group per task, spill-capable) is expected, so the
    // forbidden shape is a SortExec below the PARTIAL operator
    assert(!p.contains("WindowExec"), s"window survived the rewrite:\n$p")
    val sortsBelowPartial = df.queryExecution.sparkPlan.collect {
      case t: graft.plans.TopKPerGroupExec if t.partial => t
    }.flatMap(_.collect { case s: org.apache.spark.sql.execution.SortExec => s })
    assert(sortsBelowPartial.isEmpty, s"sort below the partial native top-k:\n$p")
  }

  test("q139: collision candidates come from an equi-join on the 8-gram shingle") {
    val (df, p) = plan("q139_ngram_collision")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"collision join degenerated to all-pairs:\n$p")
    val joinKeys = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
    }
    assert(joinKeys.exists(_.exists(_.toString.contains("shingle"))),
      s"no join keyed on the shingle:\n$p")
    // eval is the collision join's RIGHT input and hinted broadcast —
    // BuildRight pins the 100 TB shape (train postings stream past the
    // broadcast eval windows, never the reverse)
    assert(p.contains("BroadcastHashJoin") && p.contains("BuildRight"),
      s"eval (right) side is not the broadcast build:\n$p")
  }

  test("q119: every triangle-counting join is an equi-join, never all-pairs") {
    val (df, p) = plan("q119_triangles")
    assert(!p.contains("CartesianProduct"),
      s"a triangle join degenerated to all-pairs:\n$p")
    // the only nested-loop join is the single 1-row stat-frame crossJoin
    // at the very top (vertex/edge/wedge censuses all fold out of the one
    // degree aggregate); the wedge/close/degree joins must all be equi
    val nBnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nBnlj == 1, s"unexpected nested-loop join count $nBnlj:\n$p")
    // the wedge join must key on the oriented source s (its rank filter
    // is post-join); the closing join must key on both wedge endpoints
    val keySets = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.mkString(",")
    }
    assert(keySets.exists(k => k.contains("v1") && k.contains("v2")),
      s"no (v1,v2)-keyed closing join in:\n$keySets")
  }

  test("q119: without the broadcast-deg hint (data-scale vertex fallback) the plan is shuffle equi-joins") {
    // the hints assume a dictionary-sized vertex set; the documented
    // fallback for data-scale vertices is to drop them and let Catalyst
    // shuffle the degree attaches — prove that plan builds and stays equi
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // cache matching strips join hints: without this, the hinted test's
    // persisted frames serve their (broadcast) physical plans here
    spark.catalog.clearCache()
    try {
      val df = Relational.trianglesImpl(spark, dir, hintDeg = false)
      val p = df.queryExecution.sparkPlan.toString
      // exactly one CartesianProduct is allowed: the 1-row stat-frame
      // crossJoin at the top (BroadcastNestedLoopJoin when broadcast is
      // enabled) — no DATA join may degenerate to all-pairs
      val nCartesian = "CartesianProduct".r.findAllIn(p).size
      assert(nCartesian <= 1,
        s"a data join in the hint-free fallback degenerated to all-pairs:\n$p")
      val nShuffleJoin = ("SortMergeJoin".r.findAllIn(p).size
        + "ShuffledHashJoin".r.findAllIn(p).size)
      assert(nShuffleJoin >= 4, // 2 deg attaches + wedge + closing join
        s"expected the degree attaches to fall back to shuffle equi-joins, got $nShuffleJoin in:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q185: containment candidates come from an equi-join of probe prefix vs full index") {
    val (df, p) = plan("q185_containment_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the containment candidate join degenerated to all-pairs:\n$p")
    val keySets = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.mkString(",")
    }
    assert(keySets.exists(_.contains("sh")),
      s"no shingle-keyed candidate join in:\n$keySets")
  }

  test("q128: prefix-filter candidates come from an equi-join on the prefix shingle") {
    val (df, p) = plan("q128_simjoin_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the prefix candidate join degenerated to all-pairs:\n$p")
    val keySets = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.mkString(",")
    }
    assert(keySets.exists(_.contains("sh")),
      s"no shingle-keyed candidate join in:\n$keySets")
  }

  test("q134: the spatial join keys on grid cells, never points x probes") {
    val (df, p) = plan("q134_spatial_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the grid join degenerated to all-pairs:\n$p")
    val keySets = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.mkString(",")
    }
    assert(keySets.exists(k => k.contains("cx") && k.contains("cy")),
      s"no (cx,cy)-keyed join in:\n$keySets")
  }

  test("q118: duplicated-span detection joins on the 8-byte window hash") {
    val (df, p) = plan("q118_substring_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span-dup join degenerated to all-pairs:\n$p")
    val keySets = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.mkString(",")
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys.mkString(",")
    }
    assert(keySets.exists(_.contains("gh")),
      s"dup-gram join does not key on the window hash: $keySets")
  }

  test("q120: the split is a pure projection - no rand, no shuffle below the census aggregate") {
    val (df, p) = plan("q120_hash_split")
    assert(!p.toLowerCase.contains("rand"),
      s"hash split must not involve rand():\n$p")
    // exactly two exchanges: the census aggregate and the final sort -
    // nothing repartitions the corpus before the per-row hash projection
    val nExchange = "Exchange".r.findAllIn(p).size
    assert(nExchange <= 2, s"unexpected extra shuffle ($nExchange):\n$p")
    val _ = df // silence unused warning paranoia
  }

  test("q142: the local-skyline window partitions by bucket; no cartesian anywhere") {
    val (df, p) = plan("q142_skyline")
    assert(!p.contains("CartesianProduct"),
      s"skyline phases must never form an unbounded cross product:\n$p")
    val windowParts = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.mkString(",")
    }
    assert(windowParts.exists(_.contains("bkt")),
      s"phase-2 local skyline lost its bucket partitioning: $windowParts")
  }

  test("q144: both island windows partition by user_id — never a global sort of the day frame") {
    val (df, p) = plan("q144_gaps_islands")
    val windowParts = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.mkString(",")
    }
    assert(windowParts.nonEmpty && windowParts.forall(_.contains("user_id")),
      s"gaps-and-islands window must be keyed per user: $windowParts\n$p")
  }

  test("q148: every attribution window partitions by user (or user+conversion)") {
    val (df, p) = plan("q148_multitouch")
    val windowParts = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.mkString(",")
    }
    assert(windowParts.nonEmpty && windowParts.forall(_.contains("user_id")),
      s"multi-touch windows must be user-keyed: $windowParts\n$p")
  }

  test("q151: dictionary-sized FK parents join as broadcast anti-joins") {
    val (df, p) = plan("q151_fk_orphans")
    val anti = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType.toString == "LeftAnti" => j
    }
    // all seven edges have parent key sets far under the broadcast
    // threshold at test scale; at minimum the nation/region dictionaries
    // must broadcast rather than shuffle
    assert(anti.size >= 2, s"expected broadcast anti-joins in:\n$p")
    assert(!p.contains("CartesianProduct"), s"orphan census must stay keyed:\n$p")
  }

  test("q127: training and scoring share ONE cached bigram explode") {
    val (df, p) = plan("q127_perplexity")
    // the persisted bigram frame must appear as a reused in-memory scan
    // (score side + c12 build) — losing the persist regresses to three
    // corpus-wide explodes, and deriving c1 from c12 keeps the third
    // consumer off the corpus entirely
    val inMem = "InMemoryTableScan".r.findAllIn(p).size
    assert(inMem >= 2, s"bigram cache not shared (saw $inMem InMemoryTableScans):\n$p")
    // only the vocabulary census may touch the parquet scan directly
    val docScans = scans(df).count(_.relation.location.rootPaths
      .exists(_.toString.contains("documents")))
    assert(docScans <= 1,
      s"corpus scanned $docScans times outside the cache — explode re-ran:\n$p")
    spark.catalog.clearCache() // drop the query's persist from the shared session
  }

  test("q102: the correlated scalar subqueries decorrelate into equi-joins") {
    val (_, p) = plan("q102_corr_subquery")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subquery planned as a nested loop:\n$p")
    // decorrelation rewrites the per-row aggregate into a grouped
    // aggregate joined on the correlation key
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"no decorrelated aggregate in the plan:\n$p")
    assert(p.contains("Join"), s"no join in the decorrelated plan:\n$p")
  }

  test("q158: source totals attach as broadcast joins; pairs never join docs x docs") {
    val (_, p) = plan("q158_cross_source_contamination")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"per-source totals must broadcast onto the pair census:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"pair generation leaked into a data-scale join:\n$p")
  }

  test("q159: the top-1000 plans as TakeOrderedAndProject, never a global rank window") {
    val (_, p) = plan("q159_zipf_law")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected the top-1000 as TakeOrderedAndProject:\n$p")
    assert(!p.contains("Window"), s"global window leaked into the fit:\n$p")
  }

  test("q160: assignment is map-side over centroid literals - no join, no window") {
    val (_, p) = plan("q160_centroid_purity")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the per-vector assignment must not join or window:\n$p")
    // one shuffle: the label census aggregate (plus the explicit input
    // repartition); anything more means the argmax left the map side
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx <= 2, s"extra exchanges in the assignment path ($nEx):\n$p")
  }

  test("q161: the high-water-mark window partitions by user - never a global sort") {
    val (_, p) = plan("q161_event_lateness")
    assert(p.contains("Window"), s"expected the per-user window:\n$p")
    // sparkPlan predates EnsureRequirements, so pin the window's own
    // partition spec rather than the exchange it will demand
    assert(p.contains("windowspecdefinition(user_id"),
      s"lateness window must partition by user_id:\n$p")
    assert(!p.contains("SinglePartition"),
      s"global single-partition stage feeding the window:\n$p")
  }

  test("q176: the returned ranking is a bounded local frame - no window, no shuffle") {
    // the top-20 runs as TakeOrderedAndProject inside construction (the
    // eager q83/q136 contract pattern); the RETURNED plan must be the
    // rebuilt 20-row literal frame, with no global window or exchange
    val (_, p) = plan("q176_decayed_spend")
    assert(p.contains("LocalTableScan"), s"expected the rebuilt bounded frame:\n$p")
    assert(!p.contains("Window") && !p.contains("Exchange"),
      s"global window/shuffle leaked into the returned ranking:\n$p")
  }

  test("q177: calibration candidates come from the band equi-join, never all-pairs") {
    val (_, p) = plan("q177_minhash_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"calibration pair generation is not banded:\n$p")
    assert(p.contains("band_hash") || p.contains("band_idx"),
      s"no band key in the candidate join:\n$p")
  }

  test("q197: probes broadcast; the corpus scan is never the build side") {
    val (_, p) = plan("q197_hard_negatives")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"probe attach is not a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the scorer:\n$p")
  }

  test("q204: the preflight runs off ONE key census - no join of lineitem to itself") {
    val (_, p) = plan("q204_join_cardinality")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the estimator must never execute the join it predicts:\n$p")
    // the stats and top-k branches each reduce the same key census; the
    // explode-unpivot must NOT multiply the scans per estimator row
    val nScans = "FileScan".r.findAllIn(p).size
    assert(nScans <= 2, s"per-branch re-scans of lineitem ($nScans):\n$p")
  }

  test("q208: exact and sampled moments come from a single lineitem pass") {
    val (df, p) = plan("q208_aqp_sample")
    assert(scans(df).size == 1,
      s"AQP harness scans lineitem ${scans(df).size} times:\n$p")
    assert(!p.contains("Join"), s"no join belongs in the one-pass harness:\n$p")
  }

  test("q210: the run-count window partitions by order key, never globally") {
    val (_, p) = plan("q210_encoding_census")
    // every lag window in the plan must carry the l_orderkey partition
    // spec; a global (unpartitioned) window would print without it
    assert(p.contains("], [l_orderkey"),
      s"run window lost its l_orderkey partitioning:\n$p")
  }

  test("q206: supersteps exchange on graph keys, never a cartesian") {
    val (_, p) = plan("q206_pagerank_converge")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank superstep lost its equi-join:\n$p")
  }

  for (q <- Seq("q162_audio_census", "q163_video_census", "q167_image_census")) {
    test(s"$q: the decode pass is zero-shuffle after the input spread") {
      val (_, p) = plan(q)
      // one round-robin repartition spreads the single-split id scan; the
      // synth+decode mapPartitions stage must add no exchange of its own
      val nEx = "Exchange".r.findAllIn(p).size
      assert(nEx <= 2, s"decode stage grew extra shuffles ($nEx):\n$p")
      assert(!p.contains("Join") && !p.contains("Window"),
        s"decode pass must be a pure partition-local map:\n$p")
    }
  }

  // --- round-11 additions ------------------------------------------------

  test("q244: the shared QI census is computed once (exchange reuse), pruned") {
    val (df, p) = plan("q244_t_closeness")
    assert(!p.contains("CartesianProduct"), s"cartesian in the EMD grid:\n$p")
    scans(df).foreach(sc => assert(sc.requiredSchema.size <= 3,
      s"events scan reads ${sc.requiredSchema.fieldNames.mkString(",")}"))
    // the cnt census is referenced by cls/gl/grid: physically it must be
    // ONE scan+aggregate whose exchange the other branches REUSE
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    assert(ep.contains("ReusedExchange"),
      s"shared QI census re-executed per branch:\n$ep")
  }

  test("q257: the 16-pattern census is computed once and cached for both consumers") {
    // round-12 (round-11 ADVICE): wn fans out to the tot aggregate and
    // the field unpivot — it must be a persisted frame both branches
    // read as an in-memory scan, or the fsScored blocked self-join runs
    // twice (q248's analogous fsScored persist is the precedent)
    val (df, p) = plan("q257_fs_em_step")
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    val inMem = "InMemoryTableScan".r.findAllIn(ep).size
    assert(inMem >= 2,
      s"pattern census not shared (saw $inMem InMemoryTableScans):\n$ep")
    spark.catalog.clearCache()
  }

  test("q245: peel rounds are semi equi-joins, never a cartesian") {
    val (df, p) = plan("q245_kcore_peeling")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"k-core peel lost its equi-joins:\n$p")
    // both base tables pruned to the two join/key columns each
    scans(df).foreach(sc => assert(sc.requiredSchema.size <= 2,
      s"scan reads ${sc.requiredSchema.fieldNames.mkString(",")}"))
  }

  test("q246: agreement census joins are equi; contingency never fans out") {
    val (_, p) = plan("q246_cluster_agreement")
    assert(!p.contains("CartesianProduct"),
      s"cartesian in the pair-counting census:\n$p")
  }

  test("q57: CC labels reach consumers as a checkpoint leaf, not loop lineage") {
    // r16 optimization pin: ccFromPairs localCheckpoints each label
    // generation, so a consumer's plan is bounded — it must contain the
    // checkpoint leaf (Scan ExistingRDD) and must NOT re-embed the
    // band-join machinery once per CC iteration (the pre-r16 plan
    // string was ~0.6 MB; q246's reached 1.3 MB / 486 broadcast joins).
    val (_, p) = plan("q57_dup_clusters")
    assert(p.contains("Scan ExistingRDD"),
      s"labels no longer a checkpoint leaf:\n$p")
    assert(p.length < 100000,
      s"q57 plan blew back up to ${p.length} chars — lineage leak")
    spark.catalog.clearCache()
  }

  test("q247/q250/q255: moment censuses prune their scans and reuse exchanges") {
    for ((q, cols) <- Seq(("q247_jackknife_variance", 2),
        ("q250_benford_audit", 1), ("q255_mann_whitney", 2))) {
      val (df, p) = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
      scans(df).foreach(sc => assert(sc.requiredSchema.size <= cols,
        s"$q: scan reads ${sc.requiredSchema.fieldNames.mkString(",")}"))
      // the dictionary census feeds several derived branches: the
      // executed plan must compute it once and REUSE the exchange —
      // i.e. the raw table is physically scanned once per query
      df.collect()
      val ep = df.queryExecution.executedPlan.toString
      if (scans(df).size > 1)
        assert(ep.contains("ReusedExchange"),
          s"$q: shared census re-executed per branch:\n$ep")
    }
  }

  test("q260: window sweep is one broadcast, stage joins stay equi") {
    val (_, p) = plan("q260_conversion_windows")
    assert(!p.contains("CartesianProduct"), s"cartesian in the funnel:\n$p")
    // the only nested-loop is the designed 3-row window broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"funnel stage joins degraded to nested loops:\n$p")
  }

  test("q263: clustering census keeps q119's equi-join wedge shape") {
    val (_, p) = plan("q263_clustering_coeff")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedge machinery lost its equi-joins:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"degree attaches no longer broadcast:\n$p")
  }

  test("q265: the median pick is eager and distributed; the readout is slim") {
    // Round-12 shape: the pairwise-slope selection runs EAGERLY inside
    // the builder (range-partitioned rank pick + ≤64-row census collect
    // — the round-11 verdict's fix for the partitionless row_number that
    // funneled ~2.9M pair rows through one task), so building the frame
    // already proves the selection executes. The RETURNED plan must be
    // the slim readout only: a pruned orders scan under the daily
    // aggregate — no window at all (partitionless or otherwise), and no
    // surviving pair join.
    val (df, p) = plan("q265_theil_sen")
    val agg = df.queryExecution.sparkPlan.collect {
      case a if a.nodeName.contains("HashAggregate") => a
    }
    assert(agg.nonEmpty, "daily aggregate missing from the readout")
    scans(df).foreach(sc => assert(sc.requiredSchema.size <= 2,
      s"scan reads ${sc.requiredSchema.fieldNames.mkString(",")}"))
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty, s"readout should carry no window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"pair join leaked into the readout plan:\n$p")
  }

  test("q325: the native HLL aggregate partial-aggregates before the exchange") {
    val df = graft.SparkEntry.queries("q325_native_hll")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    // the sketch must fold map-side (256-byte partial state shuffled,
    // not rows) and merge above — Spark renders the split as
    // partial/merge modes of the same aggregate
    assert(p.contains("partial_hll_distinct"),
      s"no map-side partial sketch in:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed aggregate lost its object-hash path:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q326: the metadata aggregate reads zero blocks through agg pushdown") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] = {
      val here = p match { case b: BatchScanExec => Seq(b); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    val df = graft.SparkEntry.queries("q326_metadata_agg")(spark, dir)
    df.collect()
    val scans = walk(df.queryExecution.executedPlan)
    assert(scans.size == 1)
    val scan = scans.head.scan.asInstanceOf[graft.sources.GcolScan]
    assert(scan.aggregated, "aggregation was not pushed to the scan")
    assert(scan.plannedBlocks === 0,
      s"metadata query opened ${scan.plannedBlocks} data blocks")
    assert(scan.description().contains("PushedAggregates"))
  }

  test("q327: topN pushdown opens only the tail blocks") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] = {
      val here = p match { case b: BatchScanExec => Seq(b); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    val df = graft.SparkEntry.queries("q327_columnar_topn")(spark, dir)
    df.collect()
    val scans = walk(df.queryExecution.executedPlan)
    assert(scans.size == 1)
    val scan = scans.head.scan.asInstanceOf[graft.sources.GcolScan]
    // ORDER BY o_orderkey DESC LIMIT 1000 over o_orderkey-clustered
    // blocks: the exclusion rule must drop at least the head of the key
    // range (how many tail blocks survive depends on the SF's rows per
    // block — at sf0.001 it's 3 of 4 ~375-row blocks, at sf0.01 1-2 of
    // 8 2048-row blocks; the invariant is strict pruning, exact counts
    // live in ColumnarSourceSpec's controlled layouts)
    assert(scan.plannedBlocks < scan.totalBlocks,
      s"topN kept ${scan.plannedBlocks}/${scan.totalBlocks} blocks")
  }

  test("q323: the columnar scan is vectorized, pruned, and skips blocks") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] = {
      val here = p match { case b: BatchScanExec => Seq(b); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    val df = graft.SparkEntry.queries("q323_columnar_scan")(spark, dir)
    df.collect()
    val batchScans = walk(df.queryExecution.executedPlan)
    assert(batchScans.size == 1, "expected exactly one graft-columnar scan")
    val b = batchScans.head
    assert(b.supportsColumnar, "the gcol scan lost its ColumnarBatch path")
    val scan = b.scan.asInstanceOf[graft.sources.GcolScan]
    // the fixture carries 6 columns; the query references 4 — the scan
    // must read exactly those (the unreferenced l_partkey/l_suppkey
    // segments are never fetched from disk)
    assert(scan.readSchema().fieldNames.toSet ===
      Set("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"),
      s"scan reads ${scan.readSchema().fieldNames.mkString(",")}")
    // the range predicate must be ACCEPTED for zone-map skipping
    assert(scan.pushedAccepted.exists(_.toString.contains("l_orderkey")),
      s"range filter not pushed: ${scan.pushedAccepted.mkString(",")}")
    // zone maps were consulted (skip COUNTS are data-dependent across
    // SFs; ColumnarSourceSpec pins actual skipping on controlled data)
    assert(scan.totalBlocks > 0 && scan.plannedBlocks >= 0 &&
      scan.plannedBlocks <= scan.totalBlocks)
  }
}
