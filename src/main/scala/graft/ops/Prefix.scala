package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.expressions.Window

/** Distributed prefix sums over value dictionaries.
  *
  * The inventory's rank/quantile machinery (q255 Mann–Whitney, q266
  * median CI, q270 Gini, q280 GK calibration, q284 trimmed means, q286
  * Hill, q289 Wasserstein, q211 KS, q268 Spearman, DDSketch readout)
  * all reduce a scan to a (value → counts) dictionary and then need
  * `sum(count) over (order by value)`. A partitionless `Window.orderBy`
  * computes that by moving the WHOLE dictionary to one task — fine
  * while NDV is small, but a price dictionary's NDV grows toward the
  * row count at 100 TB, so the single sort becomes the one
  * non-scalable stage in an otherwise map-side-combining plan (the
  * round-12 verdict's top structural liability).
  *
  * This helper computes the same cumsum as a TWO-STAGE BUCKETED prefix
  * sum (the q232 PPS decomposition, generalized from its md5-hex
  * buckets to range buckets over any integral value column):
  *
  *   1. range-bucket the dictionary into B buckets via pure integer
  *      arithmetic — bucket id is monotone in the requested order, so
  *      bucket boundaries never split the order;
  *   2. within-bucket inclusive cumsum, `Window.partitionBy(bkt)` —
  *      key-parallel, each sort sees ~NDV/B rows;
  *   3. per-bucket totals (≤ B rows per group) → exclusive running
  *      offsets, added back to the local cumsum.
  *
  * No task ever sorts more than one bucket; B is a knob (64 here — at a
  * 100-TB NDV raise it and nothing else changes). Equal-width buckets
  * are the right split for these dictionaries because the value domains
  * are dense integers (cents, micro-units): duplicates concentrate in
  * the COUNT column, not in distinct values, so distinct rows spread
  * roughly uniformly across the range. (Contrast q265's pair-slope
  * histogram, where mass concentrates at the median and driver-side
  * histogram selection is the better tool — that pattern lives at its
  * call site.)
  *
  * Job discipline (the q265/q278 lesson, re-learned here in round 13):
  * the first spelling attached bounds via `crossJoin(broadcast(...))`
  * and offsets via a broadcast-joined aggregate — two lazy broadcast
  * chains, each billing a job plus AQE stages, which regressed the
  * sub-3s rank queries 1.7-2.1× on the sf0.1 board. Bounds and the
  * ≤ B·|groups|-row bucket census now COLLECT to the driver (both
  * collects bounded by construction): bounds become literals inside
  * the bucket expression, and the running offsets come back as a
  * LocalRelation broadcast — which `BroadcastExchangeExec`
  * materializes driver-side without launching a job. Per call: two
  * bounded collect jobs + the one distributed window pass. Callers
  * with several dictionaries union them under a tag column and pass
  * `partCols = Seq("tag")` so the fixed cost is paid once (q211/q268).
  *
  * Exactness: bucket assignment is integer division off exact long
  * bounds; the two-stage sum reassociates an already-associative sum —
  * every oracle twin runs the plain global window, and the hash match
  * proves the decomposition exact.
  *
  * Cost contract: each call makes THREE passes over `dict` (bounds
  * collect, census collect, windowed main pass) — callers persist the
  * dictionary first so the passes hit a NDV-bounded cache, not the
  * base scan.
  */
object Prefix {

  /** Bucket-id column: monotone in the requested order, in [0, B-1],
    * integer arithmetic off collected exact long bounds. */
  private def bktCol(valueCol: String, lo: Long, hi: Long, asc: Boolean,
                     buckets: Int): Column = {
    // width = (hi-lo) div B + 1 keeps bkt in [0, B-1] with no multiply
    // (overflow-safe for any long range); (hi - v) flips monotonicity
    // for descending order so bkt asc always matches the cumsum order.
    // All integer `div` (never Column./, which is double division and
    // inexact past 2^53).
    val num = if (asc) s"cast(`$valueCol` as bigint) - (${lo}L)"
              else s"(${hi}L) - cast(`$valueCol` as bigint)"
    expr(s"($num) div ((${hi}L - (${lo}L)) div ${buckets} + 1)")
  }

  /** Append inclusive running sums over `dict` ordered by `valueCol`,
    * and optionally the next distinct value in that order (`leadCol` —
    * q289's `lead(v)` over the value grid, which would otherwise need
    * its own global sort; the per-bucket boundary is patched from the
    * same collected census, so the lead is free).
    *
    * @param dict      dictionary frame (distinct `valueCol` per
    *                  `partCols` group; rows with equal values within a
    *                  group would land in one tied block anyway — the
    *                  callers all pre-aggregate, so ties never occur)
    * @param valueCol  integral (long-castable) ordering column
    * @param sums      (source column → output column) running sums to
    *                  append; source may be long or decimal
    * @param asc       order direction of the cumsum
    * @param partCols  optional outer partition columns (q289's segment,
    *                  q211/q268's dictionary tag): cumsums restart per
    *                  group, buckets still come from the GLOBAL value
    *                  bounds so the census stays ≤ B·|groups| rows
    * @param buckets   bucket count B (sort width ≈ NDV/B)
    * @param leadCol   when set, emit lead(valueCol) in cumsum order
    *                  under this name (per partCols group; the last
    *                  value of each group gets null, same as a plain
    *                  lead window)
    * @param smallNdv  measured-row-count threshold below which the
    *                  plain one-partition window runs instead of the
    *                  bucketed decomposition (tests pass 0 to force
    *                  the bucketed path on small fixtures). Default
    *                  retuned in the r16 optimization round with
    *                  same-window A/B pairs (warm min-of-4 at sf0.1,
    *                  two reps each):
    *                    1M (old): q268 2.89/3.50, q294 1.97/2.12 —
    *                      the ~450k-row price dictionaries sat on the
    *                      ONE-TASK sort, serializing the rank
    *                      machinery;
    *                    64k: q268 1.62/1.65 but q294 2.72/3.00 — its
    *                      ~75k-row calib dictionaries paid the
    *                      bucketed census collect (2 extra jobs per
    *                      call) for sorts costing ~50 ms;
    *                    256k (shipped): q268 1.36/1.56, q294
    *                      1.94/2.23, q289 1.37/1.42, q280 1.20/1.30,
    *                      q211/q255 at their plain floors — best or
    *                      tied on every caller.
    *                  The decision input stays the MEASURED row
    *                  count, so a 100-TB dictionary takes the
    *                  bucketed path regardless; the constant is
    *                  env-tunable (GRAFT_SMALLNDV) for re-pairing.
    */
  def cumsum(dict: DataFrame, valueCol: String, sums: Seq[(String, String)],
             asc: Boolean = true, partCols: Seq[String] = Nil,
             buckets: Int = 64, leadCol: Option[String] = None,
             smallNdv: Long = sys.env.getOrElse("GRAFT_SMALLNDV", (1L << 18).toString).toLong): DataFrame = {
    val v = col(valueCol).cast(LongType)
    val b0 = dict.agg(min(v).as("lo"), max(v).as("hi"),
      count(lit(1)).as("ndv")).collect()(0)
    // Adaptive altitude (AQE's move, applied across the helper): the
    // same bounds collect also measures the dictionary's TRUE row
    // count. Under `smallNdv` rows a one-task sort costs milliseconds
    // while the bucketed machinery costs a second collect plus an
    // offsets join — so the small side runs the plain window on ONE
    // measured-small partition (partitionBy(lit(0)): same plan as a
    // partitionless window, minus WindowExec's data-scale warning,
    // and here it is not a guess — the count was just taken). The
    // decision is per-run from runtime statistics, so a 100-TB
    // dictionary takes the bucketed path without any code change.
    val ord = if (asc) col(valueCol).asc else col(valueCol).desc
    if (b0.getLong(2) <= smallNdv) {
      val parts: Seq[Column] =
        if (partCols.isEmpty) Seq(lit(0)) else partCols.map(col)
      val wOne = Window.partitionBy(parts: _*).orderBy(ord)
      val withSums = sums.foldLeft(dict) { case (df, (src, out)) =>
        df.withColumn(out, sum(col(src)).over(
          wOne.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
      return leadCol.fold(withSums)(lc =>
        withSums.withColumn(lc, lead(col(valueCol), 1).over(wOne)))
    }
    // empty dictionary: zero rows flow through unchanged — any bucket
    // constant yields the same (empty) result (unreachable when
    // smallNdv > 0, kept for the forced-bucketed test path)
    val (lo, hi) = if (b0.isNullAt(0)) (0L, 0L)
                   else (b0.getLong(0), b0.getLong(1))
    val bkt = bktCol(valueCol, lo, hi, asc, buckets)
    val bucketed = dict.withColumn("_pbkt", bkt)
    val wLocal = Window
      .partitionBy((partCols :+ "_pbkt").map(col): _*)
      .orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSums = sums.foldLeft(bucketed) { case (df, (src, out)) =>
      df.withColumn(out, sum(col(src)).over(wLocal))
    }
    val local = leadCol.fold(withSums)(lc => withSums.withColumn(lc,
      lead(col(valueCol), 1).over(Window
        .partitionBy((partCols :+ "_pbkt").map(col): _*).orderBy(ord))))
    // Bucket census (≤ B rows per partCols group) collects to the
    // driver; exclusive running offsets per group — plus, for leadCol,
    // the first value of the nearest LATER non-empty bucket — computed
    // there and shipped back as a LocalRelation: broadcast-joining a
    // local relation launches NO job (BroadcastExchange materializes
    // it driver-side), so the whole branch costs one bounded collect.
    val firstAgg = if (asc) min(v) else max(v)
    val totAggs = sums.map { case (src, _) =>
      sum(col(src)).as(s"_pt_$src")
    } :+ firstAgg.as("_pfirst")
    val census = bucketed
      .groupBy((partCols :+ "_pbkt").map(col): _*)
      .agg(totAggs.head, totAggs.tail: _*)
    val censusRows = census.collect()
    val nKey = partCols.length
    def plus(a: Any, b: Any): Any = (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x: java.lang.Long, y: java.lang.Long) =>
        java.lang.Long.valueOf(x.longValue + y.longValue)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case _ => throw new IllegalArgumentException(
        s"unsupported cumsum total type: $a / $b")
    }
    val firstIdx = nKey + 1 + sums.length
    val offsetRows: Seq[Row] = censusRows
      .groupBy(r => (0 until nKey).map(r.get).toSeq)
      .iterator.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(nKey))
        // walk buckets in cumsum order: running exclusive totals
        // forward, next-bucket-first-value backward
        val nexts = new Array[Any](sorted.length)
        var nv: Any = null
        for (i <- sorted.indices.reverse) {
          nexts(i) = nv
          nv = sorted(i).get(firstIdx)
        }
        var acc: Array[Any] = Array.fill(sums.length)(null)
        sorted.zipWithIndex.map { case (r, i) =>
          val out = Row.fromSeq(
            (0 to nKey).map(r.get) ++ acc.toSeq :+ nexts(i))
          acc = Array.tabulate(sums.length)(j =>
            plus(acc(j), r.get(nKey + 1 + j)))
          out
        }
      }.toSeq
    // offsets carry the CENSUS total types (long or decimal) — reuse
    // the census schema so Row values round-trip exactly
    val offSchema = StructType(
      (0 to nKey).map(census.schema(_)) ++
        sums.zipWithIndex.map { case ((src, _), i) =>
          census.schema(nKey + 1 + i).copy(name = s"_po_$src",
            nullable = true)
        } :+ StructField("_pnext", LongType, nullable = true))
    val offsets = dict.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(offsetRows).asJava), offSchema)
    val joined = local.join(broadcast(offsets), partCols :+ "_pbkt")
    val summed = sums.foldLeft(joined) { case (df, (src, out)) =>
      df.withColumn(out,
        when(col(s"_po_$src").isNull, col(out))
          .otherwise(col(out) + col(s"_po_$src")))
        .drop(s"_po_$src")
    }
    leadCol.fold(summed)(lc => summed.withColumn(lc,
        coalesce(col(lc), col("_pnext").cast(dict.schema(valueCol).dataType))))
      .drop("_pbkt", "_pnext")
  }
}
