package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Prefix.cumsum must be EXACTLY the partitionless global-window cumsum
  * it replaces, for every direction, bucket count, partition layout and
  * sum type the call sites use — checked row-for-row against the naive
  * window on adversarial value layouts (skewed, clustered, single-value,
  * negative, 1-row, NDV < buckets).
  */
class PrefixSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, vcol: String,
                    asc: Boolean, parts: Seq[String],
                    sums: Seq[(String, String)]) = {
    val ord = if (asc) col(vcol).asc else col(vcol).desc
    val w = Window.partitionBy(parts.map(col): _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.foldLeft(df) { case (d, (src, out)) =>
      d.withColumn(out, sum(col(src)).over(w))
    }
  }

  // every check runs BOTH runtime paths: smallNdv=0 forces the bucketed
  // decomposition (the fixtures are far under the production threshold),
  // the default exercises the measured-small one-partition path
  private def check(df: org.apache.spark.sql.DataFrame, vcol: String,
                    asc: Boolean, parts: Seq[String] = Nil,
                    sums: Seq[(String, String)] = Seq("k" -> "cu"),
                    buckets: Int = 64): Unit = {
    val want = naive(df, vcol, asc, parts, sums)
    for (thr <- Seq(0L, 1L << 19)) {
      val got = Prefix.cumsum(df, vcol, sums, asc, parts, buckets,
        smallNdv = thr)
      assert(got.columns.sorted.sameElements(want.columns.sorted),
        s"columns ${got.columns.toSeq} vs ${want.columns.toSeq}")
      val cols = want.columns.toSeq.sorted.map(col)
      val diff = got.select(cols: _*).exceptAll(want.select(cols: _*))
        .unionAll(want.select(cols: _*).exceptAll(got.select(cols: _*)))
      assert(diff.isEmpty,
        s"thr=$thr mismatch rows: ${diff.take(5).mkString("; ")}")
    }
  }

  // deterministic pseudo-random dictionary: hash-spread values with
  // hash-derived counts, NDV 500 >> 64 buckets
  private lazy val dict = spark.range(500)
    .select((($"id" * 2654435761L) % 100000L).as("v"),
      ($"id" % 17L + 1L).as("k"))
    .groupBy($"v").agg(sum($"k").as("k"))

  test("matches global window: ascending") { check(dict, "v", asc = true) }
  test("matches global window: descending") { check(dict, "v", asc = false) }

  test("skewed domain (values cluster at one end)") {
    val skew = spark.range(400)
      .select(when($"id" < 390, $"id").otherwise($"id" * 1000000L).as("v"),
        lit(1L).as("k"))
      .groupBy($"v").agg(sum($"k").as("k"))
    check(skew, "v", asc = true)
    check(skew, "v", asc = false)
  }

  test("negative values") {
    val neg = spark.range(300)
      .select(($"id" * 7919L % 5000L - 2500L).as("v"), lit(2L).as("k"))
      .groupBy($"v").agg(sum($"k").as("k"))
    check(neg, "v", asc = true)
    check(neg, "v", asc = false)
  }

  test("NDV smaller than bucket count, single row, single value") {
    check(Seq((5L, 3L), (9L, 1L), (1L, 2L)).toDF("v", "k"), "v", asc = true)
    check(Seq((5L, 3L)).toDF("v", "k"), "v", asc = true)
    check(Seq((5L, 3L)).toDF("v", "k"), "v", asc = false)
  }

  test("multiple sum columns ride one pass") {
    val two = dict.withColumn("m", $"k" * 3L + 1L)
    check(two, "v", asc = true, sums = Seq("k" -> "cu", "m" -> "cm"))
  }

  test("decimal sums stay exact") {
    val d = dict.withColumn("k", ($"k" * 1000000007L).cast(DecimalType(38, 0)))
    check(d, "v", asc = true)
  }

  test("partition columns restart the cumsum per group (q289 shape)") {
    val seg = spark.range(600)
      .select(($"id" % 5L).cast(LongType).as("seg"),
        (($"id" * 48271L) % 3000L).as("v"), ($"id" % 9L + 1L).as("k"))
      .groupBy($"seg", $"v").agg(sum($"k").as("k"))
    check(seg, "v", asc = true, parts = Seq("seg"))
    check(seg, "v", asc = false, parts = Seq("seg"))
  }

  test("small bucket counts agree too") {
    check(dict, "v", asc = true, buckets = 1)
    check(dict, "v", asc = true, buckets = 3)
  }

  test("leadCol matches a global lead, including across empty buckets") {
    for (df <- Seq(dict,
        // 390 dense values then a handful far away: most buckets empty,
        // the dense block's last row must reach across them
        spark.range(400)
          .select(when($"id" < 390, $"id").otherwise($"id" * 1000000L).as("v"),
            lit(1L).as("k"))
          .groupBy($"v").agg(sum($"k").as("k")),
        Seq((5L, 3L)).toDF("v", "k"))) {
      val want = df
        .withColumn("cu", sum($"k").over(Window.orderBy($"v".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nv", lead($"v", 1).over(Window.orderBy($"v".asc)))
      for (thr <- Seq(0L, 1L << 19)) {
        val got = Prefix.cumsum(df, "v", Seq("k" -> "cu"),
          leadCol = Some("nv"), smallNdv = thr)
        val cols = want.columns.toSeq.sorted.map(col)
        val diff = got.select(cols: _*).exceptAll(want.select(cols: _*))
          .unionAll(want.select(cols: _*).exceptAll(got.select(cols: _*)))
        assert(diff.isEmpty,
          s"thr=$thr mismatch: ${diff.take(5).mkString("; ")}")
      }
    }
  }

  test("leadCol with partition columns stays inside each group") {
    val seg = spark.range(300)
      .select(($"id" % 3L).as("seg"),
        (($"id" * 48271L) % 999L).as("v"), lit(1L).as("k"))
      .groupBy($"seg", $"v").agg(sum($"k").as("k"))
    val w = Window.partitionBy($"seg").orderBy($"v".asc)
    val want = seg
      .withColumn("cu", sum($"k").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nv", lead($"v", 1).over(w))
    for (thr <- Seq(0L, 1L << 19)) {
      val got = Prefix.cumsum(seg, "v", Seq("k" -> "cu"),
        partCols = Seq("seg"), leadCol = Some("nv"), smallNdv = thr)
      val cols = want.columns.toSeq.sorted.map(col)
      val diff = got.select(cols: _*).exceptAll(want.select(cols: _*))
        .unionAll(want.select(cols: _*).exceptAll(got.select(cols: _*)))
      assert(diff.isEmpty,
        s"thr=$thr mismatch: ${diff.take(5).mkString("; ")}")
    }
  }

  test("descending leadCol yields the next value in descending order") {
    val want = dict
      .withColumn("cu", sum($"k").over(Window.orderBy($"v".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nv", lead($"v", 1).over(Window.orderBy($"v".desc)))
    for (thr <- Seq(0L, 1L << 19)) {
      val got = Prefix.cumsum(dict, "v", Seq("k" -> "cu"), asc = false,
        leadCol = Some("nv"), smallNdv = thr)
      val cols = want.columns.toSeq.sorted.map(col)
      val diff = got.select(cols: _*).exceptAll(want.select(cols: _*))
        .unionAll(want.select(cols: _*).exceptAll(got.select(cols: _*)))
      assert(diff.isEmpty,
        s"thr=$thr mismatch: ${diff.take(5).mkString("; ")}")
    }
  }
}
