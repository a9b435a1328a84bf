package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** The native HLL aggregate's distributed-correctness contract: the
  * register algebra must be partitioning-invariant (that is what makes
  * the partial/merge protocol sound), deterministic, null-skipping,
  * and must agree with a from-first-principles reference.
  */
class HllDistinctSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def est(df: org.apache.spark.sql.DataFrame): Double = {
    graft.functions.GraftFunctions.register(spark)
    df.agg(expr("hll_distinct(cast(v as string))")).collect().head.getDouble(0)
  }

  test("partitioning-invariant: 1, 8 and 64 partitions give the same bits") {
    import spark.implicits._
    val base = spark.range(0, 50000).select(($"id" % 9973).as("v"))
    val e1 = est(base.repartition(1))
    val e8 = est(base.repartition(8))
    val e64 = est(base.repartition(64))
    assert(e1 == e8 && e8 == e64,
      s"merge protocol is not partition-invariant: $e1 / $e8 / $e64")
  }

  test("duplicates never move the estimate; nulls are skipped") {
    import spark.implicits._
    val vals = spark.range(0, 2000).select(($"id" % 997).as("v"))
    val dup = vals.unionAll(vals).unionAll(vals)
    assert(est(vals) == est(dup), "duplicate rows changed the registers")
    val withNulls = vals.select(
      when($"v" % 7 === 0, lit(null)).otherwise($"v").as("v"))
    val nonNull = vals.filter($"v" % 7 =!= 0)
    assert(est(withNulls) == est(nonNull), "nulls entered the sketch")
  }

  test("empty relation and all-null input report ZERO distinct, not the raw-HLL floor") {
    import spark.implicits._
    // an untouched buffer is uniquely the zero-distinct state (any
    // non-null update sets a register to rho >= 1); without the guard
    // the readout is alpha*m ~ 183.9 for zero rows
    val empty = spark.range(0).select($"id".as("v"))
    assert(est(empty) == 0.0, "empty relation must estimate 0 distinct")
    val allNull = spark.range(100).select(lit(null).cast("long").as("v"))
    assert(est(allNull) == 0.0, "all-null input must estimate 0 distinct")
    // and one real value flips it off zero
    val one = spark.range(1).select($"id".as("v"))
    assert(est(one) > 0.0)
  }

  test("agrees with a from-first-principles register replay") {
    import spark.implicits._
    val n = 5000L
    val df = spark.range(0, n).select($"id".as("v"))
    // reference: same md5-h15 -> bucket/rho -> exact shifted sum -> C/S
    val regs = new Array[Int](HllDistinct.M)
    (0L until n).foreach { v =>
      val h = MinHashSig.h15(v.toString.getBytes("UTF-8"))
      val b = (h & (HllDistinct.M - 1)).toInt
      val w = h >>> HllDistinct.P
      val rho = if (w == 0L) HllDistinct.MaxRho
        else java.lang.Long.numberOfLeadingZeros(w) - 11
      if (rho > regs(b)) regs(b) = rho
    }
    val s = regs.map(m => 1L << (HllDistinct.MaxRho - m)).sum
    val expected = HllDistinct.C / s.toDouble
    assert(est(df) == expected, "aggregate diverged from the reference")
    // and the estimate is in a sane band for m=256 (SE ~ 6.5%)
    assert(math.abs(expected - n) / n < 0.25, s"estimate $expected vs $n")
  }

  test("the sketch shuffles orders of magnitude fewer bytes than count(distinct)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // the 100-TB claim, measured: partial sketches shuffle 256 B per
    // (group, task) regardless of cardinality; count(distinct) must
    // shuffle every distinct key
    def shuffledBytes(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = {
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val here = p match {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.metrics.get("shuffleBytesWritten").map(_.value).toSeq
          case _ => Nil
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        here ++ kids.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan).sum
    }
    // % breaks range-id's provable uniqueness — Spark 4 otherwise
    // rewrites count(distinct unique_col) to a plain count and the
    // distinct-key shuffle being measured here never happens
    val wide = spark.range(0, 2000000, 1, 16)
      .select(($"id" % 1900000L).as("v"))
    val hll = shuffledBytes(
      wide.agg(expr("hll_distinct(cast(v as string))")))
    val cd = shuffledBytes(wide.agg(countDistinct($"v")))
    assert(hll > 0 && cd > 0, s"metrics missing: hll=$hll cd=$cd")
    assert(hll * 100 < cd,
      s"sketch shuffle ($hll B) not << distinct-key shuffle ($cd B)")
  }

  test("the shared C literal round-trips through its decimal rendering") {
    // the DuckDB oracle embeds C.toString; parsing it back must yield
    // the identical double or the one-division readout desyncs
    assert(HllDistinct.C.toString.toDouble == HllDistinct.C)
  }
}
