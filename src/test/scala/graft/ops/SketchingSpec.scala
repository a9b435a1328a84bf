package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Semantic properties of the from-scratch cardinality sketches: the
  * merge laws (bottom-K union, register-wise max) must be EXACT — the
  * whole point of a mergeable summary is that distributed partial
  * sketches lose nothing vs a single-pass sketch of the union.
  */
class SketchingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("q201 DDSketch: every quantile estimate honors the 2% relative-error contract") {
    import spark.implicits._
    val out = Sketching.queries("q201_ddsketch_quantiles")(spark, dir).cache()
    val rows = out.orderBy("qpct").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(50, 90, 95, 99))
    // gamma = 1.02 guarantees |est - true_rank_stat| / true <= 2%; the
    // exact column interpolates (quantile_cont) so allow a whisker over
    rows.foreach { r =>
      val err = math.abs(r.getAs[Double]("rel_err"))
      assert(err <= 0.021, s"q${r.getInt(0)}: rel_err $err breaks the γ contract")
    }
    // estimates and buckets are monotone in the quantile
    val ests = rows.map(_.getAs[Double]("est")).toSeq
    assert(ests == ests.sorted, s"estimates not monotone: $ests")
    val bks = rows.map(_.getAs[Long]("bucket")).toSeq
    assert(bks == bks.sorted, s"buckets not monotone: $bks")
    // sketch mass equals the source row count
    val n = graft.Tables.orders(spark, dir).filter($"o_totalprice" > 0).count()
    assert(rows.forall(_.getAs[Long]("n") == n))
    out.unpersist()
  }

  test("q181 KMV: union-of-sketches estimate == single-pass union sketch estimate") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q181_kmv_sketch")(spark, dir)
      .filter($"source" === "__union__").collect()
    assert(out.length == 1)
    val row = out.head
    // recompute the union kth from the FULL distinct hash set (the
    // single-pass sketch the merge must equal)
    graft.functions.GraftFunctions.register(spark)
    val dh = graft.Tables.documents(spark, dir)
      .select(explode(expr("shingle_hashes(split(text, ' '), 3)")).as("h"))
      .distinct()
    val kth = dh.orderBy($"h").limit(32).agg(max($"h")).first().getLong(0)
    assert(row.getAs[Long]("kth") == kth,
      s"merged union kth ${row.getAs[Long]("kth")} != single-pass $kth")
    val exact = dh.count()
    assert(row.getAs[Long]("n_exact") == exact)
  }

  test("q181 KMV: small groups (< K distinct) report exact counts with no kth") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q181_kmv_sketch")(spark, dir)
    out.collect().foreach { r =>
      val n = r.getAs[Long]("n_exact")
      if (n < 32) {
        assert(r.isNullAt(r.fieldIndex("kth")))
        assert(r.getAs[Double]("kmv_est") == n.toDouble)
        assert(r.getAs[Double]("rel_err") == 0.0)
      }
    }
  }

  test("q186: adding a shard moves only ~1/9 of keys, all INTO the new shard") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q186_shard_routing")(spark, dir).collect()
    assert(out.length == 9)
    val byShard = out.map(r => r.getAs[Int]("shard") -> r).toMap
    // the defining consistent-hashing property: existing shards never gain
    (0 to 7).foreach { sh =>
      assert(byShard(sh).getAs[Long]("gained") == 0L, s"shard $sh gained keys")
      assert(byShard(sh).getAs[Long]("n_after") <= byShard(sh).getAs[Long]("n_before"))
    }
    assert(byShard(8).getAs[Long]("n_before") == 0L)
    assert(byShard(8).getAs[Long]("gained") == byShard(8).getAs[Long]("n_after"))
    val total = out.map(_.getAs[Long]("n_before")).sum
    assert(out.map(_.getAs[Long]("n_after")).sum == total, "keys lost in rebalance")
    // moved fraction near the 1/9 theory (vnode-placement variance allowed)
    val frac = byShard(8).getAs[Long]("gained").toDouble / total
    assert(frac > 0.04 && frac < 0.25, s"moved fraction $frac far from 1/9")
    // injective argmin precondition: all 144 vnode ring positions distinct
    val vpos = spark.range(0, 144).selectExpr(
      "cast(conv(substring(md5(concat(cast(id div 16 as string), ':'," +
        " cast(id % 16 as string))), 1, 7), 16, 10) as bigint) as v")
      .distinct().count()
    assert(vpos == 144, s"vnode position collision: $vpos distinct of 144")
  }

  test("q187 bloom: zero false negatives; measured FPR tracks theory") {
    import spark.implicits._
    val row = graft.SparkEntry.queries("q187_bloom_fpr")(spark, dir).collect().head
    assert(math.abs(row.getAs[Double]("fpr_measured")
      - row.getAs[Double]("fpr_theory")) < 0.08,
      s"measured ${row.getAs[Double]("fpr_measured")} vs theory ${row.getAs[Double]("fpr_theory")}")
    assert(row.getAs[Long]("n_bits_set") <= 16384L)
    // no false negatives: every MEMBER probed through the filter passes
    // all 4 hash checks (rebuild with the query's exact hash family)
    val mem = graft.Tables.customer(spark, dir)
      .filter($"c_custkey" % 2 === 0).select($"c_custkey")
    val pos = mem
      .select($"c_custkey", explode(sequence(lit(0), lit(3))).as("j"))
      .select($"c_custkey",
        (Det.h7(concat($"j".cast("string"), lit(":"),
          $"c_custkey".cast("string"))) % 16384).as("pos"))
    val bits = pos.select($"pos").distinct()
    val misses = pos.join(bits, Seq("pos"), "left_anti").count()
    assert(misses == 0L, s"$misses member positions missing from the filter")
  }

  test("q188: skew census is conserved and monotone in key cardinality") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q188_skew_preflight")(spark, dir).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_rows")).distinct.length == 1,
      "row totals differ across key censuses of the same table")
    out.foreach { r =>
      assert(r.getAs[Double]("skew_ratio") >= 1.0) // max >= mean always
      assert(r.getAs[Long]("salt_factor") >= 1L)
      assert(r.getAs[Long]("top1_rows") <= r.getAs[Long]("max_part_rows"))
    }
    val byKey = out.map(r => r.getAs[String]("join_key") -> r).toMap
    // fewer distinct keys -> lumpier reducers
    assert(byKey("l_suppkey").getAs[Double]("skew_ratio")
      >= byKey("l_orderkey").getAs[Double]("skew_ratio"))
  }

  test("q182 HLL: union registers are the register-wise max; estimate within HLL error") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("q182_hll_registers")(spark, dir).collect()
    val union = out.find(_.getAs[String]("source") == "__union__").get
    val perSrc = out.filter(_.getAs[String]("source") != "__union__")
    // the union is a real union: at least as many distincts as any source
    assert(perSrc.forall(_.getAs[Long]("n_exact") <= union.getAs[Long]("n_exact")))
    // m=64 HLL standard error is 1.04/sqrt(64) = 13%; allow 4 sigma for
    // the small fixed corpus (plus the linear-counting regime is near
    // exact, so most rows sit far inside this)
    out.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.52,
        s"${r.getAs[String]("source")}: rel_err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("q280: GK estimates sit inside their rank guarantee; exacts are true quantiles") {
    import spark.implicits._
    val rows = Sketching.queries("q280_gk_calibration")(spark, dir)
      .orderBy("p_micro").collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Boolean]("est_in_bounds"),
      s"p=${r.getLong(0)}: sketch broke its eps*n guarantee"))
    val ex = rows.map(_.getAs[Long]("exact_cents")).toSeq
    assert(ex == ex.sorted, s"exact quantiles not monotone: $ex")
    // driver twin: exact quantile = element at rank ceil(p*n)
    val xs = graft.Tables.lineitem(spark, dir)
      .select(floor($"l_extendedprice" * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    rows.foreach { r =>
      val p = r.getAs[Long]("p_micro")
      val rk = ((p * xs.length + 999999L) / 1000000L).toInt
      assert(r.getAs[Long]("exact_cents") == xs(rk - 1),
        s"p=$p exact ${r.getAs[Long]("exact_cents")} vs ${xs(rk - 1)}")
    }
  }

  test("q237: KMV set algebra covers every source pair with sane estimates") {
    import spark.implicits._
    val out = Sketching.queries("q237_kmv_set_algebra")(spark, dir).cache()
    val nSrc = graft.Tables.documents(spark, dir)
      .select($"source").distinct().count()
    assert(out.count() == nSrc * (nSrc - 1) / 2, "one row per source pair")
    // set algebra: inter <= min, union >= max, union = a + b - inter
    assert(out.filter($"exact_inter" > least($"n_a", $"n_b")).count() == 0)
    assert(out.filter($"exact_union" < greatest($"n_a", $"n_b")).count() == 0)
    assert(out.filter($"exact_union" =!=
      $"n_a" + $"n_b" - $"exact_inter").count() == 0)
    assert(out.filter($"k_common" > 32).count() == 0)
    // K=32 KMV standard error ~18%; individual pairs can land deep in
    // the tail (measured worst 0.79 at sf0.001 — one source's kth min
    // drew low), so the per-pair bound is loose and the MEAN carries
    // the contract
    assert(out.filter($"rel_err_union" > 1.2).count() == 0)
    val meanErr = out.agg(avg($"rel_err_union")).as[Double].head()
    assert(meanErr < 0.25, s"mean union rel err $meanErr")
    out.unpersist()
  }

  test("q292: pinball losses reconcile with a driver-side replay") {
    import spark.implicits._
    val rows = Sketching.queries("q292_pinball_loss")(spark, dir).collect()
    assert(rows.nonEmpty)
    val data = graft.Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sorted }
    rows.foreach { r =>
      val f = r.getAs[String]("returnflag")
      val vs = data(f)
      val n = vs.length
      // the committed rank rule: smallest value at inclusive rank ⌈τn⌉
      val q50 = vs((n + 1) / 2 - 1).toInt
      val q90 = vs(((9L * n + 9L) / 10L).toInt - 1)
      assert(r.getAs[Double]("q50_dollars") == q50 / 100.0 ||
        math.abs(r.getAs[Double]("q50_dollars") - q50 / 100.0) < 0.011)
      val pl50 = vs.map(v => 0.5 * math.abs(v - q50)).sum / n / 100.0
      assert(math.abs(r.getAs[Double]("pinball_50") - pl50) < 0.01,
        s"$f pinball50 ${r.getAs[Double]("pinball_50")} vs $pl50")
      val pl90 = vs.map(v => if (v > q90) 0.9 * (v - q90)
        else 0.1 * (q90 - v)).sum / n / 100.0
      assert(math.abs(r.getAs[Double]("pinball_90") - pl90) < 0.01,
        s"$f pinball90 ${r.getAs[Double]("pinball_90")} vs $pl90")
      assert(r.getAs[Double]("q90_dollars") >= r.getAs[Double]("q50_dollars"))
    }
  }
}
