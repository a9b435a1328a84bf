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
}
