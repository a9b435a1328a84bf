package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** ScalaCheck algebraic invariants from SURVEY.md §5: null-fill
  * completeness, filter containment, group cardinality, rounding
  * idempotence. Plain ScalaCheck driven through FunSuite (the
  * scalatest+scalacheck bridge artifact is not on the offline resolver).
  */
class PropertiesSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def check(name: String, p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val doubles: Gen[Double] =
    Gen.chooseNum(-1e6, 1e6).suchThat(d => !d.isNaN && !d.isInfinite)
  private val optDoubles: Gen[List[Option[Double]]] =
    Gen.listOfN(12, Gen.option(doubles))

  test("q97's integer div stays exact past 2^53 where double / + cast diverges") {
    import spark.implicits._
    // operands in the range where doubles lose integer precision but the
    // q97 damping product (x * 85) still fits int64
    val big: Gen[Long] = Gen.chooseNum((1L << 53) + 1, Long.MaxValue / 100)
    val den: Gen[Long] = Gen.chooseNum(1L, 1000000L)
    check("div", Prop.forAll(big, den) { (x, d) =>
      val r = Seq((x, d)).toDF("x", "d")
        .select(expr("x div d").as("q"),
          expr("(x * 85) div 100").as("damped"))
        .head()
      r.getLong(0) == x / d &&
        BigInt(r.getLong(1)) == BigInt(x) * 85 / 100
    })
    // a concrete operand where the double round-trip is WRONG: 2^53 + 1
    // collapses to 2^53 as a double, so `/ 1` + cast drops the low bit
    val r = Seq(((1L << 53) + 1, 1L)).toDF("x", "d")
      .select(expr("x div d").as("q"),
        expr("CAST(CAST(x AS DOUBLE) / d AS BIGINT)").as("q_double"))
      .head()
    assert(r.getLong(0) == (1L << 53) + 1)
    assert(r.getLong(1) == (1L << 53), "the double path loses the low bit — q97 must use div")
  }

  test("q91/q100 decimal sufficient statistics: sum type is DECIMAL(35,4), below the 38 cap") {
    import org.apache.spark.sql.types.{DecimalType, StructType}
    import spark.implicits._
    // pins the type arithmetic q91's headroom comment relies on:
    // DECIMAL(12,2) x DECIMAL(12,2) -> DECIMAL(25,4); sum adds 10 digits
    // -> DECIMAL(35,4). If a precision change ever pushed the sum to the
    // 38-digit cap, worst-case headroom collapses to ~10x and this fails.
    val d = Seq((1.0, 2.0)).toDF("a", "b")
      .select($"a".cast(DecimalType(12, 2)).as("x"),
        $"b".cast(DecimalType(12, 2)).as("y"))
    val schema: StructType = d.agg(sum($"x" * $"y").as("sxy")).schema
    assert(schema("sxy").dataType == DecimalType(35, 4),
      s"sum type drifted: ${schema("sxy").dataType}")
  }

  test("na.fill with a non-null mean leaves zero nulls") {
    import spark.implicits._
    check("fill", Prop.forAll(optDoubles) { xs =>
      val df = xs.toDF("x")
      val mean = df.agg(avg("x")).first()
      // all-null column -> null mean -> fill is a no-op (pandas parity)
      if (mean.isNullAt(0)) true
      else df.na.fill(Map("x" -> mean.getDouble(0)))
        .filter($"x".isNull).count() == 0L
    })
  }

  test("filter output is a subset satisfying the predicate") {
    import spark.implicits._
    check("filter", Prop.forAll(optDoubles) { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
      val out = df.filter($"x" > 0.0)
      val ids = out.select("id").as[Long].collect().toSet
      val inIds = df.select("id").as[Long].collect().toSet
      ids.subsetOf(inIds) &&
        out.filter(!($"x" > 0.0)).count() == 0L &&
        out.count() <= df.count()
    })
  }

  test("groupBy cardinality equals distinct non-null key count") {
    import spark.implicits._
    val keys = Gen.listOfN(20, Gen.option(Gen.choose(0, 5)))
    check("group", Prop.forAll(keys) { ks =>
      val df = ks.map(k => (k, 1.0)).toDF("k", "v")
      val grouped = df.filter($"k".isNotNull).groupBy("k").agg(sum("v")).count()
      val distinct = ks.flatten.distinct.size.toLong
      grouped == distinct
    })
  }

  test("roundAt is idempotent and matches half-away-from-zero") {
    import spark.implicits._
    check("round", Prop.forAll(Gen.listOfN(24, doubles)) { xs =>
      val df = xs.toDF("x")
        .select(Num.roundAt($"x", 2).as("r1"), Num.roundAt(Num.roundAt($"x", 2), 2).as("r2"))
      df.filter(not($"r1" <=> $"r2")).count() == 0L
    })
  }

  test("roundAt preserves the sign bit on negatives rounding to zero (DuckDB parity)") {
    import spark.implicits._
    // DuckDB's round() keeps the sign: round(-1e-6, 2) is -0.0, and the
    // driver's hash compare sees the byte difference even though
    // -0.0 == 0.0 (round-3 q61 failed on exactly this).
    val tiny: Gen[Double] = Gen.chooseNum(-4.9e-3, 4.9e-3)
    check("signbit", Prop.forAll(Gen.listOfN(24, tiny)) { xs =>
      val rs = xs.zipWithIndex.toDF("x", "i")
        .select($"x", Num.roundAt($"x", 2).as("r"))
        .collect()
      rs.forall { row =>
        val x = row.getDouble(0); val r = row.getDouble(1)
        if (r != 0.0) true
        else java.lang.Double.doubleToRawLongBits(r) ==
          java.lang.Double.doubleToRawLongBits(if (x < 0 || (x == 0.0 &&
            java.lang.Double.doubleToRawLongBits(x) != 0L)) -0.0 else 0.0)
      }
    })
  }

  test("Det.h7 lands in [0, 2^28) for arbitrary strings") {
    import spark.implicits._
    check("h7range", Prop.forAll(Gen.listOfN(16, Gen.alphaNumStr)) { xs =>
      val rs = xs.toDF("s").select(Det.h7(col("s")).as("h"))
        .as[Long].collect()
      rs.forall(h => h >= 0L && h < (1L << 28))
    })
  }

  test("Det.minhashPerm stays in [0, P) with no int64 overflow headroom violation") {
    import spark.implicits._
    // j in 0..63 and h < 2^28 must keep a_j * h + b_j under 2^63 and the
    // result under the Mersenne modulus — the invariant both engines'
    // integer arithmetic relies on for bit parity
    val gen = Gen.zip(Gen.choose(0, 63), Gen.choose(0L, (1L << 28) - 1))
    check("perm", Prop.forAll(Gen.listOfN(16, gen)) { xs =>
      val rs = xs.toDF("j", "h")
        .select(Det.minhashPerm(col("j"), col("h")).as("p"))
        .as[Long].collect()
      rs.forall(p => p >= 0L && p < Det.MinHashP)
    })
  }

  // --- TopKAggregator buffer algebra (pure, no Spark session needed).
  // The O(k) sorted-insert/two-pointer-merge rewrite must agree with the
  // obvious sort-everything reference on ANY input split — this is the
  // partial-aggregation correctness contract Spark relies on when it
  // reduces rows in arbitrary partition order and merges buffers in
  // arbitrary tree shapes.

  private val pairs: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.choose(0L, 20L)))

  /** Sort-everything reference; duplicates kept, like repeated reduce. */
  private def refTopK(k: Int, xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  test("TopKAggregator: reduce-fold equals sort-take reference for any input order") {
    val agg = new graft.functions.TopKAggregator(3)
    check("topk-reduce", Prop.forAll(pairs) { xs =>
      xs.foldLeft(agg.zero)(agg.reduce) == refTopK(3, xs)
    }, n = 50)
  }

  test("TopKAggregator: any split point merges to the same top-k (merge correctness)") {
    val agg = new graft.functions.TopKAggregator(3)
    check("topk-merge", Prop.forAll(Gen.zip(pairs, pairs)) { case (a, b) =>
      val left = a.foldLeft(agg.zero)(agg.reduce)
      val right = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(left, right) == refTopK(3, a ++ b) &&
        agg.merge(right, left) == refTopK(3, a ++ b) // commutative
    }, n = 50)
  }

  // q25's recall contract: any pair within Hamming distance 5 over a
  // 60-bit SimHash shares at least one untouched 10-bit band (6 bands,
  // ≤5 flipped bits — pigeonhole), so the band equi-join has PERFECT
  // recall at the emitted threshold. Pure bit math.
  test("q25 pigeonhole: hamming <= 5 over 60 bits always leaves a clean 10-bit band") {
    val cases = for {
      x <- Gen.chooseNum(0L, (1L << 60) - 1)
      nFlips <- Gen.chooseNum(0, 5)
      flips <- Gen.listOfN(nFlips, Gen.chooseNum(0, 59))
    } yield (x, flips)
    check("pigeonhole", Prop.forAll(cases) { case (x, flips) =>
      val y = flips.foldLeft(x)((v, b) => v ^ (1L << b))
      (0 until 6).exists(b => ((x >> (10 * b)) & 1023L) == ((y >> (10 * b)) & 1023L))
    }, n = 300)
  }

  // q112's recall contract: a point inside [s, e) always lands in one of
  // the interval's covering buckets, for ANY bucket width — so the
  // bucketized equi-join can never lose a pair the range predicate would
  // keep (the bucket condition is IMPLIED by containment; pure long
  // arithmetic, no Spark needed).
  test("q112 bucket covering: containment implies bucket membership for any width") {
    val cases = for {
      w <- Gen.chooseNum(1L, 1000L)
      s <- Gen.chooseNum(-100000L, 100000L)
      len <- Gen.chooseNum(1L, 50000L)
      off <- Gen.chooseNum(0L, len - 1)
    } yield (w, s, s + len, s + off)
    check("bucket-cover", Prop.forAll(cases) { case (w, s, e, p) =>
      // floor division; q112's epoch-µs operands are non-negative, where
      // Spark's truncating `div` and DuckDB's flooring `//` both equal
      // this (on negatives the two ENGINES differ — a bucketized join
      // over signed keys must pin floor semantics explicitly)
      def fdiv(a: Long, b: Long) = Math.floorDiv(a, b)
      fdiv(s, w) <= fdiv(p, w) && fdiv(p, w) <= fdiv(e - 1, w)
    }, n = 200)
  }

  test("shingle_hashes(w): equals the naive w-gram model for any tokens and width") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val P = 2147483647L
    def model(toks: List[String], w: Int): Seq[Long] = {
      val th = toks.map(t => graft.functions.MinHashSig.h7(t.getBytes))
      val raw =
        if (toks.length >= w)
          th.sliding(w).map(_.reduceLeft((a, x) => (a * 31L + x) % P)).toSeq
        else
          Seq(graft.functions.MinHashSig.h7(toks.mkString(" ").getBytes("UTF-8")))
      raw.distinct.sorted
    }
    val toks = Gen.listOfN(12, Gen.oneOf("a", "bb", "ccc", "d", "ee", "key", "x9"))
      .flatMap(l => Gen.chooseNum(0, 12).map(n => l.take(n)))
    val widths = Gen.chooseNum(2, 6)
    check("shingle model", Prop.forAll(toks, widths) { (ts, w) =>
      val in = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.ShingleHashes.compute(in, w).toLongArray().toSeq
      got == model(ts, w)
    }, n = 300)
  }

  test("prefix length n - ceil(3n/10) + 1 stays in [1, n] and the integer form matches real ceil") {
    check("prefix bound", Prop.forAll(Gen.chooseNum(1, 10000)) { n =>
      val p = n - ((3 * n + 9) / 10) + 1
      val ceilRef = math.ceil(3.0 * n / 10.0).toInt // exact: 3n/10 has
      // an exact binary float form only when 3n%10==0, but double holds
      // 3n <= 30000 exactly, so the quotient rounds correctly here
      1 <= p && p <= n && ((3 * n + 9) / 10) == ceilRef
    }, n = 500)
  }

  // q142's completeness contract: the three-phase distributed skyline
  // (bucket prefix prune -> per-bucket local skyline -> global pass over
  // survivors) equals the O(n^2) dominance definition for ANY point set —
  // narrow coordinate ranges force heavy price/size ties, the case where
  // a sloppy strictness rule would drop or keep the wrong points.
  test("q142 skyline: three-phase prune equals brute-force dominance for any point set") {
    import spark.implicits._
    val ptsGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 12), Gen.chooseNum(0, 12))))
    check("skyline", Prop.forAll(ptsGen) { raw =>
      val pts = raw.map { case (p, sz) => (p.toDouble, sz) }
      val distinct = pts.distinct
      val brute = distinct.filter { case (p, sz) =>
        !distinct.exists { case (p2, s2) =>
          p2 <= p && s2 >= sz && (p2 < p || s2 > sz)
        }
      }.map { case (p, sz) => (p, sz, pts.count(_ == (p, sz)).toLong) }
      val df = pts.toDF("price", "sz")
        .groupBy("price", "sz").agg(count(lit(1)).as("n_parts"))
      val got = Relational.skylineOf(spark, df).collect()
        .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
      got.toSet == brute.toSet && got == got.sortBy(t => (t._1, t._2))
    }, n = 40)
  }
}
