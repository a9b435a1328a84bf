package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Semantic checks for the dedup/similarity operators beyond the oracle
  * hash-compare: recall of the synthesized near-duplicates and ranking
  * invariants of the top-k results.
  */
class DedupSimilaritySpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("q20: duplicate groups have exactly the synthesized multiplicity") {
    import spark.implicits._
    val out = Dedup.queries("q20_dedup_exact")(spark, dir).cache()
    val byCopies = out.groupBy("n_copies").count().as[(Long, Long)].collect().toMap
    assert(byCopies.keySet == Set(1L, 2L), s"unexpected multiplicities: $byCopies")
    // every doc_id % 3 == 0 doc was duplicated once
    val expectedDups = out.filter($"doc_id" % 3 === 0).count()
    assert(byCopies(2L) == expectedDups)
    out.unpersist()
  }

  test("q21: MinHash recovers nearly all synthesized near-dup pairs") {
    import spark.implicits._
    val out = Dedup.queries("q21_dedup_minhash")(spark, dir)
    val found = out.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 500L by 5L).map(d => (d, d + 10000L)).toSet
    val recall = expected.count(found).toDouble / expected.size
    assert(recall >= 0.9, s"MinHash recall $recall below 0.9")
  }

  test("q56: retained corpus has no exact duplicates and excludes near-dup mutants") {
    import spark.implicits._
    val out = Dedup.queries("q56_corpus_clean")(spark, dir).cache()
    // doc_ids unique and every near-dup pair (d, d+10000) keeps only d
    assert(out.count() == out.select("doc_id").distinct().count())
    val kept = out.select("doc_id").as[Long].collect().toSet
    val mutantsKept = kept.count(id => id >= 10000L && kept.contains(id - 10000L))
    // MinHash recall isn't exactly 1.0 — allow a small miss margin
    assert(mutantsKept <= 5, s"$mutantsKept near-dup mutants survived cleaning")
    out.unpersist()
  }

  test("q57: cluster labels are component minima and pair endpoints agree") {
    import spark.implicits._
    val clusters = Dedup.queries("q57_dup_clusters")(spark, dir).cache()
    val lbl = clusters.as[(Long, Long)].collect().toMap
    // label never exceeds the member id (min-label propagation invariant)
    assert(lbl.forall { case (id, c) => c <= id })
    // both endpoints of every scored pair carry the same cluster label
    val pairs = Dedup.queries("q21_dedup_minhash")(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => lbl(a) == lbl(b) },
      "a near-dup pair was split across clusters")
    clusters.unpersist()
  }

  test("q246: pair-counting agreement is consistent with q57's clusters") {
    import spark.implicits._
    val out = Dedup.queries("q246_cluster_agreement")(spark, dir).cache()
    assert(out.count() == 1)
    val r = out.first()
    val nDocs = r.getAs[Long]("n_docs")
    val pTotal = r.getAs[Long]("p_total")
    val pCc = r.getAs[Long]("pairs_cc")
    val pOp = r.getAs[Long]("pairs_onepass")
    val pBoth = r.getAs[Long]("pairs_both")
    assert(pTotal == nDocs * (nDocs - 1) / 2)
    // intersection pairs are bounded by both marginals, and one-pass
    // groups REFINE nothing coarser than CC clusters: every one-pass
    // group sits inside one CC cluster, so p_both == p_onepass exactly
    // (a doc and its smallest direct match are trivially connected)
    assert(pBoth <= pCc && pBoth <= pOp)
    assert(pBoth == pOp, "a one-pass group straddled two CC clusters")
    assert(r.getAs[Double]("pair_precision") == 1.0)
    // and the CC marginal independently matches q57's cluster sizes
    val cls = Dedup.queries("q57_dup_clusters")(spark, dir)
      .groupBy($"cluster").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")), sum($"c")).first()
    assert(pCc == cls.getLong(0))
    assert(nDocs == cls.getLong(1))
    // recall < 1 iff some cluster chains beyond direct matches;
    // either way the Rand identity must reconcile exactly
    val rand = r.getAs[Double]("rand_index")
    val expect = BigDecimal(pTotal - pCc - pOp + 2 * pBoth) / BigDecimal(pTotal)
    assert(math.abs(rand - expect.toDouble) < 1e-6)
    out.unpersist()
  }

  test("q249: mutual-kNN census is monotone in k and internally consistent") {
    import spark.implicits._
    val out = Similarity.queries("q249_mutual_knn")(spark, dir).cache()
    val rows = out.orderBy("k").collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 10L))
    val n = rows.head.getAs[Long]("n_nodes")
    assert(n > 10, "subset too small for a top-10 census")
    rows.sliding(2).foreach { case Array(p, c) =>
      // growing k only ADDS edges: mutual pairs and hub degree grow,
      // orphans shrink
      assert(p.getAs[Long]("n_mutual_pairs") <= c.getAs[Long]("n_mutual_pairs"))
      assert(p.getAs[Long]("max_indegree") <= c.getAs[Long]("max_indegree"))
      assert(p.getAs[Long]("n_orphans") >= c.getAs[Long]("n_orphans"))
    }
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val m = r.getAs[Long]("n_mutual_pairs")
      val rate = r.getAs[Double]("reciprocation_rate")
      // every node has a full k-list (n > 10), so directed = k*n exactly
      assert(m <= k * n / 2)
      assert(math.abs(rate - 2.0 * m / (k * n)) < 1e-5)
      assert(r.getAs[Long]("max_indegree") <= n - 1)
      assert(r.getAs[Long]("n_orphans") < n)
    }
    out.unpersist()
  }

  test("q267: cluster-size distribution reconciles with q57's labels") {
    import spark.implicits._
    val out = Dedup.queries("q267_cluster_sizes")(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every pair-graph node has >= 1 partner, so no singleton clusters
    assert(rows.forall(_.getAs[Long]("cluster_size") >= 2))
    rows.foreach(r => assert(r.getAs[Long]("n_docs") ==
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")))
    assert(math.abs(rows.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-4)
    // masses reconcile with q57 exactly
    val labels = Dedup.queries("q57_dup_clusters")(spark, dir).cache()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == labels.count())
    val szs = labels.groupBy($"cluster").agg(count(lit(1)).as("sz"))
      .groupBy($"sz").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(
      szs(r.getAs[Long]("cluster_size")) == r.getAs[Long]("n_clusters")))
    labels.unpersist(); out.unpersist()
  }

  test("q261: anisotropy census reconciles with direct moments") {
    import spark.implicits._
    val out = Similarity.queries("q261_anisotropy")(spark, dir).cache()
    val rows = out.orderBy("dim").collect()
    assert(rows.map(_.getAs[Long]("dim")).toSeq == (0L to 63L))
    // variance shares partition the total variance
    assert(math.abs(rows.map(_.getAs[Double]("var_share")).sum - 1.0) < 1e-4)
    val an = rows.map(_.getAs[Double]("anisotropy")).distinct
    assert(an.length == 1 && an.head >= 0.0 && an.head <= 1.0)
    // dim 0's mean/variance match Spark's own aggregates (population var)
    val d0 = graft.Tables.embeddings(spark, dir)
      .select(element_at($"embedding", 1).cast("double").as("x"))
    val m0 = d0.agg(avg($"x"), var_pop($"x")).first()
    assert(math.abs(rows.head.getAs[Double]("mean") - m0.getDouble(0)) < 1e-4)
    assert(math.abs(rows.head.getAs[Double]("variance") - m0.getDouble(1)) < 1e-4)
    out.unpersist()
  }

  test("q27: every synthesized embedding near-dup pair is found") {
    import spark.implicits._
    val out = Dedup.queries("q27_dedup_embed")(spark, dir)
    val pairs = out.select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 500L by 10L).map(d => (d, d + 10000L)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
    assert(out.agg(min("cosine")).first().getDouble(0) >= 0.9)
  }

  test("q22: ranks are contiguous and cosine is non-increasing per probe") {
    import spark.implicits._
    val out = Similarity.queries("q22_cosine_topk")(spark, dir).cache()
    val ranks = out.groupBy("probe_id").agg(
      collect_list(struct($"rank", $"cosine")).as("rc"))
    ranks.as[(Long, Seq[(Int, Double)])].collect().foreach { case (p, rc) =>
      val sorted = rc.sortBy(_._1)
      assert(sorted.map(_._1) == (1 to sorted.size), s"probe $p ranks not contiguous")
      assert(sorted.map(_._2).sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"probe $p cosine not monotone")
    }
    out.unpersist()
  }

  test("q28: ANN scores agree with brute-force cosine for the same pair") {
    import spark.implicits._
    val ann = Similarity.queries("q28_lsh_ann")(spark, dir)
      .select($"probe_id", $"neighbor_id", $"cosine".as("ann_cos"))
    // brute-force re-score of exactly those pairs
    val b = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", Det.toDoubleArr($"embedding").as("v"))
      .withColumn("nrm", Det.l2norm($"v"))
    val joined = ann
      .join(b.select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn")), Seq("probe_id"))
      .join(b.select($"vec_id".as("neighbor_id"), $"v".as("cv"), $"nrm".as("cn")), Seq("neighbor_id"))
      .withColumn("bf_cos", Num.roundAt(Det.dot($"pv", $"cv") / ($"pn" * $"cn"), 6))
    assert(joined.filter($"ann_cos" =!= $"bf_cos").count() == 0)
  }

  test("q93: PQ-ADC top-10 beats chance recall and picks closer-than-average neighbors") {
    import spark.implicits._
    val pq = Similarity.queries("q93_pq_ann")(spark, dir).cache()
    // contract shape: 5 probes × 10 non-negative, non-decreasing distances
    assert(pq.select("probe_id").distinct().count() == 5)
    assert(pq.filter($"adc_d2" < 0).count() == 0)
    val byProbe = pq.collect().groupBy(_.getAs[Long]("probe_id"))
    byProbe.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      assert(sorted.map(_.getAs[Double]("adc_d2")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
    }
    // Quality vs exact squared-L2. The codebook is untrained (first-16
    // subvectors; q61 is the k-means loop that would train it), and the
    // synthetic embeddings are noise-dominated per subspace, so perfect
    // recall is not the invariant — BEATING CHANCE decisively is:
    // random top-10 draws from 499 candidates recall ~0.02, and the
    // selected neighbors must be measurably closer than average.
    val b = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", Det.toDoubleArr($"embedding").as("v"))
    val probes = b.filter($"vec_id" >= 40 && $"vec_id" < 45)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val exact = b.crossJoin(probes).filter($"vec_id" =!= $"probe_id")
      .withColumn("d2",
        aggregate(zip_with($"pv", $"v", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, e) => acc + e)).cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"d2".asc, $"vec_id".asc)
    val exactTop = exact.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"probe_id", $"vec_id").collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val pqTop = byProbe.view
      .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exactTop.map { case (p, ex) =>
      (pqTop(p) & ex).size.toDouble / ex.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.1,
      s"mean recall@10 not above chance: $meanRecall (per-probe: $recalls)")
    // PQ-selected neighbors must sit in the near tail of the true
    // distance distribution: their mean exact d2 well under the
    // all-pairs mean
    val allMean = exact.agg(avg($"d2")).head().getDouble(0)
    val selMean = exact
      .join(pq.select($"probe_id", $"neighbor_id".as("vec_id")),
        Seq("probe_id", "vec_id"))
      .agg(avg($"d2")).head().getDouble(0)
    assert(selMean < 0.9 * allMean,
      s"PQ picks are not closer than average: selected $selMean vs corpus $allMean")
    exact.unpersist()
    pq.unpersist()
  }

  test("q282: MinHash AUC is a proper rank statistic over a two-class pair set") {
    val r = Dedup.queries("q282_minhash_auc")(spark, dir).first()
    val (np, npos, nneg) = (r.getAs[Long]("n_pairs"),
      r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    assert(np == npos + nneg)
    // the control-pair union must guarantee both classes are populated
    // (an empty class made the AUC denominator divide by zero in ANSI
    // mode — the round-12 bug the controls exist to prevent)
    assert(npos > 0 && nneg > 0, s"degenerate classes: $npos/$nneg")
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 2e-6)
    // planted near-dups vs random controls are separable: the estimator
    // must rank them far better than chance
    assert(auc > 0.9, s"signature ranking collapsed: auc=$auc")
  }

  test("q281: margins and agreements are bounded; probes reconcile") {
    import spark.implicits._
    val rows = Similarity.queries("q281_margin_census")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_margin") >= -2.0 &&
        r.getAs[Double]("mean_margin") <= 2.0)
      val fp = r.getAs[Double]("frac_margin_pos")
      val ka = r.getAs[Double]("knn5_label_agree")
      assert(fp >= 0.0 && fp <= 1.0 && ka >= 0.0 && ka <= 1.0)
    }
    // every census probe is a real probe id; none counted twice
    val nProbes = rows.map(_.getAs[Long]("n_probes")).sum
    val eligible = graft.Tables.embeddings(spark, dir)
      .filter($"vec_id" % 20 === 0).count()
    assert(nProbes <= eligible, s"$nProbes probes vs $eligible eligible")
  }

  test("q128: prefix filter is lossless — identical to the brute-force all-pairs join") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Dedup.queries("q128_simjoin_prefix")(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // brute force over the same mutated corpus and w=4 shingle sets
    val d = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = d.unionAll(
      d.filter($"doc_id" % 5 === 0).select(($"doc_id" + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val ng = corpus.select($"doc_id",
      expr("shingle_hashes(split(text, ' '), 4)").as("ng"))
    val brute = ng.as("a").crossJoin(ng.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .withColumn("inter", expr("sorted_overlap(a.ng, b.ng)"))
      .filter(lit(13L) * $"inter" >=
        lit(3L) * (size($"a.ng") + size($"b.ng")).cast("long"))
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    assert(out == brute,
      s"prefix join diverged from brute force: missing ${brute -- out}, extra ${out -- brute}")
    assert(out.nonEmpty, "degenerate test: no similar pairs at sf0.001")
  }

  test("q185: containment prefix filter is lossless — identical to brute-force all-pairs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Dedup.queries("q185_containment_join")(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val d = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = d.unionAll(
      d.filter($"doc_id" % 5 === 0).select(($"doc_id" + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val ng = corpus.select($"doc_id",
      expr("shingle_hashes(split(text, ' '), 4)").as("ng"))
    // DIRECTED brute force: every ordered pair a != b with C(a->b) >= 0.9
    val brute = ng.as("a").crossJoin(ng.as("b"))
      .filter($"a.doc_id" =!= $"b.doc_id")
      .withColumn("inter", expr("sorted_overlap(a.ng, b.ng)"))
      .filter(lit(10L) * $"inter" >= lit(9L) * size($"a.ng").cast("long"))
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet
    assert(out == brute,
      s"containment join diverged: missing ${brute -- out}, extra ${out -- brute}")
    assert(out.nonEmpty, "degenerate test: no contained docs at sf0.001")
    // asymmetry is real on this corpus: some directed pair's reverse is
    // absent (the short-in-long case Jaccard cannot express)
    assert(out.exists { case (a, b) => !out.contains((b, a)) } || out.isEmpty)
  }

  test("shingle_hashes width: w=2 default unchanged; wider widths shrink df saturation") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val t = Seq("a b c d e").toDF("text")
      .select(expr("shingle_hashes(split(text, ' '))").as("w2"),
        expr("shingle_hashes(split(text, ' '), 2)").as("w2x"),
        expr("shingle_hashes(split(text, ' '), 4)").as("w4"),
        expr("shingle_hashes(split(text, ' '), 5)").as("w5"))
      .head()
    assert(t.getSeq[Long](0) == t.getSeq[Long](1), "explicit w=2 must equal default")
    assert(t.getSeq[Long](2).length == 2, "5 tokens at w=4 -> 2 shingles")
    assert(t.getSeq[Long](3).length == 1, "5 tokens at w=5 -> 1 shingle")
    // fewer than w tokens: single whole-text hash fallback
    val short = Seq("a b").toDF("text")
      .select(expr("shingle_hashes(split(text, ' '), 4)").as("s")).head()
    assert(short.getSeq[Long](0).length == 1)
  }

  test("q147: the tau=0.5 prefix-filter ground truth is lossless vs brute-force all-pairs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"lang", $"text")
    val corpus = docs.unionAll(
      docs.filter($"doc_id" % 5 === 0).select(($"doc_id" + 10000).as("doc_id"),
        $"lang", expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val got = Dedup.exactTrigramPairs(spark, corpus)
      .as[(Long, Long)].collect().toSet
    // brute force: every pair, exact trigram Jaccard >= 1/2 in integers
    val sets = corpus
      .select($"doc_id", expr("shingle_hashes(split(text, ' '), 3)").as("ng"))
      .as[(Long, Seq[Long])].collect()
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = sa.toSet.intersect(sb.toSet).size
      if 3L * inter >= sa.size + sb.size
    } yield (a, b)).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain true near-dup pairs")
  }

  test("q146: IVF recall is exactly 1.0 at nprobe=8 (all cells == brute force) and nprobe-monotone") {
    import spark.implicits._
    // searching every cell makes the IVF candidate set the whole corpus;
    // identical cosines + cand_id tie-break mean the top-10 sets must be
    // EQUAL, not just close — any recall < 1 here is a candidate-
    // generation bug, not an approximation artifact
    val full = Similarity.annRecallAt(spark, dir, nprobe = 8)
      .select($"probe_id", $"n_exact", $"n_hit", $"recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(full.nonEmpty && full.forall(r => r._2 == 10 && r._3 == 10 && r._4 == 1.0),
      s"nprobe=8 recall must be exactly 1: ${full.filter(_._4 != 1.0).toSeq}")
    // widening the search can only add candidates -> per-probe recall is
    // monotone in nprobe
    val narrow = Similarity.annRecallAt(spark, dir, nprobe = 2)
      .select($"probe_id", $"recall").as[(Long, Double)].collect().toMap
    assert(narrow.keySet == full.map(_._1).toSet)
    assert(narrow.values.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("q146 harness drives index quality: k-means-trained codebook beats the naive seeds") {
    import spark.implicits._
    // the evaluation operator's whole point: swap the index codebook,
    // re-measure recall@10 at the SAME nprobe, keep the better index.
    // Everything is deterministic (fixed seeds, exact fold_dot argmins),
    // so the measured lift is a stable contract, not a flaky bound —
    // measured 0.405 -> 0.465 at sf0.001 (and 0.405 -> 0.55 at sf0.01
    // with 5 iterations).
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg($"recall")).head().getDouble(0)
    val naive = mean(Similarity.annRecallAt(spark, dir, nprobe = 2))
    val trained = mean(Similarity.annRecallAt(spark, dir, nprobe = 2,
      Some(Similarity.trainCodebook(spark, dir, iters = 3))))
    assert(trained > naive,
      s"Lloyd-trained codebook must improve recall: trained=$trained naive=$naive")
  }

  test("q165: multi-index Hamming search is complete - identical to brute force") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val out = Dedup.queries("q165_hamming_search")(spark, dir).cache()
    // every probe is a <=3-bit mutant of its source doc's fingerprint, so
    // the source itself must always be returned
    val probes = out.select($"probe_id").distinct().count()
    val selfHits = out.filter($"doc_id" === $"probe_id" - 50000).count()
    assert(probes > 0 && selfHits == probes,
      s"planted source missing: $selfHits of $probes probes found their doc")
    assert(out.filter($"hamming" > 5).count() == 0)
    // pigeonhole completeness: 6 disjoint bands, radius 5 -> the banded
    // join must return EXACTLY the brute-force result set
    val sigs = graft.Tables.documents(spark, dir)
      .withColumn("simhash", expr("simhash_sig(split(text, ' '))"))
      .select($"doc_id", $"simhash")
    val ps = sigs.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 50000L).as("probe_id"),
        expr("""simhash ^ aggregate(sequence(0, 2), 0L,
              (acc, j) -> acc ^ shiftleft(1L, cast((doc_id * 7 + j * 13) % 60 as int)))""")
          .as("psig"))
    val brute = ps.crossJoin(sigs)
      .select($"probe_id", $"doc_id",
        expr("bit_count(psig ^ simhash)").cast("int").as("hamming"))
      .filter($"hamming" <= 5)
    val bruteSet = brute.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bandedSet = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(bandedSet == bruteSet,
      s"banded != brute: missing=${(bruteSet -- bandedSet).take(3)} " +
        s"extra=${(bandedSet -- bruteSet).take(3)}")
    out.unpersist()
  }

  test("q169: doc-level split leaks near-dup pairs; cluster-atomic split leaks none") {
    import spark.implicits._
    val census = Dedup.queries("q169_split_leakage")(spark, dir).cache()
    // the synthesized corpus HAS cross-split near-dup pairs — the trap
    // is real, not vacuous
    assert(census.filter($"cross_split").agg(sum($"n_pairs")).as[Long].head() > 0,
      "no leakage measured — census cannot demonstrate the trap")
    // THE FIX: hash the duplicate CLUSTER label instead of the doc —
    // both endpoints of every near-dup pair share a cluster, so their
    // split is identical by construction; verify against the same pairs
    val labels = Dedup.queries("q57_dup_clusters")(spark, dir)
      .select($"doc_id", $"cluster")
    val M = 2147483647L
    def splitOf(c: org.apache.spark.sql.Column) = {
      val h = c % M * 16807L % M * 48271L % M
      when(h % 100 < 80, "train").when(h % 100 < 90, "val").otherwise("test")
    }
    val clusterSplit = labels.select($"doc_id", splitOf($"cluster").as("split"))
    // non-vacuous via the pair->cluster property: every q21 near-dup
    // pair's endpoints must resolve to the SAME cluster-derived split
    val pairs = Dedup.queries("q21_dedup_minhash")(spark, dir)
      .select($"doc_a", $"doc_b")
    val crossAfter = pairs
      .join(clusterSplit.toDF("doc_a", "split_a"), Seq("doc_a"))
      .join(clusterSplit.toDF("doc_b", "split_b"), Seq("doc_b"))
      .filter($"split_a" =!= $"split_b").count()
    assert(crossAfter == 0, s"cluster-atomic split still leaks $crossAfter pairs")
    census.unpersist()
  }

  test("q171: planted copies are flagged against their source; negated arrivals stay clean") {
    import spark.implicits._
    val out = Similarity.queries("q171_incremental_semdedup")(spark, dir).cache()
    val copies = out.filter($"arrival_id" < 200000L)
    // an exact copy lands in its source's cell (identical vector ->
    // identical argmax), so the source is always among the candidates
    // and best_cos is exactly 1.0
    assert(copies.count() > 0)
    assert(copies.filter(!$"is_dup").count() == 0)
    assert(copies.filter($"best_match" =!= $"arrival_id" - 100000L).count() == 0)
    assert(copies.filter($"best_cos" =!= 1.0).count() == 0)
    // negated vectors anti-correlate with their source; none may flag
    val fresh = out.filter($"arrival_id" >= 200000L)
    assert(fresh.count() > 0)
    assert(fresh.filter($"is_dup").count() == 0)
    out.unpersist()
  }

  test("q172: multi-probe dominates single-probe per probe and lifts total recall") {
    import spark.implicits._
    val out = Similarity.queries("q172_multiprobe_lsh")(spark, dir).cache()
    assert(out.count() == 20)
    // the single-probe bucket key set is a subset of the multi-probe
    // set, so candidates and hits can only grow — per probe, guaranteed
    assert(out.filter($"n_cand_multi" < $"n_cand_single").count() == 0)
    assert(out.filter($"n_hit_multi" < $"n_hit_single").count() == 0)
    assert(out.filter($"recall_multi" < $"recall_single").count() == 0)
    // and on this corpus the lift is real, not vacuous
    val (hs, hm) = (out.agg(sum($"n_hit_single")).as[Long].head(),
      out.agg(sum($"n_hit_multi")).as[Long].head())
    assert(hm > hs, s"multi-probe found no additional true neighbors: $hs vs $hm")
    out.unpersist()
  }

  test("q173: int8 quantization distorts direction only marginally, never inverts it") {
    import spark.implicits._
    val out = Similarity.queries("q173_quantization_error")(spark, dir).cache()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(out.agg(sum($"n_vecs")).as[Long].head() == nVecs)
    // max-abs int8 keeps every element within one quantization step of
    // itself, so the dequantized vector stays tightly aligned: cosine
    // well above 0.99 and bounded by 1, worst per-element error < the
    // step of a unit-scale vector
    assert(out.filter($"mean_cos_after_quant" <= 0.99 ||
      $"mean_cos_after_quant" > 1.0).count() == 0)
    assert(out.filter($"worst_abs_err" < 0.0).count() == 0)
    val worst = out.agg(max($"worst_abs_err")).as[Double].head()
    assert(worst < 1.0 / 64, s"per-element quant error too large: $worst")
    out.unpersist()
  }

  test("q174: content-defined chunks re-align after a prefix edit (shift invariance)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // recompute the per-doc chunk digest sets with the query's boundary
    // rule, then measure how many mutant pairs (d, d+10000: first token
    // dropped) share chunks — fixed windows would share none at the
    // chunk level because every window shifts by one token
    val d = graft.Tables.documents(spark, dir).select($"doc_id", $"lang", $"text")
    val corpus = d.unionAll(
      d.filter($"doc_id" % 5 === 0).select(
        ($"doc_id" + 10000).as("doc_id"), $"lang",
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val chunks = corpus
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", expr(
        """array_distinct(concat(
          |  filter(sequence(4, greatest(size(toks), 4)), i ->
          |    i <= size(toks) AND
          |    cast(conv(substring(md5(concat_ws(' ', slice(toks, i - 3, 4))), 1, 7), 16, 10) as bigint) % 16 = 0),
          |  array(size(toks))))""".stripMargin).as("bs"))
      .select($"doc_id", $"toks", $"bs", posexplode($"bs").as(Seq("j", "b")))
      .withColumn("start",
        coalesce(when($"j" > 0, element_at($"bs", $"j")), lit(0)) + 1)
      .filter($"b" >= $"start")
      .select($"doc_id",
        md5(concat_ws(" ", slice($"toks", $"start", $"b" - $"start" + 1)))
          .as("digest"))
    val mutantIds = corpus.filter($"doc_id" >= 10000).select($"doc_id")
    val shared = chunks.filter($"doc_id" >= 10000)
      .select(($"doc_id" - 10000).as("src_id"), $"digest")
      .join(chunks.toDF("src_id", "digest"), Seq("src_id", "digest"))
      .select($"src_id").distinct().count()
    val nMutants = mutantIds.count()
    assert(nMutants > 0)
    assert(shared.toDouble / nMutants > 0.5,
      s"only $shared of $nMutants mutants share any chunk with their source")
  }

  test("q177: calibration buckets are self-consistent and expose the candidate bias") {
    import spark.implicits._
    val out = Dedup.queries("q177_minhash_calibration")(spark, dir).cache()
    assert(out.count() > 0)
    // definitional: a bucket's mean estimate lies inside the bucket
    assert(out.filter($"mean_est" < $"bucket" / 10.0 ||
      $"mean_est" > ($"bucket" + 1) / 10.0).count() == 0)
    assert(out.filter($"mean_abs_err" < 0.0).count() == 0)
    // the top bucket holds the planted near-dups: est tracks exact there
    val top = out.orderBy($"bucket".desc).head()
    assert(top.getAs[Int]("bucket") == 9)
    assert(top.getAs[Double]("mean_abs_err") < 0.3,
      s"top-bucket calibration off: $top")
    // and the readout is not vacuous: mid buckets (band-collision
    // candidates) OVER-estimate — the bias that justifies exact
    // verification of LSH candidates
    val biased = out.filter($"bucket" < 9 &&
      $"mean_est" - $"mean_exact" > 0.1).count()
    assert(biased > 0, "no candidate-conditioned bias measured")
    out.unpersist()
  }

  test("q178: band geometries are nested - candidates and recall rise with band count") {
    import spark.implicits._
    val out = Dedup.queries("q178_lsh_scurve")(spark, dir).cache()
    val rows = out.orderBy("bands").collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((8, 8), (16, 4), (32, 2)))
    assert(rows.map(_.getLong(4)).distinct.length == 1, "planted count must agree")
    // theorem: a wider band matching implies both its halves match, so
    // candidate sets NEST as bands double - volumes and hits can only grow
    val cands = rows.map(_.getLong(2)).toSeq
    val hits = rows.map(_.getLong(3)).toSeq
    assert(cands == cands.sorted, s"candidate volumes not monotone: $cands")
    assert(hits == hits.sorted, s"hits not monotone: $hits")
    assert(out.filter($"recall" < 0.0 || $"recall" > 1.0).count() == 0)
    out.unpersist()
  }

  test("q219: b-bit estimator error shrinks toward the full-width baseline") {
    import spark.implicits._
    val out = Dedup.queries("q219_bbit_minhash")(spark, dir).cache()
    val rows = out.orderBy("b").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 64))
    // one pair universe shared across widths
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length == 1)
    assert(rows.map(_.getAs[Double]("mean_exact")).distinct.length == 1)
    // compression costs accuracy: the 1-bit estimator cannot beat the
    // full-width baseline, and errors stay sane fractions
    val errs = rows.map(_.getAs[Double]("mean_abs_err"))
    assert(errs.head >= errs.last - 1e-9,
      s"b=1 error ${errs.head} below full-width ${errs.last}")
    assert(errs.forall(e => e >= 0.0 && e < 0.5))
    // estimates stay in the corrected-estimator range
    rows.foreach(r => assert(r.getAs[Double]("mean_est") >= -0.1 &&
      r.getAs[Double]("mean_est") <= 1.0 + 1e-9))
    out.unpersist()
  }

  test("q216: re-crawl waves always lose to the original snapshot") {
    import spark.implicits._
    val out = Dedup.queries("q216_dedup_flow")(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // min-id survivorship: the planted waves carry offset ids, so the
    // original sources can never appear as losers to the waves
    rows.foreach { r =>
      assert(r.getAs[String]("winner_source") != "recrawl" &&
        r.getAs[String]("winner_source") != "mirror",
        s"wave won a group: $r")
      assert(r.getAs[Long]("n_lost") > 0)
      val p = r.getAs[Double]("pct_of_loser")
      assert(p > 0.0 && p <= 1.0)
    }
    // every planted recrawl doc is an exact copy, so the recrawl wave's
    // losses total exactly its size
    val base = graft.Tables.documents(spark, dir)
    val nRecrawl = base.filter($"doc_id" % 3 === 0).count()
    val lostRecrawl = rows.filter(_.getAs[String]("loser_source") == "recrawl")
      .map(_.getAs[Long]("n_lost")).sum
    assert(lostRecrawl == nRecrawl,
      s"recrawl losses $lostRecrawl != wave size $nRecrawl")
    out.unpersist()
  }

  test("q212: chunk token accounting is lossless and dedup never inflates") {
    import spark.implicits._
    val out = Dedup.queries("q212_chunk_dedup_ratio")(spark, dir).cache()
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("stored_tokens") <= r.getAs[Long]("total_tokens"))
      val ratio = r.getAs[Double]("dedup_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    // every token of every doc lands in exactly one chunk: band token
    // mass sums to the corpus token count
    val total = rows.map(_.getAs[Long]("total_tokens")).sum
    val docs = graft.Tables.documents(spark, dir)
    val corpusTokens = docs.select(size(split($"text", " ")).as("n"))
      .agg(sum($"n")).first().getLong(0) +
      docs.filter($"doc_id" % 5 === 0)
        .select((size(split($"text", " ")) - 1).as("n"))
        .agg(sum($"n")).first().getLong(0)
    assert(total == corpusTokens,
      s"chunk mass $total != corpus tokens $corpusTokens")
    out.unpersist()
  }

  test("q209: threshold sweep is monotone and each band has its own population") {
    import spark.implicits._
    val out = Dedup.queries("q209_threshold_sweep")(spark, dir).cache()
    val rows = out.orderBy("threshold").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("0.3", "0.5", "0.7", "0.9"))
    // a stricter cutoff can only remove pairs and drop fewer docs
    val pairs = rows.map(_.getAs[Long]("n_pairs")).toSeq
    val dropped = rows.map(_.getAs[Long]("n_dropped")).toSeq
    assert(pairs == pairs.sorted.reverse, s"pairs not antitone: $pairs")
    assert(dropped == dropped.sorted.reverse, s"dropped not antitone: $dropped")
    // the graded 90/70/50% prefix populations separate the bands: every
    // step of the sweep must actually lose pairs
    pairs.sliding(2).foreach { case Seq(a, b) =>
      assert(a > b, s"sweep step lost no pairs: $pairs")
    }
    // retention accounting
    rows.foreach { r =>
      val expect = (r.getAs[Long]("n_docs") - r.getAs[Long]("n_dropped"))
        .toDouble / r.getAs[Long]("n_docs")
      assert(math.abs(r.getAs[Double]("retention") - expect) < 1e-6)
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_pairs"))
    }
    out.unpersist()
  }

  test("q225: blocking families share one truth set; SNM row reconciles with q199 w=5") {
    import spark.implicits._
    val out = Dedup.queries("q225_blocking_compare")(spark, dir).cache()
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("feature_block", "minhash_lsh", "snm_w5"))
    val nQ = graft.Tables.part(spark, dir).filter($"p_partkey" % 20 === 0).count()
    val nP = graft.Tables.part(spark, dir).count()
    rows.values.foreach { r =>
      assert(r.getLong(3) == nQ, "n_probes must be the probe population")
      assert(r.getLong(2) <= r.getLong(3), "matched probes cannot exceed probes")
      assert(r.getLong(1) <= nQ * nP, "candidates cannot exceed the cross product")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    // the discrete key was DESIGNED around this error class (token 2,
    // first char, length +/-1 all survive the dropped 3rd char), so its
    // completeness must dominate both assumption-free families
    assert(rows("feature_block").getDouble(4) >= rows("snm_w5").getDouble(4))
    assert(rows("feature_block").getDouble(4) >= rows("minhash_lsh").getDouble(4))
    // cross-query reconciliation: q225's snm_w5 row is q199's w=5 row
    // after pair-dedup — distinct candidates can only shrink the count,
    // and the matched-probe census is dedup-invariant
    val q199w5 = Dedup.queries("q199_sorted_neighborhood")(spark, dir)
      .filter($"w" === 5).collect().head
    assert(rows("snm_w5").getLong(1) <= q199w5.getLong(1),
      "distinct SNM pairs cannot exceed q199's raw w=5 volume")
    assert(rows("snm_w5").getLong(2) == q199w5.getLong(2),
      "pair-dedup must not change which probes are matched")
    out.unpersist()
  }

  test("q199: SNM candidates nest with w - completeness and volume are monotone") {
    import spark.implicits._
    val out = Dedup.queries("q199_sorted_neighborhood")(spark, dir).cache()
    val rows = out.orderBy("w").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 5, 10))
    // window-w candidates are a superset of window-(w-1) candidates, so
    // both candidate volume and matched-probe count can only grow
    val cand = rows.map(_.getLong(1)).toSeq
    val found = rows.map(_.getLong(2)).toSeq
    assert(cand == cand.sorted, s"candidate volume not monotone: $cand")
    assert(found == found.sorted, s"completeness not monotone: $found")
    // linear candidate bound: n·w candidates at most (each record emits
    // at most w cross-kind neighbors)
    val nAll = graft.Tables.part(spark, dir).count() +
      graft.Tables.part(spark, dir).filter($"p_partkey" % 20 === 0).count()
    rows.foreach { r =>
      assert(r.getLong(1) <= nAll * r.getInt(0),
        s"w=${r.getInt(0)}: ${r.getLong(1)} candidates exceed linear bound")
    }
    assert(out.filter($"completeness" < 0.0 || $"completeness" > 1.0).count() == 0)
    assert(out.filter($"reduction_ratio" < 0.9).count() == 0,
      "SNM must prune at least 90% of the cross product")
    out.unpersist()
  }

  test("q197: hard-negative census agrees with a brute-force window recompute") {
    import spark.implicits._
    val out = Similarity.queries("q197_hard_negatives")(spark, dir).cache()
    // one census row per probe label; probe ids < 30 cover their labels
    val probeLabels = graft.Tables.embeddings(spark, dir)
      .filter($"vec_id" < 30).select($"label").distinct().count()
    assert(out.count() == probeLabels)
    assert(out.agg(sum($"n_probes")).first().getLong(0) == 30)
    // cosines are bounded and violations never exceed the probe count
    assert(out.filter($"mean_hard_neg_cos" > 1.0 ||
      $"mean_nearest_pos_cos" > 1.0).count() == 0)
    assert(out.filter($"n_violations" > $"n_probes" ||
      $"n_violations" < 0).count() == 0)
    // independent recompute of the violation count: rank ALL neighbors
    // per probe by cosine; a violation is a probe whose global top-1
    // neighbor (excluding itself) carries a different label
    val b = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", Det.toDoubleArr($"embedding").as("v"))
      .withColumn("nrm", Det.l2norm($"v"))
    val probes = b.filter($"vec_id" < 30)
      .select($"vec_id".as("probe_id"), $"label".as("plabel"),
        $"v".as("pv"), $"nrm".as("pn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)
    val viol = b.crossJoin(probes).filter($"vec_id" =!= $"probe_id")
      .withColumn("cos", Det.dot($"pv", $"v") / ($"pn" * $"nrm"))
      .withColumn("r", row_number().over(w)).filter($"r" === 1)
      .filter($"label" =!= $"plabel")
      .groupBy($"plabel".as("label")).agg(count(lit(1)).as("nv"))
    val joined = out.join(viol, Seq("label"), "left")
      .select($"label", $"n_violations",
        coalesce($"nv", lit(0L)).as("nv")).collect()
    joined.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"label ${r.get(0)}: census=${r.getLong(1)} recompute=${r.getLong(2)}")
    }
    out.unpersist()
  }

  test("q215: full-width recall is exactly 1 and recall grows with the budget") {
    import spark.implicits._
    val out = Similarity.queries("q215_matryoshka_recall")(spark, dir).cache()
    val rows = out.orderBy("dim_budget").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(16, 32, 64))
    // the 64-dim ranking IS the ground truth, so its recall is exactly 1
    val full = rows.last
    assert(full.getAs[Double]("mean_recall_at10") == 1.0)
    assert(full.getAs[Long]("n_hits") == 10 * full.getAs[Long]("n_probes"))
    // monotone in width on this data (prefix information only grows)
    val recalls = rows.map(_.getAs[Double]("mean_recall_at10")).toSeq
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(rows.forall(r => r.getAs[Long]("n_probes") == 20L))
    assert(rows.forall(r => r.getAs[Double]("mean_recall_at10") >= 0.0 &&
      r.getAs[Double]("mean_recall_at10") <= 1.0))
    out.unpersist()
  }

  test("q198: ANOVA identity - between + within recovers the total sum of squares") {
    import spark.implicits._
    val out = Similarity.queries("q198_class_separability")(spark, dir).cache()
    assert(out.count() == 64)
    assert(out.filter($"n_classes" =!= 10L).count() == 0)
    // SSW > 0 on real data, and SSB >= 0 follows from the decomposition
    assert(out.filter($"ss_within" <= 0.0).count() == 0)
    assert(out.filter($"ss_between" < 0.0).count() == 0)
    // independent total-SS recompute per dim on the same quantized values
    val tot = graft.Tables.embeddings(spark, dir)
      .select(posexplode(Det.toDoubleArr($"embedding")).as(Seq("dim", "x")))
      .select($"dim", floor($"x" * 10000.0).cast("long").as("q"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"), sum($"q").as("s1"), sum($"q" * $"q").as("s2"))
      .select($"dim", (($"s2".cast("double") -
        $"s1".cast("double") * $"s1".cast("double") / $"n".cast("double"))
        / 1e8).as("sst"))
    val joined = out.join(tot, Seq("dim")).collect()
    joined.foreach { r =>
      val sum2 = r.getAs[Double]("ss_between") + r.getAs[Double]("ss_within")
      val sst = r.getAs[Double]("sst")
      assert(math.abs(sum2 - sst) < 1e-4,
        s"dim ${r.get(0)}: ssb+ssw=$sum2 vs sst=$sst")
    }
    out.unpersist()
  }

  test("q164: exact re-rank of the ADC shortlist never loses recall vs ADC-only") {
    import spark.implicits._
    val rr = Similarity.queries("q164_rerank_ann")(spark, dir).cache()
    // contract shape: 5 probes × 5 rows, final order by exact d2, every
    // candidate drawn from the ADC top-20 shortlist
    assert(rr.count() == 25)
    assert(rr.filter($"adc_rank" > 20 || $"adc_rank" < 1).count() == 0)
    rr.collect().groupBy(_.getAs[Long]("probe_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      assert(sorted.map(_.getAs[Double]("d2")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
    }
    // exact ground truth: within-shortlist members of the global top-5
    // are ALWAYS selected by the re-rank (at most 5 fit), so re-rank
    // recall@5 >= ADC-only recall@5 — the guarantee the stage exists for
    val b = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", Det.toDoubleArr($"embedding").as("v"))
    val probes = b.filter($"vec_id" >= 40 && $"vec_id" < 45)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"d2".asc, $"vec_id".asc)
    val exactTop5 = b.crossJoin(probes).filter($"vec_id" =!= $"probe_id")
      .withColumn("d2",
        aggregate(zip_with($"pv", $"v", (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, e) => acc + e))
      .withColumn("r", row_number().over(w)).filter($"r" <= 5)
      .select($"probe_id", $"vec_id")
    val adcTop5 = Similarity.queries("q93_pq_ann")(spark, dir)
      .filter($"rank" <= 5)
      .select($"probe_id", $"neighbor_id".as("vec_id"))
    val rrTop5 = rr.select($"probe_id", $"neighbor_id".as("vec_id"))
    val rrHits = exactTop5.join(rrTop5, Seq("probe_id", "vec_id")).count()
    val adcHits = exactTop5.join(adcTop5, Seq("probe_id", "vec_id")).count()
    assert(rrHits >= adcHits,
      s"re-rank lost recall: rerank=$rrHits adc=$adcHits")
    rr.unpersist()
  }

  test("q324: adversarial mutation evades coarse bands; fine bands resist") {
    import spark.implicits._
    val out = Dedup.queries("q324_adversarial_banding")(spark, dir)
      .select($"mutation_class", $"bands", $"recall", $"mean_jaccard")
      .as[(String, Long, Double, Double)].collect()
    val rec = out.map { case (c, b, r, _) => (c, b) -> r }.toMap
    val jac = out.map { case (c, _, _, j) => c -> j }.toMap
    // the adversary works: uniform token replacement drives exact
    // Jaccard far below the benign class while touching 1/8 of tokens
    assert(jac("2_adversarial") < 0.6 && jac("1_benign") > 0.9,
      s"mutation classes not separated: $jac")
    // geometry sensitivity on the SAME signatures: more, narrower bands
    // recover the adversarial pairs; fewer, wider bands go blind
    assert(rec(("2_adversarial", 32L)) >= rec(("2_adversarial", 16L)) &&
      rec(("2_adversarial", 16L)) >= rec(("2_adversarial", 8L)),
      s"recall not monotone in band count: $rec")
    assert(rec(("2_adversarial", 32L)) - rec(("2_adversarial", 8L)) >= 0.5,
      s"geometry sweep shows no sensitivity: $rec")
    // benign mutations are caught by every geometry — the blind spot is
    // SPECIFIC to the adversarial class, not a general recall failure
    Seq(8L, 16L, 32L).foreach(b =>
      assert(rec(("1_benign", b)) >= 0.95, s"benign recall low at b=$b: $rec"))
  }
}
