package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension; the reference has no vector surface).
  *
  * Two variants, per the standard scale ladder:
  *   - q22: brute-force cosine top-k — the correctness baseline. Probes
  *     broadcast (tiny side), the candidate table is scanned exactly
  *     once, scoring is a codegen'd left-fold over the arrays, and only
  *     scored (probe, candidate) rows — |probes| × n of them, the
  *     irreducible brute-force cost — reach the top-k window.
  *   - q28: LSH-bucketed ANN — the 100 TB path. Random-hyperplane
  *     sign buckets (4 tables × 6 bits) computed per row in one pass;
  *     candidate generation is an equi-join on (table, bucket), so the
  *     per-probe work drops from n to the occupancy of 4 buckets. Bits
  *     per table scale with log(n); hyperplane weights derive from
  *     integer Knuth hashing (Det) so both engines see identical planes.
  */
object Similarity {
  import Det._

  /** Repartitioned before the per-vector compute (norms, LSH buckets):
    * the embeddings table is one parquet file = one input split, which
    * would serialize the 2k-mult-per-row bucket computation on a single
    * core (see Dedup.mutatedDocs for the same principle).
    */
  private def base(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
  }

  // ---------------------------------------------------------------------
  // q281: metric-learning margin census — the label-aware twin of
  // q160's centroid purity: per probe (a deterministic 5% of vectors),
  // the cosine MARGIN between its nearest same-label and nearest
  // other-label neighbor, plus its top-5 label agreement — the
  // triplet-loss readout (is each point closer to its own class than
  // to the nearest impostor?) that decides whether labels can seed
  // hard-negative mining or need cleaning first (Confident Learning's
  // kNN-agreement signal is the same number). Per-probe margins FREEZE
  // to micro-units (the one place IEEE cosines meet a cross-row sum),
  // so the per-label census is exact integers; probes whose label has
  // no other member (or that see only one class) are excluded on both
  // engines. Scale shape: one probe-broadcast brute scan (q22's
  // pattern; at data scale swap in the q28/q49 candidate generators,
  // same census) + one probe-partitioned ranking window + a
  // |labels|-row census.
  private def marginCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val all = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
    val probes = all.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("probe_id"), $"label".as("plabel"),
        $"v".as("pv"), $"nrm".as("pn"))
    val w = Window.partitionBy($"probe_id")
      .orderBy($"cos".desc, $"vec_id".asc)
    val per = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("same", $"label" === $"plabel")
      .withColumn("rank", row_number().over(w))
      .groupBy($"probe_id", $"plabel")
      .agg(max(when($"same", $"cos")).as("bs"),
        max(when(!$"same", $"cos")).as("bd"),
        sum(when($"rank" <= 5 && $"same", 1L).otherwise(0L)).as("k5"))
      .filter($"bs".isNotNull && $"bd".isNotNull)
      .withColumn("m_micro",
        floor(($"bs" - $"bd") * lit(1000000.0)).cast(LongType))
    per.groupBy($"plabel".as("label"))
      .agg(count(lit(1)).as("n_probes"), sum($"m_micro").as("sm"),
        sum(when($"m_micro" >= 0L, 1L).otherwise(0L)).as("npos"),
        sum($"k5").as("sk5"))
      .select($"label", $"n_probes",
        Num.roundAt($"sm".cast(DoubleType) /
          ($"n_probes".cast(DoubleType) * lit(1000000.0)), 6)
          .as("mean_margin"),
        Num.roundAt($"npos".cast(DoubleType) /
          $"n_probes".cast(DoubleType), 6).as("frac_margin_pos"),
        Num.roundAt($"sk5".cast(DoubleType) /
          ($"n_probes".cast(DoubleType) * lit(5.0)), 6)
          .as("knn5_label_agree"))
      .orderBy($"label")
  }

  // q22: brute-force cosine top-5 for probes vec_id < 20.
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = base(s, dir)
    val probes = all.select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"))
      .filter($"probe_id" < 20)
    val scored = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"probe_id", $"vec_id".as("neighbor_id"), $"rank",
        Num.roundAt($"cos", 6).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  // ---------------------------------------------------------------------
  // q249: mutual-kNN census — the embedding-geometry health check the
  // retrieval evals (q146/q196) take as given: in a well-shaped space
  // most nearest-neighbor edges are RECIPROCATED; heavy hubness (a few
  // vectors appearing in everyone's top-k while many appear in no
  // one's) is the classic high-dimensional failure that silently
  // degrades both semantic dedup (q113) and kNN retrieval. Over a
  // deterministic quarter of the corpus (vec_id % 4 — bounded by
  // DESIGN; at data scale swap the quadratic subset join for the
  // q28/q49 candidate generators, same downstream census), exact
  // top-10 lists feed one reverse-edge self-join, and the census reads
  // out per k ∈ {1,5,10}: mutual-pair count, reciprocation rate,
  // max in-degree and orphan count (in-degree-0 vectors — the
  // anti-hubs). Everything is exact ints off the ranked frame except
  // the final rate division. Scale shape: ONE probe-broadcast scored
  // scan + ONE ranking window builds the ≤10·n edge frame (persisted —
  // the reverse join probes it twice and the in-degree census once);
  // the k sweep is a 3-row broadcast over that frame, never a re-scan.
  private def mutualKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.storage.StorageLevel
    val sub = base(s, dir).filter($"vec_id" % 4 === 0)
    val probes = sub.select($"vec_id".as("probe_id"), $"v".as("pv"),
      $"nrm".as("pn"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)
    val ranked = sub.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"probe_id".as("a"), $"vec_id".as("b"), $"rank")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = sub.agg(count(lit(1)).as("n_nodes"))
    val ks = s.range(1, 2).select(explode(array(lit(1), lit(5), lit(10)))
      .as("k"))
    // reverse-edge rank rides in via ONE self-join; a missing reverse
    // edge (rank_rev null) can never satisfy rank_rev <= k
    val rev = ranked.select($"b".as("a"), $"a".as("b"),
      $"rank".as("rank_rev"))
    val mut = ranked.join(rev, Seq("a", "b"), "left")
    val mutual = mut.crossJoin(broadcast(ks))
      .groupBy($"k")
      .agg(sum(when($"rank" <= $"k" && $"rank_rev" <= $"k" && $"a" < $"b",
        1L).otherwise(0L)).as("n_mutual_pairs"),
        sum(when($"rank" <= $"k", 1L).otherwise(0L)).as("n_directed"))
    val indeg = ranked.crossJoin(broadcast(ks))
      .filter($"rank" <= $"k")
      .groupBy($"k", $"b").agg(count(lit(1)).as("ind"))
      .groupBy($"k")
      .agg(max($"ind").as("max_indegree"),
        count(lit(1)).as("n_with_indegree"))
    mutual.join(indeg, Seq("k")).crossJoin(broadcast(nNodes))
      .select($"k".cast(LongType).as("k"), $"n_nodes",
        $"n_mutual_pairs",
        Num.roundAt((lit(2L) * $"n_mutual_pairs").cast(DoubleType) /
          $"n_directed".cast(DoubleType), 6).as("reciprocation_rate"),
        $"max_indegree", ($"n_nodes" - $"n_with_indegree").as("n_orphans"))
      .orderBy($"k")
  }

  // ---------------------------------------------------------------------
  // q261: embedding anisotropy census — the geometry pathology BENEATH
  // q249's hubness: embedding spaces collapse toward a common direction
  // (Ethayarajh 2019), which inflates every cosine and hides true
  // neighbors; the standard readout is ‖μ‖²/E‖x‖² (≈ the expected
  // cosine between random vectors) plus the per-dimension variance
  // profile (one dominant dimension = rogue feature). Coordinates are
  // frozen to 1e-6-unit int64s at the row (q160/q173 rule), so
  // per-dimension sums, squared sums (decimal/HUGEINT) and the
  // anisotropy ratio Σ_d sd_d² / (n·Σ_d sq_d) are EXACT integers; the
  // only floats are readout divisions. Scale shape: one posexplode
  // scan reduces map-side to a 64-row per-dimension census; everything
  // after is broadcast arithmetic on those 64 rows.
  private def anisotropyCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val e = Tables.embeddings(s, dir)
      .select(posexplode($"embedding").as(Seq("dim", "x")))
      .select($"dim".cast(LongType).as("dim"),
        floor($"x".cast(DoubleType) * lit(1e6)).cast(LongType).as("xs"))
    val byd = e.groupBy($"dim")
      .agg(count(lit(1)).as("n"), sum($"xs").as("sd"),
        sum(dec($"xs") * dec($"xs")).as("sq"))
    val tot = byd.agg(sum(dec($"sd") * dec($"sd")).as("ssd2"),
      sum($"sq").as("ssq"),
      sum(dec($"n") * $"sq" - dec($"sd") * dec($"sd")).as("svar"),
      max($"n").as("nn"))
    byd.crossJoin(broadcast(tot))
      .select($"dim",
        Num.roundAt($"sd".cast(DoubleType) /
          ($"n".cast(DoubleType) * lit(1e6)), 6).as("mean"),
        Num.roundAt((dec($"n") * $"sq" - dec($"sd") * dec($"sd"))
          .cast(DoubleType) /
          (($"n" * $"n").cast(DoubleType) * lit(1e12)), 6).as("variance"),
        Num.roundAt((dec($"n") * $"sq" - dec($"sd") * dec($"sd"))
          .cast(DoubleType) / $"svar".cast(DoubleType), 6).as("var_share"),
        Num.roundAt($"ssd2".cast(DoubleType) /
          ($"nn".cast(DoubleType) * $"ssq".cast(DoubleType)), 6)
          .as("anisotropy"))
      .orderBy($"dim")
  }

  // q28: LSH-bucketed ANN, top-3 per probe within bucket candidates.
  // Buckets come from the native codegen'd expression
  // (graft.functions.LshBuckets): hyperplane weights are integer Knuth
  // hashes mapped to [-1, 1) with power-of-two division and the sign
  // dot products accumulate in strict dimension order, so the DuckDB
  // twin (the formula spelled out over range()) computes identical
  // planes and identical buckets. The equivalent nested-HOF composition
  // evaluated interpreted (~12k boxed node evals per row) and dominated
  // this query's bench time.
  private def lshAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val withB = base(s, dir).withColumn("buckets", expr("lsh_buckets(v)"))
    // Vectors and norms ride through the bucket explode so scoring runs
    // directly on the join output; duplicate bucket hits (same pair in
    // several tables) collapse in the (probe, cand) aggregate — no
    // id-distinct plus vector re-join, and each side's buckets are
    // computed exactly once.
    val pe = withB.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"),
        posexplode_outer($"buckets").as(Seq("t", "bk")))
    val ce = withB.select($"vec_id".as("cand_id"), $"v".as("cv"), $"nrm".as("cn"),
      posexplode_outer($"buckets").as(Seq("t", "bk")))
    val scored = pe.join(ce, Seq("t", "bk"))
      .filter($"probe_id" =!= $"cand_id")
      .withColumn("c", expr("fold_dot(pv, cv)") / ($"pn" * $"cn"))
      .groupBy($"probe_id", $"cand_id")
      .agg(max($"c").as("cos"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"cand_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"probe_id", $"cand_id".as("neighbor_id"), $"rank",
        Num.roundAt($"cos", 6).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  // q49: IVF-style ANN — the other canonical scale path (inverted file
  // index). Cells are defined by a small centroid codebook (here: the
  // first 8 vectors, deterministic; at scale a sampled k-means
  // codebook), shipped to every task as plan literals to assign each
  // vector to its best cell in one map-side pass. Probes search their
  // nprobe=2 best cells only, so per-probe
  // work is ~nprobe·n/k candidates instead of n. All ranking on
  // bit-identical cosines (fold_dot) with cell-id tie-breaks, so the
  // oracle twin reproduces the exact cell assignment and result set.
  private def ivfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ivfRanked(s, dir, kTop = 3)
      .select($"probe_id", $"cand_id".as("neighbor_id"), $"rank",
        Num.roundAt($"cos", 6).as("cosine"))
      .orderBy("probe_id", "rank")
  }

  /** The IVF index core shared by q49 (top-3 report) and q146 (top-10
    * recall evaluation): returns (probe_id, cand_id, cos, rank) with
    * rank <= kTop under the (cos DESC, cand_id ASC) total order.
    * `nprobe` = number of best cells each probe searches; at nprobe = k
    * (all cells) the candidate set is the full corpus and the result
    * must equal brute force — the completeness property
    * DedupSimilaritySpec pins.
    */
  /** The q49/q61 naive codebook: the first 8 vectors, collected with
    * their norms as (cid, centroid, norm).
    */
  private[ops] def naiveCodebook(s: SparkSession, dir: String): Seq[(Long, Seq[Double], Double)] = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .filter($"vec_id" < 8)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
      .select($"vec_id", $"v", $"nrm").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toSeq, r.getDouble(2)))
      .sortBy(_._1).toSeq
  }

  /** k=8 codebook trained with `iters` Lloyd iterations from the naive
    * seeds — the q61 step run to (near) convergence, driver-sequenced
    * like q57's fixpoint: each iteration ships the kilobyte codebook as
    * literals, assigns with one codegen'd map pass (argmin d² over
    * struct array_min) and re-averages members in one k-group shuffle.
    * Empty cells keep their previous centroid. DedupSimilaritySpec uses
    * this to show the q146 evaluation harness DRIVING index quality:
    * trained codebook -> measurably higher recall@10 at the same
    * nprobe.
    */
  private[ops] def trainCodebook(s: SparkSession, dir: String,
                                 iters: Int): Seq[(Long, Seq[Double], Double)] = {
    import s.implicits._
    val all = base(s, dir).withColumn("vv", expr("fold_dot(v, v)"))
    var cents = naiveCodebook(s, dir)
    (1 to iters).foreach { _ =>
      val best = array_min(array(cents.map { case (cid, c, cn) =>
        struct(
          ($"vv" - lit(2.0) * call_function("fold_dot", $"v", typedlit(c)) +
            lit(cn * cn)).as("d2"),
          lit(cid).as("cid"))
      }: _*))
      // width derived from the seed centroids (they carry the embedding
      // schema's true dimension) — a hardcoded width would silently
      // truncate centroids if the embedding table ever changed shape
      val dims = 1 to cents.head._2.length
      val updated = all.withColumn("cid", best("cid"))
        .groupBy($"cid")
        .agg(avg(element_at($"v", 1)).as("d1"),
          dims.tail.map(i => avg(element_at($"v", i)).as(s"d$i")): _*)
        .collect()
        .map { r =>
          val vec = dims.map(i => r.getDouble(i)).toSeq
          r.getLong(0) -> ((r.getLong(0), vec, math.sqrt(vec.map(x => x * x).sum)))
        }.toMap
      cents = cents.map { case old @ (cid, _, _) => updated.getOrElse(cid, old) }
    }
    cents
  }

  private[ops] def ivfRanked(s: SparkSession, dir: String, kTop: Int,
                             nprobe: Int = 2,
                             codebook: Option[Seq[(Long, Seq[Double], Double)]] = None): DataFrame = {
    import s.implicits._
    val all = base(s, dir)
    // Collect the codebook to the driver — k·dim doubles, the canonical
    // IVF shape (a codebook is small BY CONSTRUCTION; at 100 TB it is
    // k-means output, still kilobytes). With centroids as literals, cell
    // assignment is a pure per-row projection: all k cosines + the
    // argmax run inside one codegen'd map stage — no fan-out join and no
    // window shuffle of n·k vector-carrying rows (the previous shape).
    // Norms are collected, not recomputed, so every ccos divides by the
    // bit-identical double the oracle's formula produces. Read straight
    // from the table — NOT through `base` — so the vec_id<8 filter
    // pushes to the parquet scan instead of paying a full
    // repartition+norms pass over the corpus to keep 8 rows (the
    // expressions are identical, so the doubles are too).
    val centRows =
      codebook.getOrElse(naiveCodebook(s, dir))
    // struct(ccos, -cent_id): ascending struct sort, reversed, ranks by
    // (ccos DESC, cent_id ASC) — the window's orderBy, without the window.
    val scoredCells = array(centRows.map { case (cid, cv, cn) =>
      struct(
        (call_function("fold_dot", $"v", typedlit(cv)) / ($"nrm" * lit(cn))).as("ccos"),
        lit(-cid).as("negcid"))
    }: _*)
    val withCells = all.withColumn("cells", reverse(array_sort(scoredCells)))
    val assign = withCells
      .select($"vec_id".as("cand_id"), (-$"cells"(0)("negcid")).as("cell"),
        $"v".as("cv2"), $"nrm".as("cn2"))
    val probeCells = withCells
      .filter($"vec_id" >= 20 && $"vec_id" < 40)
      .select($"vec_id".as("probe_id"), explode(slice($"cells", 1, nprobe)).as("pc"),
        $"v".as("pv"), $"nrm".as("pn"))
      .select($"probe_id", (-$"pc"("negcid")).as("cell"), $"pv", $"pn")

    val scored = probeCells.join(assign, Seq("cell"))
      .filter($"probe_id" =!= $"cand_id")
      .withColumn("c", expr("fold_dot(pv, cv2)") / ($"pn" * $"cn2"))
      .groupBy($"probe_id", $"cand_id")
      .agg(max($"c").as("cos"))
    val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"cand_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= kTop)
  }

  // q146: ANN recall evaluation — the quality gate every approximate
  // index needs before it replaces brute force in a 100 TB pipeline:
  // recall@10 of the q49 IVF index (nprobe=2) against the EXACT
  // brute-force top-10, per probe. Ground truth costs |probes| × n
  // scored pairs (probes broadcast, one candidate scan — the q22
  // shape, affordable because the probe set is small; at scale one
  // evaluates on a sampled probe set exactly like this); the IVF side
  // reuses the q49 core. Every cosine is the same fold_dot double in
  // both engines and ties break on cand_id, so the two top-10 sets —
  // and hence the recall fractions — are deterministic and
  // hash-comparable, not just statistically close.
  private def annRecall(s: SparkSession, dir: String): DataFrame =
    annRecallAt(s, dir, nprobe = 2)

  private[ops] def annRecallAt(s: SparkSession, dir: String, nprobe: Int,
                               codebook: Option[Seq[(Long, Seq[Double], Double)]] = None): DataFrame = {
    import s.implicits._
    val all = base(s, dir)
    val probes = all.filter($"vec_id" >= 20 && $"vec_id" < 40)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"))
    val wExact = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)
    val exact = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(wExact))
      .filter($"rank" <= 10)
      .select($"probe_id", $"vec_id".as("cand_id"))
    val ivf = ivfRanked(s, dir, kTop = 10, nprobe, codebook)
      .select($"probe_id", $"cand_id")
    val hits = exact.join(ivf, Seq("probe_id", "cand_id"))
      .groupBy($"probe_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy($"probe_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("probe_id"), "left")
      .select($"probe_id", $"n_exact",
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        Num.roundAt(coalesce($"n_hit", lit(0L)).cast(DoubleType) / $"n_exact", 6)
          .as("recall"))
      .orderBy("probe_id")
  }

  // q61: one Lloyd iteration of k-means over the embeddings — the
  // codebook-refinement step the IVF comments (q27/q49) defer to
  // "k-means at scale". Seeds = the first 8 vectors (deterministic),
  // collected and shipped as plan literals (same rationale as q49: a
  // codebook is kilobytes by construction); the argmin squared-L2
  // centroid is a map-side array_min over one struct per centroid, with
  // d² = v·v − 2·v·c + c·c on native fold_dots — v·v computed once per
  // vector, c·c once per centroid on the driver, never a 64-dim
  // subtract-square per (vector, centroid) pair, and no n·k fan-out
  // join or window shuffle. The update step re-averages members per
  // cell. At 100 TB this is the canonical iteration: ship k centroids,
  // one scan, one k-group shuffle, repeat until movement < ε. Output
  // pins the assignment counts and the first four centroid dimensions.
  private def kmeansStep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = base(s, dir).withColumn("vv", expr("fold_dot(v, v)"))
    // Codebook read straight from the table (filter pushed to the scan),
    // not through `base` — see q49.
    val centRows = Tables.embeddings(s, dir)
      .filter($"vec_id" < 8)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .withColumn("vv", expr("fold_dot(v, v)"))
      .select($"vec_id", $"v", $"vv").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toSeq, r.getDouble(2)))
      .sortBy(_._1)
    // array_min over struct(d2, cid) = lexicographic min = argmin d²
    // with cid ascending tie-break — the window's (d2, cid) orderBy.
    val best = array_min(array(centRows.map { case (cid, c, cc) =>
      struct(
        ($"vv" - lit(2.0) * call_function("fold_dot", $"v", typedlit(c)) + lit(cc)).as("d2"),
        lit(cid).as("cid"))
    }: _*))
    all.withColumn("cid", best("cid"))
      .groupBy($"cid")
      .agg(
        count(lit(1)).as("n_members"),
        Num.roundAt(avg(element_at($"v", 1)), 4).as("c1"),
        Num.roundAt(avg(element_at($"v", 2)), 4).as("c2"),
        Num.roundAt(avg(element_at($"v", 3)), 4).as("c3"),
        Num.roundAt(avg(element_at($"v", 4)), 4).as("c4"))
      .orderBy("cid")
  }

  // q93: product-quantization ANN (ADC search) — the memory rung of the
  // scale ladder below IVF: each 64-dim vector is encoded as 8 one-byte
  // codes (one per 8-dim subspace, nearest of 16 sub-centroids), a 32×
  // compression that is what actually lets a 100 TB embedding corpus be
  // searched from RAM. Query-time is asymmetric distance computation:
  // per probe, a 8×16 lookup table of probe-subvector-to-centroid
  // squared distances is built ONCE (here on the driver, same rationale
  // as q49's codebook collect — probes × codebook is kilobytes), and
  // each candidate's approximate distance is 8 table lookups + 7 adds,
  // never touching the original vector. Codebook = subvectors of the
  // first 16 vectors (deterministic stand-in; q61 is the k-means
  // refinement that would train it at scale). Encoding is one codegen'd
  // map pass (argmin via ascending struct sort, centroid-id tie-break);
  // the repartition materializes the codes so the per-probe ADC
  // projections read an attribute instead of re-encoding per reference.
  // Every distance is a fixed-order left fold (Det rule 2), so codes,
  // LUTs and ADC sums are bit-identical to the oracle's formulation.
  /** Shared ADC core for q93/q164: (vec_id, probe_id, adc) for every
    * candidate × probe, plus each probe's full vector literal (for
    * q164's exact re-rank stage). See the q93 comment for the design.
    */
  private def adcScored(s: SparkSession, dir: String)
      : (DataFrame, Array[(Long, Seq[Double])]) = {
    import s.implicits._
    val sub = 8; val dims = 8; val k = 16
    val np = s.conf.get("spark.sql.shuffle.partitions").toInt
    def subVecs(r: org.apache.spark.sql.Row): Array[Array[Double]] =
      r.getAs[scala.collection.Seq[Double]]("v").toArray.grouped(dims).toArray
    // codebook(j)(c) = centroid c of subspace j, collected once
    val centRows = Tables.embeddings(s, dir)
      .filter($"vec_id" < k)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .collect().sortBy(_.getLong(0)).map(subVecs)
    val cb: Array[Array[Array[Double]]] =
      Array.tabulate(sub, k)((j, c) => centRows(c)(j))
    // Encode via the native pq_encode expression (graft.functions
    // .PqEncode): the codebook ships as ONE flat array literal, the
    // argmin-with-lowest-index-ties loop is codegen'd, and — the reason
    // it exists — the plan is 4 nodes where the composed argmin (8×16
    // struct-sorts over 8-term squared diffs) was a ~3000-node Column
    // tree costing >1s of driver-side analysis per query construction.
    graft.functions.GraftFunctions.register(s)
    val flatCb: Seq[Double] =
      (0 until sub).flatMap(j => (0 until k).flatMap(c => cb(j)(c).toSeq))
    val encoded = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .repartition(np) // single-split table: parallelize the encode pass
      .select($"vec_id",
        call_function("pq_encode", $"v", typedlit(flatCb),
          lit(sub), lit(dims)).as("codes"))
      .repartition(np) // materialize codes before the 5 probe references
    // probe LUTs, driver-computed with the same left fold
    def d2Arr(a: Array[Double], b: Array[Double]): Double =
      (0 until dims).map(d => (a(d) - b(d)) * (a(d) - b(d))).reduce(_ + _)
    val probes = Tables.embeddings(s, dir)
      .filter($"vec_id" >= 40 && $"vec_id" < 45)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), subVecs(r)))
    val scored = encoded
      .select($"vec_id", explode(array(probes.map { case (pid, pv) =>
        val adc = (0 until sub).map { j =>
          val lut: Seq[Double] = (0 until k).map(c => d2Arr(pv(j), cb(j)(c)))
          element_at(typedlit(lut), $"codes"(j) + 1)
        }.reduce(_ + _)
        struct(lit(pid).as("probe_id"), adc.as("adc"))
      }: _*)).as("pa"))
      .select($"vec_id", $"pa.probe_id", $"pa.adc")
      .filter($"vec_id" =!= $"probe_id")
    (scored, probes.map { case (pid, pv) => (pid, pv.flatten.toSeq) })
  }

  private def pqAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (scored, _) = adcScored(s, dir)
    val w = Window.partitionBy($"probe_id").orderBy($"adc".asc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"probe_id", $"vec_id".as("neighbor_id"), $"rank",
        Num.roundAt($"adc", 6).as("adc_d2"))
      .orderBy("probe_id", "rank")
  }

  // q164: two-stage retrieval — PQ-ADC shortlist, EXACT re-rank. The
  // production ANN pattern q93 stops short of: the compressed index
  // (32× smaller, RAM-resident at 100 TB) cheaply shortlists top-20
  // candidates per probe, then the exact vectors are fetched for ONLY
  // those ~20 rows and re-scored with true squared-L2. The output
  // carries both ranks, so the reorder the re-rank performs (adc_rank
  // vs final rank) is visible — the observable value of the second
  // stage. Scale shape: stage 1 is q93's one-pass scan of the code
  // table; stage 2 joins a |probes|·20-row BROADCAST shortlist against
  // the vector table — the exact vectors of everything else are never
  // read. Every exact d² is the Det left fold (identical bits to the
  // oracle's list_reduce), and both rank orders tie-break on vec_id.
  private def rerankAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (scored, probes) = adcScored(s, dir)
    val w = Window.partitionBy($"probe_id").orderBy($"adc".asc, $"vec_id".asc)
    val shortlist = scored.withColumn("adc_rank", row_number().over(w))
      .filter($"adc_rank" <= 20)
    // exact vectors attach to the bounded shortlist only (broadcast the
    // ~|probes|·20 rows, stream the vector table past it)
    val withVec = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .join(broadcast(shortlist), Seq("vec_id"))
    val d2 = probes.foldLeft(lit(null).cast(DoubleType)) {
      case (acc, (pid, pv)) =>
        when($"probe_id" === pid,
          aggregate(zip_with(typedlit(pv), $"v", (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x)).otherwise(acc)
    }
    val wx = Window.partitionBy($"probe_id").orderBy($"d2".asc, $"vec_id".asc)
    withVec.withColumn("d2", d2)
      .withColumn("rank", row_number().over(wx))
      .filter($"rank" <= 5)
      .select($"probe_id", $"vec_id".as("neighbor_id"), $"rank",
        Num.roundAt($"d2", 6).as("d2"),
        Num.roundAt($"adc", 6).as("adc_d2"), $"adc_rank")
      .orderBy("probe_id", "rank")
  }

  // q160: label-centroid purity — the embedding-space quality gate
  // beside q146/q147's index evals: how separable are the labels the
  // corpus claims? Per label, build the exact mean-direction centroid,
  // assign EVERY vector to its nearest centroid by cosine, and report
  // per-label membership, own-centroid assignment fraction (purity) and
  // mean own-centroid cosine (cohesion). A label whose purity collapses
  // is mislabeled or unclusterable — caught before the labels feed a
  // classifier. Scale shape: the centroid build is one partial-
  // aggregated groupBy over (label, dim) — 64·|labels| cells regardless
  // of corpus size — collected as a kilobyte driver literal (the
  // documented q49/q93 codebook pattern); assignment is one map-side
  // pass, |labels| fold_dots per vector; the readout is a |labels|-row
  // census. Determinism: the ONLY cross-partition fp reductions are
  // exact int64 sums — per-dim centroid coordinates via floor(x·1e6)
  // scaled integers (floor is exact on both engines; no round-half
  // semantics), and per-label cosine sums the same way. Cosine is
  // scale-invariant, so the un-normalized integer-sum centroid IS the
  // mean-direction centroid — no division ever happens. Per-row cosines
  // are left folds over identical doubles (Det rule 2); argmax ties
  // break to the lowest label via the struct(cos, -label) max.
  private def centroidPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
    val sums = v
      .select($"label", posexplode(transform($"v", x => floor(x * lit(1e6)))))
      .groupBy($"label", $"pos").agg(sum($"col").as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val cents: Seq[(Int, Seq[Double])] = sums.groupBy(_._1).toSeq
      .map { case (lbl, rows) =>
        lbl -> rows.sortBy(_._2).map(_._3.toDouble).toSeq }
      .sortBy(_._1)
    // per-centroid cosine columns, label-ordered so element_at(scores,
    // label + 1) reads the own-centroid score without a second pass
    val scores = array(cents.map { case (lbl, c) =>
      struct((dot($"v", typedlit(c)) / (l2norm($"v") * l2norm(typedlit(c))))
        .as("cos"), lit(-lbl).as("neglbl"))
    }: _*)
    v.withColumn("sc", scores)
      .select($"label",
        (-array_max($"sc")("neglbl")).as("best_label"),
        element_at($"sc", $"label" + 1)("cos").as("own_cos"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when($"best_label" === $"label", 1L).otherwise(0L)).as("n_own"),
        sum(floor($"own_cos" * lit(1e6))).as("own_sc"))
      .select($"label", $"n_vecs", $"n_own",
        Num.roundAt($"n_own".cast(DoubleType) / $"n_vecs".cast(DoubleType), 6)
          .as("purity"),
        Num.roundAt($"own_sc".cast(DoubleType) / $"n_vecs".cast(DoubleType)
          / lit(1e6), 6).as("mean_own_cos"))
      .orderBy("label")
  }

  // q171: INCREMENTAL semantic dedup — the vector twin of q78's
  // arrival-batch text dedup: a new embedding batch is deduplicated
  // against the EXISTING corpus by probing the IVF cell index, so
  // history × history never forms and per-arrival cost is the occupancy
  // of nprobe cells, not corpus size. Arrivals are synthesized from the
  // table (exact copies of every 10th vector — must be flagged — and
  // negated vectors — must come back clean; negation is exact in fp).
  // The corpus is assigned to cells ONCE (kilobyte codebook as plan
  // literals, one codegen'd map pass — the q49 shape); arrivals probe
  // their 2 best cells; candidates join on the cell key. Every cosine
  // is the Det left fold, ties break on -cand_id, so best-match and the
  // dup flag are bit-deterministic.
  private def incrementalSemDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = base(s, dir)
    val cents = naiveCodebook(s, dir)
    val scoredCells = array(cents.map { case (cid, cv, cn) =>
      struct(
        (call_function("fold_dot", $"v", typedlit(cv)) / ($"nrm" * lit(cn))).as("ccos"),
        lit(-cid).as("negcid"))
    }: _*)
    val corpus = all.withColumn("cells", reverse(array_sort(scoredCells)))
      .select($"vec_id".as("cand_id"), (-$"cells"(0)("negcid")).as("cell"),
        $"v".as("cv2"), $"nrm".as("cn2"))
    val raw = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v0"))
    val arrivals = raw.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("arrival_id"), $"v0".as("v"))
      .unionAll(raw.filter($"vec_id" % 10 === 5)
        .select(($"vec_id" + 200000L).as("arrival_id"),
          transform($"v0", x => -x).as("v")))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
      .withColumn("cells", reverse(array_sort(scoredCells)))
      .select($"arrival_id", explode(slice($"cells", 1, 2)).as("pc"),
        $"v".as("pv"), $"nrm".as("pn"))
      .select($"arrival_id", (-$"pc"("negcid")).as("cell"), $"pv", $"pn")
    arrivals.join(corpus, Seq("cell"))
      .withColumn("cos", expr("fold_dot(pv, cv2)") / ($"pn" * $"cn2"))
      .groupBy($"arrival_id")
      .agg(count(lit(1)).as("n_cand"),
        max(struct($"cos", (-$"cand_id").as("negid"))).as("best"))
      .select($"arrival_id", $"n_cand",
        (-$"best.negid").as("best_match"),
        Num.roundAt($"best.cos", 6).as("best_cos"),
        ($"best.cos" >= 0.98).as("is_dup"))
      .orderBy("arrival_id")
  }

  // q172: MULTI-PROBE LSH recall evaluation — the standard fix when LSH
  // recall at a fixed table count is short (multi-probe LSH, VLDB'07):
  // besides a probe's exact bucket, also search the buckets one sign-bit
  // away (6 flips per 6-bit table), buying candidates with COMPUTE
  // instead of more tables/memory. The readout compares single-probe vs
  // multi-probe per probe vector against the exact brute-force top-10 —
  // candidate volume vs recall, the curve a deployment picks its
  // operating point from (the q146/q147 eval-family pattern). Scale
  // shape: both candidate generators are bucket equi-joins (multi-probe
  // widens the probe side 7×, a constant); ground truth is |probes|·n
  // (evaluation-only, sampled probes at scale); every cosine is the Det
  // left fold and every count is exact.
  private def multiProbeLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val withB = base(s, dir).withColumn("buckets", expr("lsh_buckets(v)"))
    val ce = withB.select($"vec_id".as("cand_id"),
      posexplode_outer($"buckets").as(Seq("t", "bk")))
    val pb = withB.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"),
        posexplode_outer($"buckets").as(Seq("t", "bk0")))
    def pairsFrom(probeKeys: DataFrame) = probeKeys
      .join(ce, Seq("t", "bk"))
      .filter($"probe_id" =!= $"cand_id")
      .select($"probe_id", $"cand_id").distinct()
    val single = pairsFrom(pb.select($"probe_id", $"t", $"bk0".as("bk")))
    val multi = pairsFrom(pb
      .select($"probe_id", $"t", explode(expr(
        "concat(array(bk0), transform(sequence(0, 5)," +
          " f -> bk0 ^ shiftleft(1L, f)))")).as("bk")))
    val probes = withB.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"))
    val wExact = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)
    val exact = base(s, dir).join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(wExact))
      .filter($"rank" <= 10)
      .select($"probe_id", $"vec_id".as("cand_id"))
    def census(pairs: DataFrame, tag: String) = pairs
      .join(exact.withColumn("hit", lit(1L)), Seq("probe_id", "cand_id"), "left")
      .groupBy($"probe_id")
      .agg(count(lit(1)).as(s"n_cand_$tag"), sum($"hit").as(s"n_hit_$tag"))
    exact.groupBy($"probe_id").agg(count(lit(1)).as("n_exact"))
      .join(census(single, "single"), Seq("probe_id"))
      .join(census(multi, "multi"), Seq("probe_id"))
      .select($"probe_id", $"n_exact",
        $"n_cand_single", coalesce($"n_hit_single", lit(0L)).as("n_hit_single"),
        Num.roundAt(coalesce($"n_hit_single", lit(0L)).cast(DoubleType) /
          $"n_exact".cast(DoubleType), 6).as("recall_single"),
        $"n_cand_multi", coalesce($"n_hit_multi", lit(0L)).as("n_hit_multi"),
        Num.roundAt(coalesce($"n_hit_multi", lit(0L)).cast(DoubleType) /
          $"n_exact".cast(DoubleType), 6).as("recall_multi"))
      .orderBy("probe_id")
  }

  // q173: int8 quantization-error census — the OTHER compression family
  // beside q93's PQ: symmetric per-vector max-abs int8 quantization (the
  // scheme every vector DB ships as "scalar quantization", 4× smaller
  // than f32), scored for what it costs: per-label mean cosine between
  // each vector and its dequantized self (direction distortion — the
  // quantity ANN ranking actually depends on) and the worst per-element
  // absolute error. The decision readout for "can embeddings ship as
  // int8". Determinism: quantization is floor of IEEE-deterministic
  // divisions, codes are exact ints, per-row cosines are Det left
  // folds, and the per-label means use q160's floor-scaled int64 sums —
  // the only cross-partition reductions are exact integer adds and an
  // exact max. One map pass + a |labels|-row census.
  private def quantizationError(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("mx",
        aggregate($"v", lit(0.0), (a, x) => greatest(a, abs(x))))
      .withColumn("mx", when($"mx" === 0.0, 1.0).otherwise($"mx"))
      .withColumn("dq", transform($"v",
        x => floor(x / $"mx" * 127.0) * $"mx" / 127.0))
      .withColumn("cosq",
        dot($"v", $"dq") / (l2norm($"v") * l2norm($"dq")))
      .withColumn("maxerr",
        aggregate(zip_with($"v", $"dq", (a, b) => abs(a - b)), lit(0.0),
          (a, x) => greatest(a, x)))
    v.groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor($"cosq" * lit(1e9))).as("sc"),
        max($"maxerr").as("worst_err"))
      .select($"label", $"n_vecs",
        Num.roundAt($"sc".cast(DoubleType) / $"n_vecs".cast(DoubleType)
          / lit(1e9), 6).as("mean_cos_after_quant"),
        Num.roundAt($"worst_err", 6).as("worst_abs_err"))
      .orderBy("label")
  }

  // ---------------------------------------------------------------------
  // q196: per-dimension embedding drift — q145's PSI drift detector
  // lifted to vector space, the embedding-hygiene audit run when a
  // corpus (or encoder) changes: for every one of the 64 dimensions,
  // the value distribution of label group A (labels 0-4) is compared to
  // group B (5-9) over 12 fixed bins (floor(x·10) clamped to [-6, 5]),
  // PSI = Σ (pa − pb)·ln(pa/pb) with add-half smoothing. Dimensions
  // with high PSI are where the two populations actually separate — or,
  // between two corpus snapshots, where drift concentrates. Scale
  // shape: bin counts partial-aggregate map-side into a ≤ 64×12 census;
  // the full dim×bin grid is enumerated explicitly so empty bins
  // contribute their exact smoothed mass on both engines; per-dim PSI
  // folds ≤ 12 terms in bin order (Det rule 2 — a plain sum over the
  // tiny frame would still race partitions). Output: all 64 dims.
  private def embeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nb = 12
    val binned = Tables.embeddings(s, dir)
      .select(($"label" < 5).as("grp"),
        posexplode(Det.toDoubleArr($"embedding")).as(Seq("dim", "x")))
      .select($"grp", $"dim",
        greatest(lit(-6L), least(lit(5L), floor($"x" * 10))).as("bin"))
    val counts = binned.groupBy($"dim", $"bin")
      .agg(sum(when($"grp", 1L).otherwise(0L)).as("ca"),
        sum(when(!$"grp", 1L).otherwise(0L)).as("cb"))
    val tot = Tables.embeddings(s, dir)
      .agg(sum(when($"label" < 5, 1L).otherwise(0L)).as("na"),
        sum(when($"label" >= 5, 1L).otherwise(0L)).as("nb"))
    val grid = s.range(0, 64).select($"id".cast(IntegerType).as("dim"))
      .crossJoin(s.range(-6, 6).select($"id".as("bin")))
    val pa = ($"ca" + 0.5) / ($"na" + nb / 2.0)
    val pb = ($"cb" + 0.5) / ($"nb" + nb / 2.0)
    grid.join(counts, Seq("dim", "bin"), "left")
      .na.fill(0L, Seq("ca", "cb"))
      .crossJoin(broadcast(tot))
      .withColumn("term", (pa - pb) * log(pa / pb))
      .groupBy($"dim")
      .agg(sort_array(collect_list(struct($"bin", $"term"))).as("ts"))
      .withColumn("psi",
        aggregate($"ts", lit(0.0), (acc, x) => acc + x.getField("term")))
      .select($"dim", Num.roundAt($"psi", 6).as("psi"))
      .orderBy($"dim")
  }

  // ---------------------------------------------------------------------
  // q197: hard-negative mining census — the contrastive-training data
  // prep step beside q146's recall harness: for every probe vector, the
  // most-similar vector of a DIFFERENT label is its "hardest negative"
  // (the pair a contrastive loss learns most from) and the most-similar
  // SAME-label vector is its nearest positive. The per-label census
  // reads out mean hardest-negative cosine, mean nearest-positive
  // cosine, their margin, and the count of margin VIOLATIONS (negative
  // beats positive — the probes worth mining into the next batch; also
  // the labels whose embedding neighborhoods are confused). Scale
  // shape: the probe set is the bounded broadcast side (mining runs in
  // probe batches); the corpus streams exactly once and reduces
  // map-side to one row per (probe, label-side) via conditional max —
  // at 100 TB the full-scan scorer swaps for q172's LSH-bucketed
  // candidate join with identical downstream algebra. Determinism: max
  // over per-row Det fold cosines is order-independent; means are
  // floor-scaled int64 sums (q173 pattern).
  private def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val all = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
    val probes = all.filter($"vec_id" < 30)
      .select($"vec_id".as("probe_id"), $"label".as("plabel"),
        $"v".as("pv"), $"nrm".as("pn"))
    val per = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .groupBy($"probe_id", $"plabel")
      .agg(max(when($"label" =!= $"plabel", $"cos")).as("hn_cos"),
        max(when($"label" === $"plabel", $"cos")).as("pp_cos"))
    per.groupBy($"plabel".as("label"))
      .agg(count(lit(1)).as("n_probes"),
        sum(floor($"hn_cos" * lit(1e9))).as("shn"),
        sum(floor($"pp_cos" * lit(1e9))).as("spp"),
        sum(floor(($"pp_cos" - $"hn_cos") * lit(1e9))).as("smg"),
        sum(when($"hn_cos" >= $"pp_cos", 1L).otherwise(0L))
          .as("n_violations"))
      .select($"label", $"n_probes",
        Num.roundAt($"shn".cast(DoubleType) / $"n_probes".cast(DoubleType)
          / lit(1e9), 6).as("mean_hard_neg_cos"),
        Num.roundAt($"spp".cast(DoubleType) / $"n_probes".cast(DoubleType)
          / lit(1e9), 6).as("mean_nearest_pos_cos"),
        Num.roundAt($"smg".cast(DoubleType) / $"n_probes".cast(DoubleType)
          / lit(1e9), 6).as("mean_margin"),
        $"n_violations")
      .orderBy("label")
  }

  // ---------------------------------------------------------------------
  // q198: per-dimension class-separability (Fisher ratio) — the
  // embedding-quality eval that precedes ANY labeled use of a vector
  // space (retrieval finetuning, classifier probes, q160's centroid
  // audit): for every dimension, the total sum-of-squares decomposes
  // exactly into between-class + within-class; the Fisher ratio
  // SSB/SSW ranks the dimensions that actually separate the labels
  // (feature selection for a linear probe; near-zero everywhere ⇒ the
  // encoder ignores the label). Scale shape: values quantize per-row to
  // exact 1e-4-unit int64s, so every cross-partition reduction is an
  // exact integer sum (count/s1/s2) that partial-aggregates map-side;
  // the only fp arithmetic runs over the 64×|labels| census — the
  // per-class terms fold in label order (Det rule 2). One scan,
  // |dims|-row output, no joins.
  private def classSeparability(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Tables.embeddings(s, dir)
      .select($"label",
        posexplode(Det.toDoubleArr($"embedding")).as(Seq("dim", "x")))
      .select($"label", $"dim",
        floor($"x" * lit(10000.0)).cast(LongType).as("q"))
    val cls = q.groupBy($"dim", $"label")
      .agg(count(lit(1)).as("n"), sum($"q").as("s1"),
        sum($"q" * $"q").as("s2"))
      .withColumn("term", $"s2".cast(DoubleType) -
        $"s1".cast(DoubleType) * $"s1".cast(DoubleType) /
          $"n".cast(DoubleType))
    cls.groupBy($"dim")
      .agg(count(lit(1)).as("n_classes"),
        sum($"n").as("nn"), sum($"s1").as("t1"), sum($"s2").as("t2"),
        sort_array(collect_list(struct($"label", $"term"))).as("ts"))
      .withColumn("ssw",
        aggregate($"ts", lit(0.0), (a, x) => a + x.getField("term")))
      .withColumn("sst", $"t2".cast(DoubleType) -
        $"t1".cast(DoubleType) * $"t1".cast(DoubleType) /
          $"nn".cast(DoubleType))
      .select($"dim", $"n_classes",
        Num.roundAt(($"sst" - $"ssw") / lit(1e8), 6).as("ss_between"),
        Num.roundAt($"ssw" / lit(1e8), 6).as("ss_within"),
        Num.roundAt(($"sst" - $"ssw") / $"ssw", 6).as("fisher_ratio"))
      .orderBy($"dim")
  }

  // ---------------------------------------------------------------------
  // q215: Matryoshka truncation census — the dimension-budget knob
  // modern embedding models expose (MRL: the first d dims are trained
  // to stand alone): rank with only the first 16 / 32 / 64 dimensions
  // and measure recall@10 against the full-width ranking. The readout
  // prices memory/compute (a 16-dim index is 4× smaller and 4× faster
  // than 64) in recall terms — the decision input for "can the ANN
  // tier run truncated and the re-rank tier full" (q164's two-stage
  // pattern with a width budget instead of a quantizer). Determinism:
  // per-width cosines are Det folds over prefix slices; ranks are
  // total orders; recall counts are exact ints, means floor-scaled.
  // Scale shape: per width one probe-broadcast scan (evaluation-only
  // probe set, as q146); the census is 3 rows.
  private def matryoshkaRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val all = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
    def topk(d: Int): DataFrame = {
      val sliced = all
        .select($"vec_id", expr(s"slice(v, 1, $d)").as("vd"))
        .withColumn("nrm", sqrt(expr("fold_dot(vd, vd)")))
      val probes = sliced.filter($"vec_id" < 20)
        .select($"vec_id".as("probe_id"), $"vd".as("pv"), $"nrm".as("pn"))
      val w = Window.partitionBy($"probe_id")
        .orderBy($"cos".desc, $"vec_id".asc)
      sliced.join(broadcast(probes), $"vec_id" =!= $"probe_id")
        .withColumn("cos", expr("fold_dot(pv, vd)") / ($"pn" * $"nrm"))
        .withColumn("r", row_number().over(w))
        .filter($"r" <= 10)
        .select(lit(d).as("dim_budget"), $"probe_id", $"vec_id")
    }
    // topk(64) serves twice — as the truth set AND as the widest sweep
    // entry. Execute it ONCE (persist) and derive both; the most
    // expensive probe-broadcast scan + ranking window is never re-run.
    val t64 = topk(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = t64.select($"probe_id", $"vec_id", lit(1L).as("hit"))
    Seq(16, 32).map(topk).reduce(_ unionAll _).unionAll(t64)
      .join(truth, Seq("probe_id", "vec_id"), "left")
      .groupBy($"dim_budget", $"probe_id")
      .agg(sum(coalesce($"hit", lit(0L))).as("nh"))
      .groupBy($"dim_budget")
      .agg(count(lit(1)).as("n_probes"), sum($"nh").as("n_hits"))
      .select($"dim_budget", $"n_probes", $"n_hits",
        Num.roundAt($"n_hits".cast(DoubleType) /
          (lit(10.0) * $"n_probes".cast(DoubleType)), 6)
          .as("mean_recall_at10"))
      .orderBy($"dim_budget")
  }

  // ---------------------------------------------------------------------
  // q240: FILTERED vector search — the production ANN question none of
  // q28/q49/q93 answer: "top-10 similar items IN THE PROBE'S CATEGORY".
  // Two strategies exist and the census prices the broken one:
  // pre-filtering (restrict to the label first, then rank — the truth,
  // but it needs a per-label index) vs post-filtering (rank globally,
  // keep a shortlist of S, THEN filter — one global index, but recall
  // collapses when S is small relative to k/selectivity: at 10%
  // selectivity a shortlist of 10 keeps ~1 same-label row). The sweep
  // S in {10, 50, 200} reads mean recall@10 and the kept-count per
  // probe — the "oversample by k/selectivity" rule made measurable.
  // One probe-broadcast scan scores every (probe, vector) pair ONCE;
  // both the global rank and the within-label rank are windows over
  // that frame (partitioned by probe — never a global sort), and the
  // three shortlists are exceedance predicates (q220/q238 pattern).
  // Determinism: ranks use the (cos desc, vec_id asc) tie-break and
  // identical left-fold dot products both engines (q22 precedent);
  // recalls divide exact ints. Scale shape: the evaluation-only probe
  // set broadcasts (q146); at corpus scale the post-filter candidate
  // generation swaps to the real ANN tiers, same readout.
  private def filteredAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val all = Tables.embeddings(s, dir)
      .select($"vec_id", toDoubleArr($"embedding").as("v"), $"label")
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .withColumn("nrm", sqrt(expr("fold_dot(v, v)")))
    val probes = all.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"),
        $"label".as("plabel"))
    val scored = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("same", $"label" === $"plabel")
      .withColumn("rk_all", row_number().over(
        Window.partitionBy($"probe_id")
          .orderBy($"cos".desc, $"vec_id".asc)))
      .withColumn("rk_grp", row_number().over(
        Window.partitionBy($"probe_id", $"same")
          .orderBy($"cos".desc, $"vec_id".asc)))
      .withColumn("is_truth", $"same" && $"rk_grp" <= 10)
    val ss = Seq(10L, 50L, 200L).toDF("shortlist")
    scored.crossJoin(broadcast(ss))
      .groupBy($"shortlist")
      .agg(count_distinct($"probe_id").as("n_probes"),
        sum(when($"is_truth", 1L).otherwise(0L)).as("n_truth"),
        sum(when($"is_truth" && $"rk_all" <= $"shortlist", 1L)
          .otherwise(0L)).as("n_hits"),
        sum(when($"same" && $"rk_all" <= $"shortlist", 1L)
          .otherwise(0L)).as("n_kept"))
      .select($"shortlist", $"n_probes", $"n_truth", $"n_hits", $"n_kept",
        Num.roundAt($"n_hits".cast(DoubleType) /
          $"n_truth".cast(DoubleType), 6).as("mean_recall"),
        Num.roundAt($"n_kept".cast(DoubleType) /
          $"n_probes".cast(DoubleType), 6).as("mean_kept"))
      .orderBy($"shortlist")
  }

  // ---------------------------------------------------------------------
  // q304: centroid-silhouette census — the clustering-quality readout
  // over the label partition (q160 measures purity = "does the nearest
  // centroid agree with the label"; silhouette measures SEPARATION:
  // s = (b − a)/max(a, b) with a = distance to the own-label centroid,
  // b = distance to the nearest OTHER centroid — the standard pre-flight
  // before trusting labels as IVF cells (q49) or semantic-dedup strata
  // (q113)). Centroid variant, not pairwise: the classical all-pairs
  // silhouette is O(n²) and tells the same separation story at cluster
  // granularity. Determinism: coordinates freeze to micro-units at the
  // scan (q261 rule), centroids are integer-division means of exact
  // coordinate sums (Spark `div` ≡ DuckDB `//`, both truncate toward
  // zero), squared distances are exact int64 folds; the two sqrts and
  // one division per point are a fixed IEEE sequence, re-frozen to
  // micro before the per-label mean so no float crosses a reduction.
  // Scale shape: one posexplode pass to the |labels|×64 centroid
  // census (bounded collect), one scored scan with the centroid matrix
  // as plan literals (the q49/q160 broadcast-codebook shape),
  // |labels|-row output.
  private def silhouetteCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        transform(toDoubleArr($"embedding"),
          x => floor(x * lit(1e6)).cast(LongType)).as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents: Seq[(Int, Seq[Long])] = e
      .select($"label", posexplode($"v"))
      .groupBy($"label", $"pos")
      .agg(sum($"col").as("sx"), count(lit(1)).as("cnt"))
      .select($"label", $"pos", expr("sx div cnt").as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (l, rows) => l -> rows.sortBy(_._2).map(_._3).toSeq }
      .sortBy(_._1)
    // label-ordered array of exact squared distances; labels are dense
    // 0..k-1 (q160's element_at contract), so own = element_at(lbl+1)
    val d2s = array(cents.map { case (_, c) =>
      aggregate(
        zip_with($"v", typedlit(c), (x, cc) => (x - cc) * (x - cc)),
        lit(0L), (acc, x) => acc + x)
    }: _*)
    val scored = e.withColumn("d2", d2s)
      .withColumn("a", sqrt(element_at($"d2", $"label" + 1).cast(DoubleType)))
      .withColumn("b", sqrt(array_min(zip_with($"d2",
          sequence(lit(0), lit(cents.length - 1)),
          (d, i) => when(i === $"label", lit(null)).otherwise(d)))
        .cast(DoubleType)))
      .withColumn("sil",
        floor(($"b" - $"a") / greatest($"a", $"b") * lit(1e6)).cast(LongType))
    scored.groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"sil").as("ssil"),
        sum(floor($"a" * lit(1e6)).cast(LongType)).as("sa"),
        sum(floor($"b" * lit(1e6)).cast(LongType)).as("sb"))
      .select($"label", $"n_vecs",
        Num.roundAt($"ssil".cast(DoubleType) /
          $"n_vecs".cast(DoubleType) / lit(1e6), 6).as("mean_silhouette"),
        Num.roundAt($"sa".cast(DoubleType) /
          $"n_vecs".cast(DoubleType) / lit(1e6), 6).as("mean_dist_own"),
        Num.roundAt($"sb".cast(DoubleType) /
          $"n_vecs".cast(DoubleType) / lit(1e6), 6).as("mean_dist_other"))
      .orderBy($"label")
  }

  // ---------------------------------------------------------------------
  // q305: IVF nprobe sweep — the tuning harness q178 is for LSH band
  // geometry, pointed at the IVF knob: the same cell index read at
  // nprobe ∈ {1, 2, 4}, each point priced in candidate volume vs exact
  // recall@10 (summed hits over summed truth — exact integers, one
  // division per row). Probing is NESTED (a probe's nprobe=1 cell set ⊂
  // its nprobe=2 set ⊂ 4), so ONE scored candidate pass at nprobe=4
  // carries the whole sweep: each (probe, cand) keeps the MINIMUM cell
  // rank that reached it, and smaller-nprobe results are rank filters
  // over the persisted scored frame — three windows, zero re-scoring
  // (the q178/q260 one-pass-sweep pattern). Ground truth is the q146
  // brute pass, computed once. Scale shape: cell assignment is a
  // codebook-literal map stage, candidates are bucket-equi-join
  // occupancy, the sweep adds only bounded window work.
  private def nprobeSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.storage.StorageLevel
    val all = base(s, dir)
    val centRows = naiveCodebook(s, dir)
    val scoredCells = array(centRows.map { case (cid, cv, cn) =>
      struct(
        (call_function("fold_dot", $"v", typedlit(cv)) / ($"nrm" * lit(cn))).as("ccos"),
        lit(-cid).as("negcid"))
    }: _*)
    val withCells = all.withColumn("cells", reverse(array_sort(scoredCells)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val assign = withCells
      .select($"vec_id".as("cand_id"), (-$"cells"(0)("negcid")).as("cell"),
        $"v".as("cv2"), $"nrm".as("cn2"))
    val probeCells = withCells
      .filter($"vec_id" >= 20 && $"vec_id" < 40)
      .select($"vec_id".as("probe_id"), posexplode(slice($"cells", 1, 4)),
        $"v".as("pv"), $"nrm".as("pn"))
      .select($"probe_id", ($"pos" + 1).as("crank"),
        (-$"col"("negcid")).as("cell"), $"pv", $"pn")
    val scored = probeCells.join(assign, Seq("cell"))
      .filter($"probe_id" =!= $"cand_id")
      .withColumn("c", expr("fold_dot(pv, cv2)") / ($"pn" * $"cn2"))
      .groupBy($"probe_id", $"cand_id")
      .agg(max($"c").as("cos"), min($"crank").as("crank"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wTop = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"cand_id".asc)
    val probes = all.filter($"vec_id" >= 20 && $"vec_id" < 40)
      .select($"vec_id".as("probe_id"), $"v".as("pv"), $"nrm".as("pn"))
    val exact = all.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .withColumn("cos", expr("fold_dot(pv, v)") / ($"pn" * $"nrm"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id".asc)))
      .filter($"rank" <= 10)
      .select($"probe_id", $"vec_id".as("cand_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val exn = exact.agg(count(lit(1)).as("n_exact"))
    nps.map { np =>
      val cand = scored.filter($"crank" <= np)
      val topk = cand
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= 10)
        .select($"probe_id", $"cand_id")
      val hits = topk.join(exact, Seq("probe_id", "cand_id"))
        .agg(count(lit(1)).as("n_hit"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(hits).crossJoin(exn)
        .select(lit(np.toLong).as("nprobe"), $"n_candidates", $"n_hit",
          $"n_exact",
          Num.roundAt($"n_hit".cast(DoubleType) /
            $"n_exact".cast(DoubleType), 6).as("recall_at_10"))
    }.reduce(_ unionAll _).orderBy($"nprobe")
  }

  private val nps = Seq(1, 2, 4)

  /** Driver-side twin of Det.h7 (first 7 md5 hex chars as an int) — for
    * deterministic constants computed once on the driver and shipped as
    * plan literals; java MessageDigest md5 ≡ Spark md5 ≡ DuckDB md5.
    */
  private def h7Driver(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---------------------------------------------------------------------
  // q311: Johnson–Lindenstrauss projection-distortion census — the
  // dimensionality-reduction harness beside q215's Matryoshka
  // truncation: q215 keeps PREFIX dims (needs a Matryoshka-trained
  // encoder); JL projects through a random ±1 sign matrix and works on
  // ANY embedding, with the lemma's guarantee that k=16 preserves
  // pairwise distance in expectation (E[‖R(x−y)‖²/k] = ‖x−y‖²). The
  // census measures the realized distortion ratio over 100 fixed pairs
  // — the decision input before an ANN tier runs at k=16 instead of 64.
  // Determinism: coordinates micro-frozen; the 16×64 sign matrix
  // derives from md5 (h7("jl:r:d") parity — computed ONCE on the
  // driver, shipped as literals; same md5 in DuckDB); projections are
  // exact int64 folds, each pair's ratio is one IEEE division frozen
  // to micro before the census reduction. Scale shape: projection is a
  // per-row map (16 codegen'd folds); the pair census is a bounded
  // key-arithmetic self-join, never all-pairs.
  private def jlDistortion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 16
    val signs: Seq[Seq[Long]] = (0 until K).map(r =>
      (0 until 64).map(d => if (h7Driver(s"jl:$r:$d") % 2L == 0L) 1L else -1L))
    val e = Tables.embeddings(s, dir)
      .select($"vec_id", $"label",
        transform(toDoubleArr($"embedding"),
          x => floor(x * lit(1e6)).cast(org.apache.spark.sql.types.LongType))
          .as("v"))
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
    val proj = e.withColumn("p", array(signs.map(row =>
      aggregate(zip_with($"v", typedlit(row), (x, sg) => x * sg),
        lit(0L), (acc, x) => acc + x)): _*))
    val a = proj.filter($"vec_id" < 100)
      .select($"vec_id".as("ida"), $"v".as("va"), $"p".as("pa"))
    val b = proj.select(($"vec_id" - 100L).as("ida"),
      $"v".as("vb"), $"p".as("pb"))
    val pairs = a.join(b, Seq("ida"))
      .withColumn("d64", aggregate(zip_with($"va", $"vb",
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
      .withColumn("d16", aggregate(zip_with($"pa", $"pb",
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
      .filter($"d64" > 0L)
      // realized/expected ratio, micro-frozen before any reduction
      .withColumn("ratio_micro", floor($"d16".cast(DoubleType) /
        (lit(K.toDouble) * $"d64".cast(DoubleType)) * lit(1e6))
        .cast(org.apache.spark.sql.types.LongType))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum($"ratio_micro").as("sr"),
        min($"ratio_micro").as("mn"), max($"ratio_micro").as("mx"),
        sum(when($"ratio_micro" >= 700000L && $"ratio_micro" <= 1300000L,
          1L).otherwise(0L)).as("n_within_30pct"))
      .select($"n_pairs",
        Num.roundAt($"sr".cast(DoubleType) / $"n_pairs".cast(DoubleType)
          / lit(1e6), 6).as("mean_ratio"),
        Num.roundAt($"mn".cast(DoubleType) / lit(1e6), 6).as("min_ratio"),
        Num.roundAt($"mx".cast(DoubleType) / lit(1e6), 6).as("max_ratio"),
        Num.roundAt($"n_within_30pct".cast(DoubleType) /
          $"n_pairs".cast(DoubleType), 6).as("frac_within_30pct"))
  }

  // ---------------------------------------------------------------------
  // q317: leave-one-out 1-NN label accuracy — the label-quality gate
  // run BEFORE labels seed anything (q49's IVF cells, q113's semantic
  // dedup strata, q281's hard-negative mining): if a point's nearest
  // neighbor disagrees with its label much more often than the label
  // marginals predict, the labels are noisy (the Confident-Learning
  // premise read through geometry). LOO 1-NN over a deterministic
  // 200-vector subset (the q249 bounded-subset precedent; at data
  // scale the subset self-join swaps for the q28/q49 candidate
  // generators): per label — n, LOO-correct count, accuracy, plus the
  // label's share of the subset (the chance-rate baseline the accuracy
  // must beat). Cosines are the Det fold, ties break on cand_id asc,
  // so the neighbor choice is deterministic and the census
  // hash-compares. Scale shape: bounded self-join, one ranking window
  // over per-probe candidates, |labels|-row census.
  private def looLabelAccuracy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sub = base(s, dir).filter($"vec_id" < 200)
      .join(Tables.embeddings(s, dir).select($"vec_id", $"label"),
        Seq("vec_id"))
      .select($"vec_id", $"label", $"v", $"nrm")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nn = sub.toDF("a_id", "a_lbl", "av", "an")
      .join(sub.toDF("b_id", "b_lbl", "bv", "bn"), $"a_id" =!= $"b_id")
      .withColumn("cos", expr("fold_dot(av, bv)") / ($"an" * $"bn"))
      .withColumn("rk", row_number().over(Window.partitionBy($"a_id")
        .orderBy($"cos".desc, $"b_id".asc)))
      .filter($"rk" === 1)
      .select($"a_id", $"a_lbl", $"b_lbl")
    val tot = nn.agg(count(lit(1)).as("n_sub"))
    nn.groupBy($"a_lbl".as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when($"a_lbl" === $"b_lbl", 1L).otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(tot))
      .select($"label", $"n", $"n_correct",
        Num.roundAt($"n_correct".cast(DoubleType) / $"n".cast(DoubleType), 6)
          .as("loo_accuracy"),
        Num.roundAt($"n".cast(DoubleType) / $"n_sub".cast(DoubleType), 6)
          .as("chance_rate"))
      .orderBy($"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q317_loo_label_accuracy" -> (looLabelAccuracy _),
    "q311_jl_distortion" -> (jlDistortion _),
    "q305_nprobe_sweep" -> (nprobeSweep _),
    "q304_silhouette" -> (silhouetteCensus _),
    "q240_filtered_ann" -> (filteredAnn _),
    "q215_matryoshka_recall" -> (matryoshkaRecall _),
    "q198_class_separability" -> (classSeparability _),
    "q197_hard_negatives" -> (hardNegatives _),
    "q196_embedding_drift" -> (embeddingDrift _),
    "q173_quantization_error" -> (quantizationError _),
    "q172_multiprobe_lsh" -> (multiProbeLsh _),
    "q171_incremental_semdedup" -> (incrementalSemDedup _),
    "q160_centroid_purity" -> (centroidPurity _),
    "q164_rerank_ann" -> (rerankAnn _),
    "q93_pq_ann"      -> (pqAnn _),
    "q22_cosine_topk" -> (cosineTopK _),
    "q281_margin_census" -> (marginCensus _),
    "q249_mutual_knn" -> (mutualKnn _),
    "q261_anisotropy" -> (anisotropyCensus _),
    "q28_lsh_ann"     -> (lshAnn _),
    "q49_ivf_ann"     -> (ivfAnn _),
    "q146_ann_recall" -> (annRecall _),
    "q61_kmeans_step" -> (kmeansStep _)
  )

  private val nSql =
    """n AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         sqrt(list_reduce(list_transform(range(1, 65),
      |                i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
      |              (x, y) -> x + y)) AS nrm
      |  FROM embeddings)""".stripMargin

  /** q215 per-width ranked-top-10 CTE (probe-broadcast brute scan). */
  private def mrlTopSql(d: Int): String =
    s"""t$d AS (
       |  SELECT $d AS dim_budget, probe_id, vec_id FROM (
       |    SELECT p.probe_id, c.vec_id,
       |           row_number() OVER (PARTITION BY p.probe_id ORDER BY
       |             (list_reduce(list_transform(range(1, ${d + 1}),
       |                i -> p.pv[CAST(i AS INTEGER)] * c.vd[CAST(i AS INTEGER)]),
       |               (x, y) -> x + y) / (p.pn * c.nrm)) DESC,
       |             c.vec_id) AS r
       |    FROM p$d p JOIN s$d c ON c.vec_id <> p.probe_id)
       |  WHERE r <= 10)""".stripMargin

  private def mrlSliceSql(d: Int): String =
    s"""s$d AS (
       |  SELECT vec_id, vd,
       |         sqrt(list_reduce(list_transform(range(1, ${d + 1}),
       |                i -> vd[CAST(i AS INTEGER)] * vd[CAST(i AS INTEGER)]),
       |              (x, y) -> x + y)) AS nrm
       |  FROM (SELECT vec_id,
       |          list_transform(embedding[1 : $d],
       |            x -> CAST(x AS DOUBLE)) AS vd
       |        FROM embeddings)),
       |p$d AS (
       |  SELECT vec_id AS probe_id, vd AS pv, nrm AS pn
       |  FROM s$d WHERE vec_id < 20)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q317_loo_label_accuracy" ->
      s"""WITH $nSql,
        |sub AS (
        |  SELECT n.vec_id, e.label, n.v, n.nrm
        |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id
        |  WHERE n.vec_id < 200),
        |sc AS (
        |  SELECT a.vec_id AS a_id, a.label AS a_lbl, b.label AS b_lbl,
        |         b.vec_id AS b_id,
        |         list_reduce(list_transform(range(1, 65),
        |           i -> a.v[i] * b.v[i]), (x, y) -> x + y)
        |           / (a.nrm * b.nrm) AS cos
        |  FROM sub a JOIN sub b ON a.vec_id != b.vec_id),
        |nn AS (
        |  SELECT a_id, a_lbl, b_lbl FROM (
        |    SELECT a_id, a_lbl, b_lbl,
        |           row_number() OVER (PARTITION BY a_id
        |             ORDER BY cos DESC, b_id ASC) AS rk
        |    FROM sc)
        |  WHERE rk = 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sub FROM nn)
        |SELECT a_lbl AS label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN a_lbl = b_lbl THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct,
        |  round(CAST(sum(CASE WHEN a_lbl = b_lbl THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS loo_accuracy,
        |  round(CAST(count(*) AS DOUBLE) / CAST(n_sub AS DOUBLE), 6)
        |    AS chance_rate
        |FROM nn, tot GROUP BY a_lbl, n_sub ORDER BY label""".stripMargin,

    "q311_jl_distortion" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
        |  FROM embeddings),
        |rd AS (SELECT r, d,
        |    CASE WHEN CAST(concat('0x', substring(md5(
        |        'jl:' || CAST(r AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
        |        1, 7)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sg
        |  FROM (SELECT unnest(generate_series(0, 15)) AS r),
        |       (SELECT unnest(generate_series(0, 63)) AS d)),
        |proj AS (SELECT vec_id, r, CAST(sum(sg * v[d + 1]) AS BIGINT) AS pr
        |  FROM e, rd GROUP BY 1, 2),
        |p0 AS (SELECT a.vec_id AS ida, a.v AS va, b.v AS vb
        |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 100
        |  WHERE a.vec_id < 100),
        |dd64 AS (SELECT ida, CAST(list_reduce(list_transform(range(1, 65),
        |      i -> (va[i] - vb[i]) * (va[i] - vb[i])), (x, y) -> x + y)
        |    AS BIGINT) AS d64 FROM p0),
        |dd16 AS (SELECT pa.vec_id AS ida,
        |    CAST(sum((pa.pr - pb.pr) * (pa.pr - pb.pr)) AS BIGINT) AS d16
        |  FROM proj pa JOIN proj pb
        |    ON pb.vec_id = pa.vec_id + 100 AND pb.r = pa.r
        |  WHERE pa.vec_id < 100 GROUP BY 1),
        |rt AS (SELECT ida, CAST(floor(CAST(d16 AS DOUBLE)
        |      / (16.0 * CAST(d64 AS DOUBLE)) * 1e6) AS BIGINT) AS ratio_micro
        |  FROM dd64 JOIN dd16 USING (ida) WHERE d64 > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(ratio_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    / 1e6, 6) AS mean_ratio,
        |  round(CAST(min(ratio_micro) AS DOUBLE) / 1e6, 6) AS min_ratio,
        |  round(CAST(max(ratio_micro) AS DOUBLE) / 1e6, 6) AS max_ratio,
        |  round(CAST(sum(CASE WHEN ratio_micro BETWEEN 700000 AND 1300000
        |      THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS frac_within_30pct
        |FROM rt""".stripMargin,

    "q305_nprobe_sweep" ->
      s"""WITH $nSql,
        |cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |aff AS (
        |  SELECT n.vec_id, cents.cent_id,
        |         list_reduce(list_transform(range(1, 65), i -> n.v[i] * cents.cv[i]),
        |           (x, y) -> x + y) / (n.nrm * cents.cn) AS ccos
        |  FROM n, cents),
        |ranked_aff AS (
        |  SELECT vec_id, cent_id,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY ccos DESC, cent_id ASC) AS crank
        |  FROM aff),
        |assign AS (
        |  SELECT vec_id AS cand_id, cent_id AS cell FROM ranked_aff WHERE crank = 1),
        |probes AS (
        |  SELECT vec_id AS probe_id, cent_id AS cell, crank FROM ranked_aff
        |  WHERE vec_id >= 20 AND vec_id < 40 AND crank <= 4),
        |ivf_scored AS (
        |  SELECT p.probe_id, a.cand_id,
        |         max(list_reduce(list_transform(range(1, 65), i -> pn.v[i] * cn2.v[i]),
        |           (x, y) -> x + y) / (pn.nrm * cn2.nrm)) AS cos,
        |         min(p.crank) AS crank
        |  FROM probes p
        |  JOIN assign a ON a.cell = p.cell AND a.cand_id != p.probe_id
        |  JOIN n pn ON pn.vec_id = p.probe_id
        |  JOIN n cn2 ON cn2.vec_id = a.cand_id
        |  GROUP BY p.probe_id, a.cand_id),
        |nps AS (SELECT unnest([1, 2, 4]) AS np),
        |cand AS (
        |  SELECT np, probe_id, cand_id, cos FROM ivf_scored, nps
        |  WHERE crank <= np),
        |ivf AS (
        |  SELECT np, probe_id, cand_id FROM (
        |    SELECT np, probe_id, cand_id,
        |           row_number() OVER (PARTITION BY np, probe_id
        |             ORDER BY cos DESC, cand_id ASC) AS rank
        |    FROM cand)
        |  WHERE rank <= 10),
        |exact_scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         list_reduce(list_transform(range(1, 65), i -> p.v[i] * c.v[i]),
        |           (x, y) -> x + y) / (p.nrm * c.nrm) AS cos
        |  FROM n p JOIN n c
        |    ON p.vec_id >= 20 AND p.vec_id < 40 AND c.vec_id != p.vec_id),
        |exact AS (
        |  SELECT probe_id, cand_id FROM (
        |    SELECT probe_id, cand_id,
        |           row_number() OVER (PARTITION BY probe_id
        |             ORDER BY cos DESC, cand_id ASC) AS rank
        |    FROM exact_scored)
        |  WHERE rank <= 10),
        |exn AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM exact),
        |nc AS (SELECT np, CAST(count(*) AS BIGINT) AS n_candidates
        |      FROM cand GROUP BY 1),
        |hit AS (
        |  SELECT i.np, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM ivf i JOIN exact e
        |    ON e.probe_id = i.probe_id AND e.cand_id = i.cand_id
        |  GROUP BY 1)
        |SELECT CAST(nc.np AS BIGINT) AS nprobe, n_candidates,
        |  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit, n_exact,
        |  round(CAST(coalesce(n_hit, 0) AS DOUBLE)
        |    / CAST(n_exact AS DOUBLE), 6) AS recall_at_10
        |FROM nc LEFT JOIN hit ON hit.np = nc.np, exn
        |ORDER BY nprobe""".stripMargin,

    "q304_silhouette" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
        |  FROM embeddings),
        |px AS (SELECT label, i, v[i] AS x
        |      FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)),
        |cent AS (SELECT label, i, CAST(sum(x) // count(*) AS BIGINT) AS c
        |      FROM px GROUP BY 1, 2),
        |carr AS (SELECT label AS clbl, list(c ORDER BY i) AS cv
        |      FROM cent GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label, carr.clbl,
        |        list_reduce(list_transform(range(1, 65),
        |          i -> (v[i] - cv[i]) * (v[i] - cv[i])), (x, y) -> x + y) AS d2
        |      FROM e CROSS JOIN carr),
        |ab AS (SELECT vec_id, label,
        |        sqrt(CAST(max(CASE WHEN clbl = label THEN d2 END) AS DOUBLE))
        |          AS a,
        |        sqrt(CAST(min(CASE WHEN clbl <> label THEN d2 END) AS DOUBLE))
        |          AS b
        |      FROM d GROUP BY 1, 2),
        |sil AS (SELECT label,
        |        CAST(floor((b - a) / greatest(a, b) * 1e6) AS BIGINT) AS sil,
        |        CAST(floor(a * 1e6) AS BIGINT) AS am,
        |        CAST(floor(b * 1e6) AS BIGINT) AS bm
        |      FROM ab)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(CAST(sum(sil) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6)
        |    AS mean_silhouette,
        |  round(CAST(sum(am) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6)
        |    AS mean_dist_own,
        |  round(CAST(sum(bm) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6, 6)
        |    AS mean_dist_other
        |FROM sil GROUP BY label ORDER BY label""".stripMargin,
    "q215_matryoshka_recall" ->
      s"""WITH ${mrlSliceSql(16)},
        |${mrlSliceSql(32)},
        |${mrlSliceSql(64)},
        |${mrlTopSql(16)},
        |${mrlTopSql(32)},
        |${mrlTopSql(64)},
        |truth AS (SELECT probe_id, vec_id, CAST(1 AS BIGINT) AS hit
        |          FROM t64),
        |u AS (SELECT * FROM t16 UNION ALL SELECT * FROM t32
        |      UNION ALL SELECT * FROM t64),
        |perp AS (
        |  SELECT u.dim_budget, u.probe_id,
        |         CAST(sum(coalesce(t.hit, 0)) AS BIGINT) AS nh
        |  FROM u LEFT JOIN truth t
        |    ON t.probe_id = u.probe_id AND t.vec_id = u.vec_id
        |  GROUP BY 1, 2)
        |SELECT dim_budget, CAST(count(*) AS BIGINT) AS n_probes,
        |       CAST(sum(nh) AS BIGINT) AS n_hits,
        |       round(CAST(sum(nh) AS DOUBLE)
        |         / (10.0 * CAST(count(*) AS DOUBLE)), 6) AS mean_recall_at10
        |FROM perp GROUP BY 1 ORDER BY 1""".stripMargin,
    "q198_class_separability" ->
      """WITH e AS (
        |  SELECT label, CAST(i - 1 AS INTEGER) AS dim,
        |         CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
        |             * 10000.0) AS BIGINT) AS q
        |  FROM embeddings, unnest(range(1, 65)) t(i)),
        |cls AS (
        |  SELECT dim, label, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS s1,
        |         CAST(sum(q * q) AS BIGINT) AS s2
        |  FROM e GROUP BY 1, 2),
        |ct AS (
        |  SELECT dim, label, n, s1, s2,
        |         CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |           / CAST(n AS DOUBLE) AS term
        |  FROM cls),
        |d AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n_classes,
        |         CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s1) AS BIGINT) AS t1,
        |         CAST(sum(s2) AS BIGINT) AS t2,
        |         list(term ORDER BY label) AS ts
        |  FROM ct GROUP BY 1),
        |f AS (
        |  SELECT dim, n_classes,
        |         list_reduce(list_prepend(0.0::DOUBLE, ts),
        |           (a, x) -> a + x) AS ssw,
        |         CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
        |           / CAST(nn AS DOUBLE) AS sst
        |  FROM d)
        |SELECT dim, n_classes,
        |       round((sst - ssw) / 100000000.0, 6) AS ss_between,
        |       round(ssw / 100000000.0, 6) AS ss_within,
        |       round((sst - ssw) / ssw, 6) AS fisher_ratio
        |FROM f ORDER BY dim""".stripMargin,
    "q197_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         sqrt(list_reduce(list_transform(range(1, 65),
        |                i -> CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
        |                     * CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |              (x, y) -> x + y)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id AS probe_id, label AS plabel, v AS pv, nrm AS pn
        |  FROM e WHERE vec_id < 30),
        |pr AS (
        |  SELECT p.probe_id, p.plabel, c.label,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> p.pv[CAST(i AS INTEGER)] * c.v[CAST(i AS INTEGER)]),
        |           (x, y) -> x + y) / (p.pn * c.nrm) AS cos
        |  FROM p JOIN e c ON c.vec_id <> p.probe_id),
        |per AS (
        |  SELECT probe_id, plabel,
        |         max(CASE WHEN label <> plabel THEN cos END) AS hn_cos,
        |         max(CASE WHEN label = plabel THEN cos END) AS pp_cos
        |  FROM pr GROUP BY 1, 2)
        |SELECT plabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
        |       round(CAST(sum(CAST(floor(hn_cos * 1000000000.0) AS BIGINT))
        |           AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0, 6)
        |         AS mean_hard_neg_cos,
        |       round(CAST(sum(CAST(floor(pp_cos * 1000000000.0) AS BIGINT))
        |           AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0, 6)
        |         AS mean_nearest_pos_cos,
        |       round(CAST(sum(CAST(floor((pp_cos - hn_cos) * 1000000000.0)
        |             AS BIGINT))
        |           AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0, 6)
        |         AS mean_margin,
        |       CAST(sum(CASE WHEN hn_cos >= pp_cos THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_violations
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q196_embedding_drift" ->
      """WITH e AS (
        |  SELECT (label < 5) AS grp, CAST(i - 1 AS INTEGER) AS dim,
        |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, 65)) t(i)),
        |b AS (
        |  SELECT grp, dim,
        |         greatest(-6, least(5, CAST(floor(x * 10) AS BIGINT))) AS bin
        |  FROM e),
        |c AS (
        |  SELECT dim, bin,
        |         CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(sum(CASE WHEN label < 5 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |         CAST(sum(CASE WHEN label >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM embeddings),
        |grid AS (
        |  SELECT CAST(d AS INTEGER) AS dim, CAST(bn AS BIGINT) AS bin
        |  FROM unnest(range(0, 64)) g(d), unnest(range(-6, 6)) h(bn)),
        |f AS (
        |  SELECT g.dim, g.bin, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM grid g LEFT JOIN c ON c.dim = g.dim AND c.bin = g.bin),
        |t2 AS (
        |  SELECT dim, bin,
        |         ((ca + 0.5) / (na + 6.0) - (cb + 0.5) / (nb + 6.0))
        |           * ln(((ca + 0.5) / (na + 6.0)) / ((cb + 0.5) / (nb + 6.0)))
        |           AS term
        |  FROM f, tot),
        |d AS (SELECT dim, list(term ORDER BY bin) AS ts FROM t2 GROUP BY 1)
        |SELECT dim,
        |       round(list_reduce(list_prepend(0.0::DOUBLE, ts),
        |                         (a, x) -> a + x), 6) AS psi
        |FROM d ORDER BY dim""".stripMargin,
    "q173_quantization_error" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, label, v,
        |         CASE WHEN list_reduce(list_transform(v, x -> abs(x)),
        |                (a, x) -> greatest(a, x)) = 0.0 THEN 1.0
        |              ELSE list_reduce(list_transform(v, x -> abs(x)),
        |                (a, x) -> greatest(a, x)) END AS mx
        |  FROM v),
        |d AS (
        |  SELECT vec_id, label, v, mx,
        |         list_transform(v, x -> floor(x / mx * 127.0) * mx / 127.0)
        |           AS dq
        |  FROM m),
        |sc AS (
        |  SELECT label,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> v[i] * dq[i]), (a, x) -> a + x)
        |           / (sqrt(list_reduce(list_transform(v, x -> x * x),
        |                (a, x) -> a + x))
        |              * sqrt(list_reduce(list_transform(dq, x -> x * x),
        |                (a, x) -> a + x))) AS cosq,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> abs(v[i] - dq[i])), (a, x) -> greatest(a, x))
        |           AS maxerr
        |  FROM d)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       round(CAST(sum(CAST(floor(cosq * 1000000000.0) AS BIGINT))
        |           AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000000.0, 6)
        |         AS mean_cos_after_quant,
        |       round(max(maxerr), 6) AS worst_abs_err
        |FROM sc GROUP BY label ORDER BY label""".stripMargin,
    "q172_multiprobe_lsh" ->
      s"""WITH $nSql,
        |b AS (
        |  SELECT vec_id, t,
        |         list_aggregate(list_transform(range(0, 6), k ->
        |           CASE WHEN list_reduce(list_transform(range(1, 65), d ->
        |                  (CAST((((t*6+k)*64+d) * 2654435761) % 4294967296 AS DOUBLE)
        |                     / 2147483648.0 - 1.0) * v[d]),
        |                  (x, y) -> x + y) >= 0.0
        |                THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END),
        |           'sum') AS bk
        |  FROM n, (SELECT unnest(range(0, 4)) AS t)),
        |ps AS (SELECT vec_id AS probe_id, t, bk FROM b WHERE vec_id < 20),
        |pm AS (
        |  SELECT probe_id, t, unnest(list_concat([bk],
        |    list_transform(range(0, 6),
        |      f -> xor(bk, CAST(1 AS BIGINT) << f)))) AS bk
        |  FROM ps),
        |cs AS (SELECT vec_id AS cand_id, t, bk FROM b),
        |cand_s AS (
        |  SELECT DISTINCT probe_id, cand_id FROM ps JOIN cs USING (t, bk)
        |  WHERE probe_id != cand_id),
        |cand_m AS (
        |  SELECT DISTINCT probe_id, cand_id FROM pm JOIN cs USING (t, bk)
        |  WHERE probe_id != cand_id),
        |ex AS (
        |  SELECT probe_id, cand_id FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |           row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |             list_reduce(list_transform(range(1, 65),
        |               i -> p.v[i] * c.v[i]), (x, y) -> x + y)
        |               / (p.nrm * c.nrm) DESC,
        |             c.vec_id ASC) AS rank
        |    FROM n p JOIN n c ON p.vec_id < 20 AND c.vec_id != p.vec_id)
        |  WHERE rank <= 10),
        |cen1 AS (
        |  SELECT c.probe_id, CAST(count(*) AS BIGINT) AS n_cand_single,
        |         CAST(sum(CASE WHEN e.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_hit_single
        |  FROM cand_s c LEFT JOIN ex e
        |    ON e.probe_id = c.probe_id AND e.cand_id = c.cand_id
        |  GROUP BY 1),
        |cen2 AS (
        |  SELECT c.probe_id, CAST(count(*) AS BIGINT) AS n_cand_multi,
        |         CAST(sum(CASE WHEN e.cand_id IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_hit_multi
        |  FROM cand_m c LEFT JOIN ex e
        |    ON e.probe_id = c.probe_id AND e.cand_id = c.cand_id
        |  GROUP BY 1),
        |exn AS (
        |  SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM ex GROUP BY 1)
        |SELECT exn.probe_id, n_exact, n_cand_single, n_hit_single,
        |       round(CAST(n_hit_single AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
        |         AS recall_single,
        |       n_cand_multi, n_hit_multi,
        |       round(CAST(n_hit_multi AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
        |         AS recall_multi
        |FROM exn JOIN cen1 USING (probe_id) JOIN cen2 USING (probe_id)
        |ORDER BY probe_id""".stripMargin,
    "q171_incremental_semdedup" ->
      s"""WITH $nSql,
        |cents AS (
        |  SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |aff AS (
        |  SELECT n.vec_id, cents.cid,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> n.v[i] * cents.cv[i]), (a, x) -> a + x)
        |           / (n.nrm * cents.cn) AS ccos
        |  FROM n, cents),
        |assign AS (
        |  SELECT vec_id AS cand_id, cid AS cell FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
        |             ORDER BY ccos DESC, cid ASC) AS rn
        |    FROM aff) WHERE rn = 1),
        |arr AS (
        |  SELECT vec_id + 100000 AS arrival_id, v, nrm
        |  FROM n WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 200000 AS arrival_id,
        |         list_transform(v, x -> -x) AS v, nrm
        |  FROM n WHERE vec_id % 10 = 5),
        |aaff AS (
        |  SELECT a.arrival_id, c.cid, a.v, a.nrm,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> a.v[i] * c.cv[i]), (a2, x) -> a2 + x)
        |           / (a.nrm * c.cn) AS ccos
        |  FROM arr a, cents c),
        |acell AS (
        |  SELECT arrival_id, cid AS cell, v, nrm FROM (
        |    SELECT arrival_id, cid, v, nrm,
        |           row_number() OVER (PARTITION BY arrival_id
        |             ORDER BY ccos DESC, cid ASC) AS rn
        |    FROM aaff) WHERE rn <= 2),
        |sc AS (
        |  SELECT ac.arrival_id, s.cand_id,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> ac.v[i] * n2.v[i]), (a, x) -> a + x)
        |           / (ac.nrm * n2.nrm) AS cos
        |  FROM acell ac
        |  JOIN assign s ON s.cell = ac.cell
        |  JOIN n n2 ON n2.vec_id = s.cand_id),
        |b AS (
        |  SELECT arrival_id, cand_id, cos,
        |         CAST(count(*) OVER (PARTITION BY arrival_id) AS BIGINT)
        |           AS n_cand,
        |         row_number() OVER (PARTITION BY arrival_id
        |           ORDER BY cos DESC, cand_id ASC) AS rn
        |  FROM sc)
        |SELECT arrival_id, n_cand, cand_id AS best_match,
        |       round(cos, 6) AS best_cos, cos >= 0.98 AS is_dup
        |FROM b WHERE rn = 1 ORDER BY arrival_id""".stripMargin,
    "q160_centroid_purity" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sums AS (
        |  SELECT label, i,
        |         sum(CAST(floor(v[i] * 1000000.0) AS BIGINT)) AS s
        |  FROM v, range(1, 65) t(i) GROUP BY label, i),
        |cents AS (
        |  SELECT label AS clabel, list(CAST(s AS DOUBLE) ORDER BY i) AS cv
        |  FROM sums GROUP BY label),
        |cn AS (
        |  SELECT clabel, cv,
        |         sqrt(list_reduce(list_transform(cv, c -> c * c),
        |           (a, x) -> a + x)) AS cnrm
        |  FROM cents),
        |aff AS (
        |  SELECT v.vec_id, v.label, c.clabel,
        |         list_reduce(list_transform(range(1, 65),
        |             i -> v.v[i] * c.cv[i]), (a, x) -> a + x)
        |           / (sqrt(list_reduce(list_transform(v.v, x -> x * x),
        |                (a, x) -> a + x)) * c.cnrm) AS cos
        |  FROM v, cn c),
        |best AS (
        |  SELECT vec_id, label, clabel,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY cos DESC, clabel ASC) AS rn
        |  FROM aff),
        |own AS (
        |  SELECT vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS sc
        |  FROM aff WHERE clabel = label)
        |SELECT b.label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(CASE WHEN b.clabel = b.label THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_own,
        |       round(CAST(sum(CASE WHEN b.clabel = b.label THEN 1 ELSE 0 END)
        |           AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS purity,
        |       round(CAST(sum(o.sc) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         / 1000000.0, 6) AS mean_own_cos
        |FROM best b JOIN own o ON o.vec_id = b.vec_id
        |WHERE b.rn = 1
        |GROUP BY b.label ORDER BY b.label""".stripMargin,
    "q146_ann_recall" ->
      s"""WITH $nSql,
        |cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |aff AS (
        |  SELECT n.vec_id, cents.cent_id,
        |         list_reduce(list_transform(range(1, 65), i -> n.v[i] * cents.cv[i]),
        |           (x, y) -> x + y) / (n.nrm * cents.cn) AS ccos
        |  FROM n, cents),
        |ranked_aff AS (
        |  SELECT vec_id, cent_id, ccos,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY ccos DESC, cent_id ASC) AS crank
        |  FROM aff),
        |assign AS (
        |  SELECT vec_id AS cand_id, cent_id AS cell FROM ranked_aff WHERE crank = 1),
        |probes AS (
        |  SELECT vec_id AS probe_id, cent_id AS cell FROM ranked_aff
        |  WHERE vec_id >= 20 AND vec_id < 40 AND crank <= 2),
        |ivf_scored AS (
        |  SELECT p.probe_id, a.cand_id,
        |         max(list_reduce(list_transform(range(1, 65), i -> pn.v[i] * cn2.v[i]),
        |           (x, y) -> x + y) / (pn.nrm * cn2.nrm)) AS cos
        |  FROM probes p
        |  JOIN assign a ON a.cell = p.cell AND a.cand_id != p.probe_id
        |  JOIN n pn ON pn.vec_id = p.probe_id
        |  JOIN n cn2 ON cn2.vec_id = a.cand_id
        |  GROUP BY p.probe_id, a.cand_id),
        |ivf AS (
        |  SELECT probe_id, cand_id FROM (
        |    SELECT probe_id, cand_id,
        |           row_number() OVER (PARTITION BY probe_id
        |             ORDER BY cos DESC, cand_id ASC) AS rank
        |    FROM ivf_scored)
        |  WHERE rank <= 10),
        |exact_scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |         list_reduce(list_transform(range(1, 65), i -> p.v[i] * c.v[i]),
        |           (x, y) -> x + y) / (p.nrm * c.nrm) AS cos
        |  FROM n p JOIN n c
        |    ON p.vec_id >= 20 AND p.vec_id < 40 AND c.vec_id != p.vec_id),
        |exact AS (
        |  SELECT probe_id, cand_id FROM (
        |    SELECT probe_id, cand_id,
        |           row_number() OVER (PARTITION BY probe_id
        |             ORDER BY cos DESC, cand_id ASC) AS rank
        |    FROM exact_scored)
        |  WHERE rank <= 10),
        |hit AS (
        |  SELECT e.probe_id, CAST(count(*) AS BIGINT) AS n_hit
        |  FROM exact e JOIN ivf i
        |    ON e.probe_id = i.probe_id AND e.cand_id = i.cand_id
        |  GROUP BY 1),
        |ex AS (
        |  SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM exact GROUP BY 1)
        |SELECT ex.probe_id, ex.n_exact,
        |       coalesce(hit.n_hit, 0) AS n_hit,
        |       round(CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / ex.n_exact, 6) AS recall
        |FROM ex LEFT JOIN hit ON ex.probe_id = hit.probe_id
        |ORDER BY ex.probe_id""".stripMargin,
    "q164_rerank_ann" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, j, v[8*j+1 : 8*j+8] AS s
        |  FROM v, (SELECT unnest(range(8)) AS j)),
        |cent AS (SELECT vec_id AS cid, j, s AS c FROM sv WHERE vec_id < 16),
        |enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT s.vec_id, s.j, c.cid,
        |           row_number() OVER (PARTITION BY s.vec_id, s.j
        |             ORDER BY list_reduce(list_transform(range(1, 9),
        |               d -> (s.s[d] - c.c[d]) * (s.s[d] - c.c[d])),
        |               (x, y) -> x + y), c.cid) AS rn
        |    FROM sv s JOIN cent c ON s.j = c.j)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT p.vec_id AS probe_id, p.j, c.cid,
        |         list_reduce(list_transform(range(1, 9),
        |           d -> (p.s[d] - c.c[d]) * (p.s[d] - c.c[d])),
        |           (x, y) -> x + y) AS pd2
        |  FROM sv p JOIN cent c ON p.j = c.j
        |  WHERE p.vec_id BETWEEN 40 AND 44),
        |adcj AS (
        |  SELECT l.probe_id, e.vec_id, e.j, l.pd2
        |  FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.cid),
        |adc AS (
        |  SELECT probe_id, vec_id,
        |         max(CASE WHEN j=0 THEN pd2 END) + max(CASE WHEN j=1 THEN pd2 END)
        |       + max(CASE WHEN j=2 THEN pd2 END) + max(CASE WHEN j=3 THEN pd2 END)
        |       + max(CASE WHEN j=4 THEN pd2 END) + max(CASE WHEN j=5 THEN pd2 END)
        |       + max(CASE WHEN j=6 THEN pd2 END) + max(CASE WHEN j=7 THEN pd2 END) AS adc
        |  FROM adcj WHERE vec_id <> probe_id GROUP BY 1, 2),
        |short AS (
        |  SELECT probe_id, vec_id, adc,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY adc, vec_id) AS INTEGER) AS adc_rank
        |  FROM adc),
        |ex AS (
        |  SELECT c.probe_id, c.vec_id, c.adc, c.adc_rank,
        |         list_reduce(list_transform(range(1, 65),
        |           d -> (p.v[d] - q.v[d]) * (p.v[d] - q.v[d])),
        |           (x, y) -> x + y) AS d2
        |  FROM short c
        |  JOIN v p ON p.vec_id = c.probe_id
        |  JOIN v q ON q.vec_id = c.vec_id
        |  WHERE c.adc_rank <= 20),
        |r AS (
        |  SELECT probe_id, vec_id, d2, adc, adc_rank,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY d2, vec_id) AS INTEGER) AS rank
        |  FROM ex)
        |SELECT probe_id, vec_id AS neighbor_id, rank,
        |       round(d2, 6) AS d2, round(adc, 6) AS adc_d2, adc_rank
        |FROM r WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "q93_pq_ann" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sv AS (
        |  SELECT vec_id, j, v[8*j+1 : 8*j+8] AS s
        |  FROM v, (SELECT unnest(range(8)) AS j)),
        |cent AS (SELECT vec_id AS cid, j, s AS c FROM sv WHERE vec_id < 16),
        |enc AS (
        |  SELECT vec_id, j, cid AS code FROM (
        |    SELECT s.vec_id, s.j, c.cid,
        |           row_number() OVER (PARTITION BY s.vec_id, s.j
        |             ORDER BY list_reduce(list_transform(range(1, 9),
        |               d -> (s.s[d] - c.c[d]) * (s.s[d] - c.c[d])),
        |               (x, y) -> x + y), c.cid) AS rn
        |    FROM sv s JOIN cent c ON s.j = c.j)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT p.vec_id AS probe_id, p.j, c.cid,
        |         list_reduce(list_transform(range(1, 9),
        |           d -> (p.s[d] - c.c[d]) * (p.s[d] - c.c[d])),
        |           (x, y) -> x + y) AS pd2
        |  FROM sv p JOIN cent c ON p.j = c.j
        |  WHERE p.vec_id BETWEEN 40 AND 44),
        |adcj AS (
        |  SELECT l.probe_id, e.vec_id, e.j, l.pd2
        |  FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.cid),
        |adc AS (
        |  SELECT probe_id, vec_id,
        |         max(CASE WHEN j=0 THEN pd2 END) + max(CASE WHEN j=1 THEN pd2 END)
        |       + max(CASE WHEN j=2 THEN pd2 END) + max(CASE WHEN j=3 THEN pd2 END)
        |       + max(CASE WHEN j=4 THEN pd2 END) + max(CASE WHEN j=5 THEN pd2 END)
        |       + max(CASE WHEN j=6 THEN pd2 END) + max(CASE WHEN j=7 THEN pd2 END) AS adc
        |  FROM adcj WHERE vec_id <> probe_id GROUP BY 1, 2),
        |r AS (
        |  SELECT probe_id, vec_id,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY adc, vec_id) AS INTEGER) AS rank, adc
        |  FROM adc)
        |SELECT probe_id, vec_id AS neighbor_id, rank, round(adc, 6) AS adc_d2
        |FROM r WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin,
    "q240_filtered_ann" ->
      s"""WITH n AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         sqrt(list_reduce(list_transform(range(1, 65),
        |                i -> CAST(embedding[i] AS DOUBLE)
        |                  * CAST(embedding[i] AS DOUBLE)),
        |              (x, y) -> x + y)) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id,
        |         (c.label = p.label) AS same,
        |         list_reduce(list_transform(range(1, 65),
        |           i -> p.v[i] * c.v[i]), (x, y) -> x + y)
        |           / (p.nrm * c.nrm) AS cos
        |  FROM n p JOIN n c ON p.vec_id < 20 AND c.vec_id != p.vec_id),
        |ranked AS (
        |  SELECT probe_id, vec_id, same,
        |         row_number() OVER (PARTITION BY probe_id
        |           ORDER BY cos DESC, vec_id ASC) AS rk_all,
        |         row_number() OVER (PARTITION BY probe_id, same
        |           ORDER BY cos DESC, vec_id ASC) AS rk_grp
        |  FROM scored),
        |fl AS (
        |  SELECT *, (same AND rk_grp <= 10) AS is_truth FROM ranked),
        |ss AS (SELECT CAST(unnest([10, 50, 200]) AS BIGINT) AS shortlist)
        |SELECT shortlist,
        |       CAST(count(DISTINCT probe_id) AS BIGINT) AS n_probes,
        |       CAST(sum(CASE WHEN is_truth THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_truth,
        |       CAST(sum(CASE WHEN is_truth AND rk_all <= shortlist
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |       CAST(sum(CASE WHEN same AND rk_all <= shortlist
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       round(CAST(sum(CASE WHEN is_truth AND rk_all <= shortlist
        |           THEN 1 ELSE 0 END) AS DOUBLE) /
        |         sum(CASE WHEN is_truth THEN 1 ELSE 0 END), 6)
        |         AS mean_recall,
        |       round(CAST(sum(CASE WHEN same AND rk_all <= shortlist
        |           THEN 1 ELSE 0 END) AS DOUBLE) /
        |         count(DISTINCT probe_id), 6) AS mean_kept
        |FROM fl, ss GROUP BY shortlist ORDER BY shortlist""".stripMargin,

    "q261_anisotropy" ->
      """WITH x AS (
        |  SELECT i - 1 AS dim,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |           AS BIGINT) AS xs
        |  FROM embeddings, unnest(range(1, 65)) AS u(i)),
        |byd AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(xs) AS BIGINT) AS sd,
        |         sum(CAST(xs AS HUGEINT) * CAST(xs AS HUGEINT)) AS sq
        |  FROM x GROUP BY 1),
        |tot AS (
        |  SELECT sum(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS ssd2,
        |         sum(sq) AS ssq,
        |         sum(CAST(n AS HUGEINT) * sq
        |           - CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS svar,
        |         CAST(max(n) AS BIGINT) AS nn
        |  FROM byd)
        |SELECT CAST(dim AS BIGINT) AS dim,
        |       round(CAST(sd AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * 1000000.0), 6) AS mean,
        |       round(CAST(CAST(n AS HUGEINT) * sq
        |           - CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT) AS DOUBLE)
        |         / (CAST(n * n AS DOUBLE) * 1000000000000.0), 6)
        |         AS variance,
        |       round(CAST(CAST(n AS HUGEINT) * sq
        |           - CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT) AS DOUBLE)
        |         / CAST(svar AS DOUBLE), 6) AS var_share,
        |       round(CAST(ssd2 AS DOUBLE)
        |         / (CAST(nn AS DOUBLE) * CAST(ssq AS DOUBLE)), 6)
        |         AS anisotropy
        |FROM byd, tot ORDER BY dim""".stripMargin,
    "q249_mutual_knn" ->
      s"""WITH $nSql,
        |sub AS (SELECT * FROM n WHERE vec_id % 4 = 0),
        |scored AS (
        |  SELECT p.vec_id AS a, c.vec_id AS b,
        |         list_reduce(list_transform(range(1, 65), i -> p.v[i] * c.v[i]),
        |           (x, y) -> x + y) / (p.nrm * c.nrm) AS cos
        |  FROM sub p JOIN sub c ON c.vec_id != p.vec_id),
        |ranked AS (
        |  SELECT a, b, CAST(row_number() OVER (PARTITION BY a
        |           ORDER BY cos DESC, b ASC) AS BIGINT) AS rank
        |  FROM scored),
        |e AS (SELECT a, b, rank FROM ranked WHERE rank <= 10),
        |rev AS (SELECT b AS a, a AS b, rank AS rank_rev FROM e),
        |m AS (
        |  SELECT e.a, e.b, e.rank, rev.rank_rev
        |  FROM e LEFT JOIN rev ON e.a = rev.a AND e.b = rev.b),
        |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
        |mutual AS (
        |  SELECT k,
        |         CAST(sum(CASE WHEN rank <= k AND rank_rev <= k AND a < b
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual_pairs,
        |         CAST(sum(CASE WHEN rank <= k THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_directed
        |  FROM m, ks GROUP BY k),
        |ind AS (
        |  SELECT k, b, CAST(count(*) AS BIGINT) AS ind
        |  FROM e, ks WHERE rank <= k GROUP BY k, b),
        |indc AS (
        |  SELECT k, CAST(max(ind) AS BIGINT) AS max_indegree,
        |         CAST(count(*) AS BIGINT) AS n_with
        |  FROM ind GROUP BY k),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM sub)
        |SELECT mutual.k, n_nodes, n_mutual_pairs,
        |       round(CAST(2 * n_mutual_pairs AS DOUBLE)
        |         / CAST(n_directed AS DOUBLE), 6) AS reciprocation_rate,
        |       max_indegree, n_nodes - n_with AS n_orphans
        |FROM mutual JOIN indc ON mutual.k = indc.k, nn
        |ORDER BY mutual.k""".stripMargin,
    "q281_margin_census" ->
      s"""WITH nl AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |         sqrt(list_reduce(list_transform(range(1, 65),
        |                i -> CAST(embedding[i] AS DOUBLE)
        |                  * CAST(embedding[i] AS DOUBLE)),
        |              (x, y) -> x + y)) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, p.label AS plabel, c.vec_id,
        |         c.label = p.label AS same,
        |         list_reduce(list_transform(range(1, 65),
        |           i -> p.v[i] * c.v[i]), (x, y) -> x + y)
        |           / (p.nrm * c.nrm) AS cos
        |  FROM nl p JOIN nl c
        |    ON p.vec_id % 20 = 0 AND c.vec_id != p.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY probe_id
        |           ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored),
        |per AS (
        |  SELECT probe_id, plabel,
        |         max(CASE WHEN same THEN cos END) AS bs,
        |         max(CASE WHEN NOT same THEN cos END) AS bd,
        |         CAST(sum(CASE WHEN rank <= 5 AND same THEN 1 ELSE 0 END)
        |           AS BIGINT) AS k5
        |  FROM ranked GROUP BY 1, 2),
        |pm AS (
        |  SELECT plabel, CAST(floor((bs - bd) * 1000000.0) AS BIGINT)
        |           AS m_micro, k5
        |  FROM per WHERE bs IS NOT NULL AND bd IS NOT NULL)
        |SELECT plabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
        |  round(CAST(sum(m_micro) AS DOUBLE)
        |    / (count(*) * 1000000.0), 6) AS mean_margin,
        |  round(CAST(sum(CASE WHEN m_micro >= 0 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS frac_margin_pos,
        |  round(CAST(sum(k5) AS DOUBLE) / (count(*) * 5.0), 6)
        |    AS knn5_label_agree
        |FROM pm GROUP BY 1 ORDER BY 1""".stripMargin,

    "q22_cosine_topk" ->
      s"""WITH $nSql,
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |         list_reduce(list_transform(range(1, 65), i -> p.v[i] * c.v[i]),
        |           (x, y) -> x + y) / (p.nrm * c.nrm) AS cos
        |  FROM n p JOIN n c ON p.vec_id < 20 AND c.vec_id != p.vec_id),
        |ranked AS (
        |  SELECT probe_id, neighbor_id, cos,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT probe_id, neighbor_id, rank, round(cos, 6) AS cosine
        |FROM ranked WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
    "q49_ivf_ann" ->
      s"""WITH $nSql,
        |cents AS (
        |  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |aff AS (
        |  SELECT n.vec_id, cents.cent_id,
        |         list_reduce(list_transform(range(1, 65), i -> n.v[i] * cents.cv[i]),
        |           (x, y) -> x + y) / (n.nrm * cents.cn) AS ccos
        |  FROM n, cents),
        |ranked_aff AS (
        |  SELECT vec_id, cent_id, ccos,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY ccos DESC, cent_id ASC) AS crank
        |  FROM aff),
        |assign AS (
        |  SELECT vec_id AS cand_id, cent_id AS cell FROM ranked_aff WHERE crank = 1),
        |probes AS (
        |  SELECT vec_id AS probe_id, cent_id AS cell FROM ranked_aff
        |  WHERE vec_id >= 20 AND vec_id < 40 AND crank <= 2),
        |scored AS (
        |  SELECT p.probe_id, a.cand_id,
        |         max(list_reduce(list_transform(range(1, 65), i -> pn.v[i] * cn2.v[i]),
        |           (x, y) -> x + y) / (pn.nrm * cn2.nrm)) AS cos
        |  FROM probes p
        |  JOIN assign a ON a.cell = p.cell AND a.cand_id != p.probe_id
        |  JOIN n pn ON pn.vec_id = p.probe_id
        |  JOIN n cn2 ON cn2.vec_id = a.cand_id
        |  GROUP BY p.probe_id, a.cand_id),
        |ranked AS (
        |  SELECT probe_id, cand_id, cos,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT probe_id, cand_id AS neighbor_id, rank, round(cos, 6) AS cosine
        |FROM ranked WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    "q28_lsh_ann" ->
      s"""WITH $nSql,
        |b AS (
        |  SELECT vec_id, t,
        |         list_aggregate(list_transform(range(0, 6), k ->
        |           CASE WHEN list_reduce(list_transform(range(1, 65), d ->
        |                  (CAST((((t*6+k)*64+d) * 2654435761) % 4294967296 AS DOUBLE)
        |                     / 2147483648.0 - 1.0) * v[d]),
        |                  (x, y) -> x + y) >= 0.0
        |                THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END), 'sum') AS bk
        |  FROM n, (SELECT unnest(range(0, 4)) AS t)),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
        |  FROM b p JOIN b c ON p.t = c.t AND p.bk = c.bk
        |  WHERE p.vec_id < 20 AND p.vec_id != c.vec_id),
        |scored AS (
        |  SELECT cand.probe_id, cand.cand_id,
        |         list_reduce(list_transform(range(1, 65), i -> p.v[i] * c.v[i]),
        |           (x, y) -> x + y) / (p.nrm * c.nrm) AS cos
        |  FROM cand
        |  JOIN n p ON p.vec_id = cand.probe_id
        |  JOIN n c ON c.vec_id = cand.cand_id),
        |ranked AS (
        |  SELECT probe_id, cand_id, cos,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |              ORDER BY cos DESC, cand_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT probe_id, cand_id AS neighbor_id, rank, round(cos, 6) AS cosine
        |FROM ranked WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,
    "q61_kmeans_step" ->
      s"""WITH $nSql,
        |vv AS (
        |  SELECT vec_id, v,
        |         list_reduce(list_transform(range(1, 65), i -> v[i] * v[i]),
        |           (x, y) -> x + y) AS vv
        |  FROM n),
        |c AS (SELECT vec_id AS cid, v AS cv, vv AS cc FROM vv WHERE vec_id < 8),
        |d AS (
        |  SELECT a.vec_id, c.cid, a.v,
        |         a.vv - 2.0::DOUBLE * list_reduce(
        |           list_transform(range(1, 65), i -> a.v[i] * c.cv[i]),
        |           (x, y) -> x + y) + c.cc AS d2
        |  FROM vv a CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, cid, v,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM d)
        |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
        |       round(avg(v[1]), 4) AS c1, round(avg(v[2]), 4) AS c2,
        |       round(avg(v[3]), 4) AS c3, round(avg(v[4]), 4) AS c4
        |FROM r WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin
  )
}
