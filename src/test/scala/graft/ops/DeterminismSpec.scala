package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Run-to-run determinism audit — the failure class a one-shot oracle
  * compare can't catch (round 8's q141 hash-failed at the driver while
  * matching the oracle byte-for-byte in every local run). Each audited
  * query runs in TWO fresh sessions with coprime shuffle-partition
  * counts — different partitioning, different task interleavings,
  * different reduce orders — and must collect to IDENTICAL rendered
  * rows. Candidates are the historically fragile ones: decimal/CDF
  * delta algebra (q141), iterative float state (q61), trained-codebook
  * ANN (q93), float log-sums (q127), plus the exact-decimal regression
  * contract (q91).
  */
class DeterminismSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  private def render(name: String, partitions: Int): Seq[String] = {
    // newSession: fresh session state (confs, temp views) over the same
    // shared context — the driver's schedule runs many queries in one
    // JVM, so per-JVM artifacts (demo tables, fixtures) intentionally
    // persist across the two runs, exactly as they do under the driver.
    val s = spark.newSession()
    graft.functions.GraftFunctions.register(s)
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    graft.SparkEntry.queries(name)(s, dir)
      .collect().map(_.toString).toSeq
  }

  // q136/q147 joined round 9: q136 rebuilds its frame from an eager
  // top-20 collect (driver literal must be order-stable), q147's
  // recall/precision ratios fold two whole candidate pipelines into one
  // full-outer aggregate — both must hold under any partitioning.
  // q159/q160 joined with round 9's corpus-health additions: q159 folds
  // 1000 ln terms in rank order, q160 collects driver-literal centroids
  // from cross-partition sums (exact int64 by design — this test is the
  // guard that keeps them that way).
  // q176/q177 joined with the session's last wave: q176 rebuilds its
  // frame from an eager top-20 over per-customer fp folds, q177's
  // calibration means cross partitions as floor-scaled int sums — both
  // must hold under any partitioning.
  // Round-10 joiners, one per new reduction shape: q182's HLL estimate
  // divides an (exact-dyadic) float sum, q183 buckets by interpolated
  // percentile cuts, q191's calibration means are floor-scaled int
  // sums over band candidates, q192 folds held-out log-sums per doc
  // then floor-scales per source, q190 rolls a join-MV by signed int
  // deltas.
  for (q <- Seq("q141_delta_agg_maintenance", "q61_kmeans_step",
    "q93_pq_ann", "q127_perplexity", "q91_regression",
    "q136_market_basket", "q147_dedup_recall",
    "q159_zipf_law", "q160_centroid_purity",
    "q176_decayed_spend", "q177_minhash_calibration",
    "q182_hll_registers", "q183_novelty_curve",
    "q190_delta_join_maintenance", "q191_containment_calibration",
    "q192_heldout_perplexity")) {
    test(s"$q collects byte-identically across partitioning changes") {
      val a = render(q, 3)
      val b = render(q, 7)
      assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
      val diffs = a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }
      assert(diffs.isEmpty,
        s"${diffs.length} unstable rows, first: ${diffs.headOption}")
    }
  }
}
