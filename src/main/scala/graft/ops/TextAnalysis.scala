package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Text-analysis operators over `documents.text` — the LLM-pipeline
  * quality/statistics surface (north-star extension; the reference's only
  * string op is the timestamp parse at wallmart_pipeline.py:89).
  *
  * All per-document work is a single projection over the scan (no
  * shuffle); only q24's term aggregation shuffles, and it shuffles
  * (term, partial-count) pairs after map-side combine — at 100 TB the
  * reduce side sees |vocabulary|, not |corpus|, per partition.
  *
  * Ratio/score arithmetic sticks to the Det rules (fixed operand order,
  * int-derived doubles) so every query carries a full DuckDB oracle.
  */
object TextAnalysis {
  import Det._

  /** Tiny per-language marker-word lists for the lang-ID heuristic. The
    * real-world analogue loads per-language frequency tables; the shape
    * of the operator (array containment scoring + argmax) is what scales.
    * Words drawn from the synthetic corpus vocabulary so scores are
    * non-degenerate on the testdata.
    */
  private val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("key", "hash", "merge", "group"),
    "en" -> Seq("the", "a", "data", "fast", "slow"),
    "es" -> Seq("table", "row", "value", "part"),
    "fr" -> Seq("query", "join", "filter", "sort"),
    "zh" -> Seq("stream", "window", "batch", "vector"))

  private def markerCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t)))

  /** documents, repartitioned before per-document token work — the table
    * is a single parquet file (one input split); see Dedup.mutatedDocs.
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)

  // q24: corpus term statistics — explode to (doc, term), aggregate term
  // frequency + document frequency, keep the top 50 terms.
  private def textStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
      .orderBy($"tf".desc, $"term".asc)
      .limit(50)
  }

  // q40: language identification by marker-word scoring; argmax with
  // alphabetical tie-break so the prediction is deterministic.
  private def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = docs(s, dir)
      .withColumn("tokens", split($"text", " "))
    val withScores = langWords.foldLeft(scored) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l", markerCount(col("tokens"), ws))
    }
    val m = greatest(langWords.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = langWords.foldLeft(when(lit(false), lit(""))) {
      case (c, (l, _)) => c.when(col(s"s_$l") === m, lit(l))
    }
    withScores
      .select($"doc_id", $"lang".as("actual_lang"),
        predicted.as("predicted_lang"), m.as("marker_hits"),
        Num.roundAt(m / size($"tokens"), 6).as("marker_ratio"))
      .withColumn("correct", $"predicted_lang" === $"actual_lang")
      .orderBy("doc_id")
  }

  // q41: heuristic quality score from length, marker-word ratio and
  // average token length; bucketed for downstream filtering. The exact
  // weighted formula is mirrored operand-for-operand in the oracle.
  private def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = langWords.toMap.apply("en")
    docs(s, dir)
      .withColumn("tokens", split($"text", " "))
      .withColumn("n", size($"tokens"))
      .withColumn("avg_len",
        aggregate(transform($"tokens", t => length(t)), lit(0), (a, x) => a + x) / $"n")
      .withColumn("stop_ratio", markerCount($"tokens", en) / $"n")
      .withColumn("score",
        lit(0.4) * least($"n", lit(100)) / 100.0 + lit(0.4) * $"stop_ratio"
          + lit(0.2) * (lit(1.0) - least(abs($"avg_len" - 4.5), lit(4.5)) / 4.5))
      .select($"doc_id", $"n".as("n_tokens"),
        Num.roundAt($"avg_len", 6).as("avg_token_len"),
        Num.roundAt($"stop_ratio", 6).as("stop_ratio"),
        Num.roundAt($"score", 6).as("quality_score"),
        when($"score" >= 0.6, "high").when($"score" >= 0.4, "medium")
          .otherwise("low").as("quality_bucket"))
      .orderBy("doc_id")
  }

  // q42: token counting three ways — whitespace, BPE-ish subword chunks
  // (longest-match [a-z]{1,4} pieces), and the chars/4 estimate. All
  // integers; zero float risk in the compare.
  private def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]{1,4}"), lit(0))).as("subword_tokens"),
        ceil(length($"text") / 4.0).cast(LongType).as("est_tokens"),
        length($"text").as("n_chars"))
      .orderBy("doc_id")
  }

  // q43: polynomial rolling-hash fingerprint (Rabin-Karp fold over md5
  // token hashes) — whole-document plus an 8-token prefix variant. Pure
  // int64 arithmetic, bit-identical across engines.
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val P = MinHashP
    def roll(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, h) => (acc * 31L + h) % P)
    docs(s, dir)
      .withColumn("hashes", transform(split($"text", " "), t => h7(t)))
      .select($"doc_id",
        roll($"hashes").as("fingerprint"),
        roll(slice($"hashes", 1, 8)).as("prefix_fp"))
      .orderBy("doc_id")
  }

  // q58: per-document top-3 terms by TF-IDF — the classic signature-term
  // extraction. Two shuffles total: the (doc, term) frequency aggregate
  // and the per-doc ranking window; the document-frequency table is
  // |vocabulary|-sized and BROADCAST onto the term frequencies (at
  // 100 TB the vocabulary still fits an executor; a truly unbounded term
  // space would shuffle-join on term instead). idf = ln(N/df) on binary
  // doubles, identical operand order in the oracle.
  private def tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val terms = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val tf = terms.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // document frequency = rows per term in tf (one (doc, term) row each)
    // — derived from the aggregated frame, NOT a second corpus-wide
    // explode + countDistinct over raw terms
    val docFreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, dir).agg(countDistinct($"doc_id").as("n_docs"))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    tf.join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", $"tf" * log($"n_docs".cast(DoubleType) / $"df"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"term", Num.roundAt($"tfidf", 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  // q67: training-sample chunking — overlapping token windows (32 tokens,
  // stride 24), the step that turns cleaned documents into fixed-length
  // training samples. One projection + one generator per document, no
  // shuffle: chunk starts come from `sequence`, each chunk is a `slice`
  // of the token array, and the chunk identity is the 28-bit md5 hash of
  // the re-joined window (Det.h7, exact in both engines). At 100 TB this
  // is embarrassingly parallel and the output is immediately groupable by
  // chunk_hash for cross-document sample dedup.
  private def chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val C = 32
    val S = 24
    docs(s, dir)
      .withColumn("tokens", split($"text", " "))
      .select($"doc_id", $"tokens",
        posexplode(sequence(lit(0), size($"tokens") - 1, lit(S)))
          .as(Seq("chunk_idx", "start")))
      .select($"doc_id", $"chunk_idx", $"start",
        size(slice($"tokens", $"start" + 1, lit(C))).as("chunk_len"),
        h7(array_join(slice($"tokens", $"start" + 1, lit(C)), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  // q68: PII scrubbing — regex removal of emails / URLs / long digit runs
  // with per-document scrub counts, the compliance pass every corpus gets
  // before training. The testdata is synthetic and clean, so the PII is
  // INJECTED deterministically from doc_id first (both engines build the
  // identical dirty string), then scrubbed; the output pins match counts,
  // the cleaned text's hash and its length. Patterns stay in the common
  // Java-regex/RE2 subset (char classes + quantifiers, no backrefs) so
  // Spark and DuckDB match identically; replacement order (URL before
  // NUM) keeps the patterns non-overlapping.
  private def piiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val url = "https?://[^ ]+"
    val num = "[0-9]{7,}"
    docs(s, dir)
      .withColumn("dirty",
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@mail.example.com or https://ex.com/d/"), $"doc_id",
          lit(" ref "), ($"doc_id" * 7919L + 1000000L)))
      .withColumn("cleaned",
        regexp_replace(
          regexp_replace(
            regexp_replace($"dirty", email, "<EMAIL>"),
            url, "<URL>"),
          num, "<NUM>"))
      .select($"doc_id",
        size(regexp_extract_all($"dirty", lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all($"dirty", lit(url), lit(0))).as("n_urls"),
        size(regexp_extract_all($"dirty", lit(num), lit(0))).as("n_longnums"),
        length($"cleaned").as("cleaned_len"),
        h7($"cleaned").as("cleaned_hash"))
      .orderBy("doc_id")
  }

  // q69: sequence-length bucketing — docs binned to power-of-two token
  // budgets (16..512), the batch-packing prep that decides padding waste
  // before training. Per-bucket rollup: doc count, raw vs kept (truncated
  // to budget) token totals, and the padded-slot waste fraction. One
  // map-side-combined aggregate over a projection; the reduce side sees
  // six rows.
  private def lengthBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("n", size(split($"text", " ")))
      .withColumn("bucket",
        when($"n" <= 16, 16).when($"n" <= 32, 32).when($"n" <= 64, 64)
          .when($"n" <= 128, 128).when($"n" <= 256, 256).otherwise(512))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").as("total_tokens"),
        sum(least($"n", $"bucket")).as("kept_tokens"))
      .withColumn("pad_waste",
        Num.roundAt(lit(1.0) -
          $"kept_tokens".cast(DoubleType) / ($"n_docs" * $"bucket").cast(DoubleType), 6))
      .orderBy("bucket")
  }

  // q70: repetition scoring — the repeated-n-gram quality signal (the
  // Gopher/C4 rule family): 1 − distinct-bigrams / total-bigrams per
  // document. Docs at doc_id % 11 == 0 are doubled first so the signal is
  // non-degenerate on the synthetic corpus (a doubled doc repeats every
  // bigram once ⇒ ratio ≈ 0.5). Distinct counts ride the same native
  // ShingleHashes expression as the dedup family — one projection, no
  // shuffle.
  private def repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // Guard: docs with < 2 tokens have zero bigrams — the native
    // shingle_hashes n<2 fallback (one whole-string hash) and the
    // oracle's range(1, len(th)) CTE (empty list) disagree there, and
    // the ratio would divide by zero. The filter is a no-op on the
    // synthetic corpus but keeps the two formulations aligned on any
    // future degenerate input.
    docs(s, dir)
      .filter(size(split($"text", " ")) >= 2)
      .select($"doc_id",
        when($"doc_id" % 11 === 0, concat($"text", lit(" "), $"text"))
          .otherwise($"text").as("text"))
      .withColumn("n", size(split($"text", " ")))
      .withColumn("nd", size(expr("shingle_hashes(split(text, ' '))")))
      .withColumn("ratio",
        lit(1.0) - $"nd".cast(DoubleType) / ($"n" - 1).cast(DoubleType))
      .select($"doc_id", $"n".as("n_tokens"), ($"n" - 1).as("n_bigrams"),
        $"nd".as("n_distinct"), Num.roundAt($"ratio", 6).as("rep_ratio"),
        ($"ratio" > 0.2).as("repetitive"))
      .orderBy("doc_id")
  }

  // q71: stratified sampling — deterministic per-language downsampling by
  // hash threshold (en 50%, de 30%, rest 10%), the data-mixing lever for
  // corpus composition. Membership is a pure function of (lang, doc_id)
  // via md5 (Det.h7), so the sample is reproducible on any cluster and in
  // the oracle; the rollup pins per-language totals, kept counts, the
  // realized rate and the kept-id range. No shuffle before the
  // five-group aggregate.
  private def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", 50).when($"lang" === "de", 30).otherwise(10)
    docs(s, dir)
      .withColumn("keep", h7(concat($"lang", lit(":"), $"doc_id")) % 100 < rate)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        min(when($"keep", $"doc_id")).as("first_kept"),
        max(when($"keep", $"doc_id")).as("last_kept"))
      .withColumn("realized_rate",
        Num.roundAt($"n_kept".cast(DoubleType) / $"n_total".cast(DoubleType), 6))
      .orderBy("lang")
  }

  // q79: sequence packing — greedy assignment of documents to fixed
  // token-budget packs (4096) via a running per-language token cumsum:
  // a doc opens in the pack its preceding cumsum lands in (the streaming
  // first-fit approximation every training-data packer uses — slight
  // overflow allowed, zero inter-doc coordination). One window + one
  // aggregate, both partitioned by lang; completes the chunk (q67) →
  // length-bucket (q69) → pack story. At 100 TB the window partitions
  // by (lang, shard) so no single ordering grows unbounded.
  private def sequencePack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select($"doc_id", $"lang", size(split($"text", " ")).as("n"))
      .withColumn("cum", sum($"n").over(w))
      .withColumn("pack_id", floor(($"cum" - $"n") / lit(4096.0)).cast(IntegerType))
      .groupBy($"lang", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n").as("pack_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy("lang", "pack_id")
  }

  // q81: per-source capping — bound each source/domain to a fixed number
  // of documents (15, keep-lowest-id), the data-mixing lever against
  // over-represented domains (the Common-Crawl "cap per registered
  // domain" rule). One ranking window partitioned by source + the audit
  // rollup; deterministic keep order so the cap is reproducible.
  private def sourceCap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cap = 15
    val bySrc = Window.partitionBy($"source")
    docs(s, dir)
      .select($"doc_id", $"source")
      .withColumn("n_total", count(lit(1)).over(bySrc))
      .withColumn("rn", row_number().over(bySrc.orderBy($"doc_id")))
      .filter($"rn" <= cap)
      .groupBy($"source")
      .agg(max($"n_total").as("n_total"), count(lit(1)).as("n_kept"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .withColumn("capped", $"n_total" > $"n_kept")
      .orderBy("source")
  }

  // q83: BM25 retrieval scoring — the lexical-search ranking function
  // (Lucene/Elasticsearch default, k1=1.2, b=0.75) for the fixed query
  // {join, scan, merge}, top-20 documents. Term frequencies come from
  // ONE token explode with the query-term filter applied BEFORE the
  // aggregate (map-side, prunes ~97% of token rows); document length
  // rides the explode so no corpus re-join is needed. df and the corpus
  // scalars (N, avgdl) broadcast. Per-term scores land in FIXED columns
  // and the final score adds them left-to-right, so double addition
  // order is identical on both engines (a per-doc SUM over term rows
  // would leave the order engine-chosen). Top-20 via orderBy+limit —
  // TakeOrderedAndProject, per-partition heaps, never a global sort.
  /** Shared q83/q166 stage-1 core: the BM25 top-20 (doc_id, score) for
    * the fixed query, collected as the bounded shortlist literal.
    * Top-20 via TakeOrderedAndProject (distributed partial top-k) —
    * rank derives from the collected order, no empty-partition
    * WindowExec (the q117 fix, applied suite-wide).
    */
  private def bm25Top(s: SparkSession, dir: String): Array[(Long, Double)] = {
    import s.implicits._
    val k1 = lit(1.2)
    val b = lit(0.75)
    // No corpus repartition here (unlike the signature queries): the
    // per-row work is one split+explode+isin — cheap narrow compute the
    // single-file-split trap doesn't bite — and the (doc_id, term)
    // aggregate's own exchange supplies downstream parallelism.
    val toks = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", size($"toks").as("dl"), explode($"toks").as("term"))
      .filter($"term".isin("join", "scan", "merge"))
    val tf = toks.groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"), max($"dl").as("dl"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scalars = Tables.documents(s, dir).agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(size(split($"text", " "))).as("avgdl"))
    val perDoc = tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("sc", $"idf" * (($"tf" * (k1 + 1.0)) /
        ($"tf" + k1 * (lit(1.0) - b + (b * $"dl") / $"avgdl"))))
      .groupBy($"doc_id")
      .agg(sum(when($"term" === "join", $"sc")).as("s1"),
        sum(when($"term" === "scan", $"sc")).as("s2"),
        sum(when($"term" === "merge", $"sc")).as("s3"))
      .withColumn("score",
        coalesce($"s1", lit(0.0)) + coalesce($"s2", lit(0.0)) + coalesce($"s3", lit(0.0)))
    perDoc.orderBy($"score".desc, $"doc_id".asc).limit(20)
      .select($"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
  }

  private def bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top = bm25Top(s, dir)
    s.createDataFrame(top.zipWithIndex.toSeq.map { case ((id, sc), i) =>
      (id, i + 1, sc)
    }).toDF("doc_id", "rank", "score_raw")
      .select($"doc_id", $"rank", Num.roundAt($"score_raw", 6).as("bm25"))
      .orderBy("rank")
  }

  // q166: two-stage text retrieval — BM25 shortlist, PROXIMITY re-rank.
  // The lexical mirror of q164's ANN pattern (and the shape of every
  // production search stack): a cheap corpus-wide first stage prunes to
  // 20 candidates, then an expensive per-document second stage runs on
  // ONLY those — here the minimal token window covering all three query
  // terms (the classic proximity signal BM25's bag-of-words scoring
  // cannot see). Final order: docs containing the full phrase-able term
  // set first, tighter windows first, BM25 breaking ties. Scale shape:
  // stage 1 is q83's aggregate (corpus-wide but tf-pruned map-side);
  // stage 2 touches 20 documents — the position explode is filtered to
  // the shortlist ids AT THE SCAN (pushed IN-filter), and the
  // per-document occurrence cross is bounded by per-doc term counts,
  // never corpus-sized. All proximity arithmetic is exact integers.
  private def proximityRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top = bm25Top(s, dir)
    // stage 2: positions of the query terms in the 20 shortlist docs only
    val ids = top.map(_._1).toSeq
    val pos = Tables.documents(s, dir)
      .filter($"doc_id".isin(ids: _*))
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "term")))
      .filter($"term".isin("join", "scan", "merge"))
    val win = pos.filter($"term" === "join").select($"doc_id", $"pos".as("p1"))
      .join(pos.filter($"term" === "scan").select($"doc_id", $"pos".as("p2")),
        Seq("doc_id"))
      .join(pos.filter($"term" === "merge").select($"doc_id", $"pos".as("p3")),
        Seq("doc_id"))
      .groupBy($"doc_id")
      .agg(min(greatest($"p1", $"p2", $"p3") - least($"p1", $"p2", $"p3") + 1)
        .as("min_window"))
    val bmDf = s.createDataFrame(top.toSeq).toDF("doc_id", "score_raw")
    val f = bmDf.join(win, Seq("doc_id"), "left")
      .select($"doc_id", $"score_raw",
        $"min_window".isNotNull.as("has_all"),
        coalesce($"min_window", lit(1000000)).as("min_window"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getInt(3)))
      .sortBy { case (id, sc, hasAll, w) => (!hasAll, w, -sc, id) }
    s.createDataFrame(f.zipWithIndex.toSeq.map { case ((id, sc, ha, w), i) =>
      (i + 1, id, ha, w, sc)
    }).toDF("rank", "doc_id", "has_all", "min_window", "score_raw")
      .select($"rank", $"doc_id", $"has_all", $"min_window",
        Num.roundAt($"score_raw", 6).as("bm25"))
      .orderBy("rank")
  }

  // q114: BPE merge-candidate counting — the first iteration of
  // byte-pair-encoding vocabulary induction: which adjacent character
  // pair is most frequent across the corpus, weighted by word
  // frequency. The BPE trick that makes this tractable at 100 TB is
  // done here the way real trainers do it: the pair statistics are
  // computed over the VOCABULARY (distinct words + their counts, a
  // dictionary-sized frame), never over the raw corpus — the corpus is
  // touched exactly once to build the vocab, and every later BPE
  // iteration would re-scan only the vocab rows containing the merged
  // pair. Deterministic: exact counts, total order (n desc, pair asc)
  // through the top-20 boundary.
  private def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = docs(s, dir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
    vocab.filter(length($"w") >= 2)
      .select($"f", explode(
        expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy($"pair").agg(sum($"f").as("n"))
      .orderBy($"n".desc, $"pair".asc)
      .limit(20)
  }

  // q127: bigram language-model perplexity scoring — the CCNet-style
  // quality filter: train add-one-smoothed bigram statistics ON the
  // corpus itself (one scan: bigram counts c12, head counts c1, vocab
  // size V — all exact integers), then score every document by its mean
  // negative log-likelihood  nll = −(1/m)·Σ ln((c12+1)/(c1+V))  and
  // perplexity exp(nll). High-perplexity docs are the ones the corpus's
  // own statistics find improbable — boilerplate mashups, shuffled
  // text, wrong-language fragments. Scale shape: the count tables are
  // VOCABULARY-sized (auto-broadcast here; at a real corpus's bigram
  // cardinality the same joins run as shuffle equi-joins — the plan is
  // declarative either way), the corpus is scanned twice (train, score),
  // and the per-doc reduction keeps one row per document. Determinism:
  // every ln argument is a ratio of exact ints, and the per-doc sum is
  // a LEFT FOLD in position order (Det rule 2) — identical doubles
  // added in identical order on both engines.
  private def perplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = docs(s, dir).select($"doc_id", split($"text", " ").as("t"))
    // The exploded bigram frame feeds train (c12) and score — persist the
    // one explode instead of re-running it per consumer (pre-persist the
    // corpus tokenized+exploded three times: c12 build, c1 build, score
    // scan). c1 derives from c12 by marginalization (Σ_w2 c12 = c1 —
    // exact, and the c12 frame is bigram-vocabulary-sized, far smaller
    // than the corpus), so training is ONE aggregate over the cache.
    val big = tok.filter(size($"t") >= 2)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
        .as(Seq("pos", "b")))
      .select($"doc_id", $"pos", $"b.w1".as("w1"), $"b.w2".as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val v = tok.select(explode($"t").as("w")).agg(count_distinct($"w").as("v"))
    big
      // count-table joins left UNHINTED: at this vocabulary Catalyst
      // broadcasts them on its own; at a real corpus's bigram
      // cardinality (vocab², not broadcastable) the same plan runs as
      // shuffle equi-joins — a broadcast() hint here would force an
      // OOM at exactly the scale the query is for
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v)) // 1-row vocab-size frame
      .withColumn("lp",
        log(($"c12" + 1).cast(DoubleType) / ($"c1" + $"v").cast(DoubleType)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct($"pos", $"lp"))).as("lps"))
      .withColumn("nll",
        -aggregate($"lps", lit(0.0), (acc, x) => acc + x.getField("lp")) /
          $"n_bigrams".cast(DoubleType))
      .select($"doc_id", $"n_bigrams",
        Num.roundAt($"nll", 6).as("nll"),
        Num.roundAt(exp($"nll"), 4).as("ppl"))
      .orderBy("doc_id")
  }

  // q129: weighted sampling without replacement (Efraimidis–Spirakis
  // A-ES), the reproducible "sample the best data under a budget"
  // primitive: per source keep the 5 docs with the largest u^(1/w) —
  // equivalently the largest key = ln(u)/w — where w is the doc's token
  // count (the weight: longer docs proportionally likelier) and u is a
  // DETERMINISTIC uniform from q120's minstd double-LCG of doc_id, not
  // rand() (stable under retries, AQE re-plans and cluster resizing;
  // every operand < 2^47 so the oracle runs the identical integer
  // arithmetic). Scale shape: a pure projection followed by top-k per
  // group — the rank column is dropped from the output, so the
  // RewriteRankLimitToNativeTopK rule replaces the window with the
  // native heap operator and only k rows per group per task cross the
  // shuffle. Works identically (modulo plan) without the extension.
  private def weightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = 2147483647L
    val h = $"doc_id" % M * 16807L % M * 48271L % M
    val keyed = docs(s, dir)
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast(LongType).as("weight"),
        (h + 1L).as("h1"))
      .withColumn("key", log($"h1".cast(DoubleType) / M) / $"weight")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"key".desc, $"doc_id".asc)
    keyed.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"source", $"doc_id", $"weight",
        Num.roundAt($"key", 6).as("priority"))
      .orderBy("source", "doc_id")
  }

  // q138: corpus-wide frequent 3-token shingles via the native
  // shingle_windows GENERATOR (functions.ShingleWindows) — the
  // table-generating rung of the extension ladder exercised by an oracle
  // query: one Generate node fans each document into its sliding token
  // windows INSIDE whole-stage codegen (CollectionGenerator protocol; no
  // intermediate lambda arrays like explode-of-transform would build),
  // then a map-side-combined count and a distributed top-20. The
  // phrase-frequency census is the n-gram LM / contamination-probe
  // primitive over a training corpus. Scale shape: generated rows ≈
  // corpus tokens, streamed straight into the partial aggregate — no
  // per-document buffer beyond one row's windows; the shingle census is
  // Σ distinct shingles (vocabulary-sized), and the top-20 plans as
  // TakeOrderedAndProject, never a global window.
  private def shingleWindowsTop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val win = Tables.documents(s, dir)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", expr("shingle_windows(toks, 3)"))
    win.groupBy($"shingle")
      .agg(count(lit(1)).as("n"),
        countDistinct($"doc_id").as("df"),
        min($"pos").as("first_pos"))
      .orderBy($"n".desc, $"shingle".asc)
      .limit(20)
  }

  // q159: Zipf-law fit over the corpus term-frequency spectrum — the
  // corpus-health readout beside q24's raw census: natural text follows
  // freq ∝ rank^s with s ≈ −1; a corpus whose fitted slope drifts far
  // from −1 (template spam flattens it, boilerplate dedup failures
  // steepen it) fails the health gate before training. One row out:
  // vocabulary size, token count, and the OLS fit of ln(freq) on
  // ln(rank) over the top-1000 terms (slope, intercept, r²).
  // Scale shape: term counts are one map-side-combined groupBy
  // (vocabulary-sized); the top-1000 plans as TakeOrderedAndProject
  // (never a global rank window); the regression runs over ONE bounded
  // 1000-element array. Determinism: ranks and frequencies are exact
  // integers, each ln is computed per element, and every Σ is a left
  // fold in rank order (Det rule 2) — both engines add identical
  // doubles in identical order, and the closed-form OLS scalars are
  // the same operand tree on both sides.
  private def zipfLaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = docs(s, dir)
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("freq"))
    val globals = tf.agg(count(lit(1)).as("vocab_size"),
      sum($"freq").as("total_tokens"))
    val top = tf.orderBy($"freq".desc, $"term".asc).limit(1000)
    // rank order re-established inside the single collected array (the
    // q127 sort_array(collect_list(struct)) pattern): struct comparison
    // is field-ordered, so (-freq, term) sorts by freq desc, term asc.
    val fit = top
      .agg(sort_array(collect_list(
        struct((-$"freq").as("nf"), $"term".as("term"), $"freq".as("freq"))))
        .as("a"))
      .select(size($"a").as("n_terms"),
        transform(sequence(lit(1), size($"a")),
          i => log(i.cast(DoubleType))).as("xs"),
        transform($"a", e => log(e.getField("freq").cast(DoubleType))).as("ys"))
      .select($"n_terms", $"n_terms".cast(DoubleType).as("n"),
        aggregate($"xs", lit(0.0), (a, x) => a + x).as("sx"),
        aggregate($"ys", lit(0.0), (a, x) => a + x).as("sy"),
        aggregate(zip_with($"xs", $"ys", (x, y) => x * y), lit(0.0),
          (a, x) => a + x).as("sxy"),
        aggregate(transform($"xs", x => x * x), lit(0.0),
          (a, x) => a + x).as("sxx"),
        aggregate(transform($"ys", y => y * y), lit(0.0),
          (a, x) => a + x).as("syy"))
    fit.crossJoin(broadcast(globals)) // 1-row aggregate frame
      .select($"n_terms", $"vocab_size", $"total_tokens",
        Num.roundAt(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("zipf_slope"),
        Num.roundAt(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 6).as("intercept"),
        Num.roundAt(
          (($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy")) /
            (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")),
          6).as("r2"))
  }

  // q168: dedup-aware mixture reweighting — q121's allocation computed
  // over EFFECTIVE (post-dedup) token mass instead of raw counts, the
  // composition a real mixture planner needs: a source whose mass is
  // mostly re-posts of another must not draw budget for tokens the
  // dedup stage will delete. Cross-posting synthesized as in q158
  // (doc_id % 3 == 0 re-posted under the next source); retention is
  // keep-lowest-source per content digest, so a re-post under an
  // earlier-sorting source STEALS the attribution — exactly what
  // happens when the dedup keep-rule and the mixture planner disagree,
  // surfaced per source as dup_frac. Scale shape: two digest/source
  // groupBys (16-byte keys + int64 masses) and arithmetic over the
  // |sources|-row frame; allocation is exact int64 (div/least) like
  // q121, so the oracle replays it bit-for-bit.
  private def dedupAwareMixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"source", md5($"text").as("digest"),
        size(split($"text", " ")).cast(LongType).as("tk"))
    val reposted = Tables.documents(s, dir)
      .filter($"doc_id" % 3 === 0)
      .select(concat(lit("src"),
        ((substring($"source", 4, 10).cast(LongType) + 1L) % 20L).cast("string"))
        .as("source"), md5($"text").as("digest"),
        size(split($"text", " ")).cast(LongType).as("tk"))
    val posted = d.unionAll(reposted)
    val raw = posted.groupBy($"source")
      .agg(count(lit(1)).as("n_posted"), sum($"tk").as("raw_toks"))
    val eff = posted.groupBy($"digest")
      .agg(min($"source").as("source"), max($"tk").as("tk"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"tk").as("eff_toks"))
    val t = raw.join(eff, Seq("source"), "left")
      .select($"source", $"n_posted", $"raw_toks",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"eff_toks", lit(0L)).as("eff_toks"))
      .withColumn("w",
        when(substring($"source", 4, 10).cast(LongType) % 2 === 1, 9L)
          .otherwise(1L))
    val g = t.agg(sum($"eff_toks").as("total"), sum($"w").as("sw"))
    t.crossJoin(broadcast(g)) // 1-row aggregate frame
      .select($"source", $"n_posted", $"raw_toks", $"n_kept", $"eff_toks",
        Num.roundAt(($"raw_toks" - $"eff_toks").cast(DoubleType) /
          $"raw_toks".cast(DoubleType), 6).as("dup_frac"),
        least($"eff_toks", expr("total * 4 div 5 * w div sw"))
          .as("alloc_tokens"),
        ($"eff_toks" < expr("total * 4 div 5 * w div sw")).as("deficit"))
      .orderBy($"source")
  }

  // q170: tokenizer-fertility census per language — the multilingual
  // tokenizer-quality readout: fertility (subword tokens per whitespace
  // word) and chars-per-word by language tell you which languages a
  // Latin-biased subword scheme (q42's [a-z]{1,4} stand-in) fragments
  // or drops — the per-language compute-cost and representation-equity
  // numbers a multilingual training run budgets from. Scale shape: one
  // scan, map-side per-doc counting (codegen'd regexp/split), partial-
  // aggregated to a |langs|-row census. Counts are exact int64; the
  // two ratios are single divisions of exact operands.
  private def tokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"lang",
        size(split($"text", " ")).cast(LongType).as("ws"),
        size(regexp_extract_all($"text", lit("[a-z]{1,4}"), lit(0)))
          .cast(LongType).as("sub"),
        length($"text").cast(LongType).as("chars"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ws").as("ws_tokens"), sum($"sub").as("subword_tokens"),
        sum($"chars").as("n_chars"))
      .select($"lang", $"n_docs", $"ws_tokens", $"subword_tokens", $"n_chars",
        Num.roundAt($"subword_tokens".cast(DoubleType) /
          $"ws_tokens".cast(DoubleType), 6).as("fertility"),
        Num.roundAt($"n_chars".cast(DoubleType) /
          $"ws_tokens".cast(DoubleType), 6).as("chars_per_word"))
      .orderBy("lang")
  }

  // q175: search-result deduplication — the retrieval × dedup
  // composition every search stack ships (SERP dedup): retrieve over a
  // corpus that CONTAINS duplicates (every doc_id % 3 == 0 re-posted
  // under a new id — q20's duplication, distinct ids), then collapse
  // results with identical content digests to their best-ranked
  // representative and compact the ranking. Exact duplicates carry
  // identical BM25 scores by construction, so uncollapsed they would
  // occupy adjacent result slots — the waste this stage removes.
  // Scale shape: q83's corpus-wide stage (aggregate-pruned), the
  // collapse runs on the 20-row retrieved window only; every score is
  // the fixed-order BM25 sum and the collapse key is a digest.
  private def dedupSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k1 = lit(1.2); val b = lit(0.75)
    val d = Tables.documents(s, dir).select($"doc_id", $"text")
    val corpus = d.unionAll(d.filter($"doc_id" % 3 === 0)
      .select(($"doc_id" + 20000L).as("doc_id"), $"text"))
    val toks = corpus
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", size($"toks").as("dl"), explode($"toks").as("term"))
      .filter($"term".isin("join", "scan", "merge"))
    val tf = toks.groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"), max($"dl").as("dl"))
    val df_ = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scalars = corpus.agg(
      count(lit(1)).cast(DoubleType).as("n_docs"),
      avg(size(split($"text", " "))).as("avgdl"))
    val perDoc = tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("sc", $"idf" * (($"tf" * (k1 + 1.0)) /
        ($"tf" + k1 * (lit(1.0) - b + (b * $"dl") / $"avgdl"))))
      .groupBy($"doc_id")
      .agg(sum(when($"term" === "join", $"sc")).as("s1"),
        sum(when($"term" === "scan", $"sc")).as("s2"),
        sum(when($"term" === "merge", $"sc")).as("s3"))
      .withColumn("score",
        coalesce($"s1", lit(0.0)) + coalesce($"s2", lit(0.0)) + coalesce($"s3", lit(0.0)))
    val top = perDoc.orderBy($"score".desc, $"doc_id".asc).limit(20)
      .select($"doc_id", $"score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // collapse the 20-row retrieved window by content digest (join the
    // bounded window back for its digests; keep the best-ranked member)
    val ids = top.map(_._1).toSeq
    val ranked = s.createDataFrame(
      top.zipWithIndex.toSeq.map { case ((id, sc), i) => (id, i + 1, sc) })
      .toDF("doc_id", "rank0", "score")
    val digests = corpus.filter($"doc_id".isin(ids: _*))
      .select($"doc_id", md5($"text").as("digest"))
    val collapsed = ranked.join(digests, Seq("doc_id"))
      .groupBy($"digest")
      .agg(min($"rank0").as("rank0"), count(lit(1)).as("n_collapsed"))
    val kept = collapsed.join(
      ranked.select($"doc_id", $"rank0"), Seq("rank0"))
      .select($"rank0", $"doc_id", $"n_collapsed", $"digest")
      .collect().sortBy(_.getInt(0))
    s.createDataFrame(kept.zipWithIndex.toSeq.map { case (r, i) =>
      (i + 1, r.getLong(1), r.getLong(2), r.getInt(0))
    }).toDF("rank", "doc_id", "n_collapsed", "pre_rank")
      .join(ranked.select($"doc_id", $"score"), Seq("doc_id"))
      .select($"rank", $"doc_id", $"pre_rank", $"n_collapsed",
        Num.roundAt($"score", 6).as("bm25"))
      .orderBy("rank")
  }

  // q180: per-source quality-gate retention census — the budget readout
  // a filtering pipeline publishes before training (the C4/Gopher-style
  // report: which sources survive which gates, and at what rate):
  // three named gates per doc (minimum length, sane mean word length,
  // stopword presence), per-source failure counts PER GATE plus the
  // all-gates pass rate. A source with a collapsed pass rate is either
  // junk or needs its own gate tuning — caught here, not after tokens
  // are bought. Scale shape: one scan, map-side per-doc gate booleans
  // (codegen'd length/filter arithmetic), partial-aggregated to a
  // |sources|-row census; all counts exact.
  private def qualityGateCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = langWords.toMap.apply("en")
    val f = docs(s, dir)
      .withColumn("tokens", split($"text", " "))
      .withColumn("n", size($"tokens"))
      .withColumn("avg_len",
        aggregate(transform($"tokens", t => length(t)), lit(0),
          (a, x) => a + x) / $"n")
      .withColumn("stop_ratio", markerCount($"tokens", en) / $"n")
      .withColumn("g_len", $"n" >= 30)
      .withColumn("g_avg", $"avg_len" >= 3.0 && $"avg_len" <= 10.0)
      .withColumn("g_stop", $"stop_ratio" >= 0.05)
    f.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!$"g_len", 1L).otherwise(0L)).as("n_fail_len"),
        sum(when(!$"g_avg", 1L).otherwise(0L)).as("n_fail_avglen"),
        sum(when(!$"g_stop", 1L).otherwise(0L)).as("n_fail_stop"),
        sum(when($"g_len" && $"g_avg" && $"g_stop", 1L).otherwise(0L))
          .as("n_pass"))
      .select($"source", $"n_docs", $"n_fail_len", $"n_fail_avglen",
        $"n_fail_stop", $"n_pass",
        Num.roundAt($"n_pass".cast(DoubleType) / $"n_docs".cast(DoubleType),
          6).as("pass_rate"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q227: quality-gate calibration census — the validation a data team
  // runs BEFORE trusting q180's gates to spend the token budget: do the
  // gates actually separate the corpus on the outcomes filtering is
  // supposed to improve? Docs are bucketed by GATES PASSED (0..3, the
  // same three predicates as q180, bit-for-bit) and each bucket reads
  // out its exact-duplicate membership rate (q20's digest semantics)
  // and its mean unigram negative log-likelihood per token (the
  // corpus-fit signal behind q127's perplexity). A gate tier whose dup
  // rate or NLL is indistinguishable from the tier below it is a gate
  // that buys nothing — this census is where that shows up.
  // Determinism: ln(c/N) is frozen to int micro-units per VOCABULARY
  // TERM (dictionary-sized), so every per-doc and per-bucket sum is an
  // exact order-free int64; the two ratios divide exact ints and round
  // at 6dp. Scale shape: one corpus scan fans into (a) a slim
  // (doc, digest) dup frame, (b) a collapsed (doc, term) count frame
  // (persisted — the unigram dictionary, the per-doc NLL, AND all
  // three gate moments derive from it, so the gates cost no extra
  // corpus pass); the dictionary broadcasts (df-capped vocab at
  // 100 TB, shuffle-join fallback documented at the call site); the
  // census is 4 rows.
  private def gateCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = langWords.toMap.apply("en")
    // The raw table carries no exact duplicates, so the dup outcome is
    // exercised by a simulated re-crawl wave concentrated on SHORT docs
    // (crawl duplication skews toward boilerplate/stub pages in
    // practice) — ids offset far above the key range, texts verbatim.
    // The correlation with the length gate is the point: the census
    // must SHOW a gradient when one exists, not only when dups are
    // uniform.
    val base = docs(s, dir).select($"doc_id", $"text")
    val corpus = base.unionAll(
      base.filter(size(split($"text", " ")) < 30)
        .select(($"doc_id" + 10000000L).as("doc_id"), $"text"))
    // Slim dup frame: (id, digest) only and PERSISTED for its two
    // consumers (the digest census and the join back). Round-12: the
    // gate arithmetic moved OFF this pass entirely — every gate moment
    // (token count, summed token chars, stopword occurrences) is an
    // exact integer the collapsed (doc, term) frame already carries, so
    // the per-doc NLL aggregate computes the gates for free and the
    // HOF transform/filter pass over raw token arrays (one full corpus
    // tokenization, ~0.3 s of the measured 1.6 s warm) is gone.
    val slim = corpus
      .select($"doc_id", md5($"text").as("dg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact-dup membership: digest groupBy + digest-keyed join back
    val dupDg = slim.groupBy($"dg").agg(count(lit(1)).as("nc"))
      .filter($"nc" >= 2).select($"dg", lit(1L).as("is_dup"))
    val gated = slim
      .join(dupDg, Seq("dg"), "left")
      .select($"doc_id", coalesce($"is_dup", lit(0L)).as("is_dup"))
    // collapsed (doc, term) counts: ONE token shuffle feeds the
    // dictionary, the per-doc NLL, and the gate moments — persisted for
    // its consumers.
    val dtf = corpus.select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = dtf.groupBy($"term").agg(sum($"c").as("ct"))
    val tot = dict.agg(sum($"ct").as("nn"))
    // ln p(term) frozen to int micro-units at the dictionary row
    val lnp = dict.crossJoin(broadcast(tot))
      .select($"term",
        floor(log($"ct".cast(DoubleType) / $"nn".cast(DoubleType))
          * lit(1000000.0)).cast(LongType).as("lnp_micro"))
    // Per-doc NLL + gate moments in ONE aggregate over the cached term
    // frame (the lnp dictionary covers every term by construction, so
    // the inner join drops nothing): n = Σc, summed chars = Σ c·len(t),
    // stopword occurrences = Σc over the marker set — bit-identical to
    // the former size/transform-aggregate/filter HOF spellings, since
    // int/int and long/long division both widen to double in Spark.
    val nll = dtf.join(broadcast(lnp), Seq("term"))
      .groupBy($"doc_id")
      .agg(sum($"c" * $"lnp_micro").as("sum_lnp_micro"),
        sum($"c").as("n_tok"),
        sum($"c" * length($"term")).as("sum_chars"),
        sum(when($"term".isin(en: _*), $"c").otherwise(0L)).as("n_stop"))
      .withColumn("avg_len", $"sum_chars" / $"n_tok")
      .withColumn("n_gates",
        ($"n_tok" >= 30).cast("int") +
          ($"avg_len" >= 3.0 && $"avg_len" <= 10.0).cast("int") +
          (($"n_stop" / $"n_tok") >= 0.05).cast("int"))
    gated.join(nll, Seq("doc_id"))
      .groupBy($"n_gates")
      .agg(count(lit(1)).as("n_docs"),
        sum($"is_dup").as("n_dup_docs"),
        sum($"n_tok").as("sum_tokens"),
        sum($"sum_lnp_micro").as("s_lnp"))
      .select($"n_gates", $"n_docs", $"n_dup_docs",
        Num.roundAt($"n_dup_docs".cast(DoubleType) /
          $"n_docs".cast(DoubleType), 6).as("dup_rate"),
        $"sum_tokens",
        Num.roundAt(-$"s_lnp".cast(DoubleType) /
          ($"sum_tokens".cast(DoubleType) * lit(1000000.0)), 6)
          .as("mean_nll_per_token"))
      .orderBy($"n_gates")
  }

  // ---------------------------------------------------------------------
  // q228: stratified eval-split construction — carving the held-out set
  // a training run is scored against, reproducibly: a 5% split (E =
  // N div 20, exact) allocated across (lang, source) strata by
  // HAMILTON'S LARGEST-REMAINDER apportionment (base = floor(E·n_s/N),
  // the E − Σbase leftover seats go to the largest exact integer
  // remainders, ties broken on the stratum key — the apportionment rule
  // that cannot leave a seat unassigned or assign one twice), then
  // filled INSIDE each stratum by md5-rank (the seeded permutation:
  // same corpus, same split, any cluster, any partitioning). The census
  // publishes pool vs eval shares per stratum plus the SUM OF SELECTED
  // DOC IDS — the fingerprint that proves two engines picked the same
  // documents, not merely the same counts.
  // Scale shape: the per-doc work is one hash + one window rank
  // PARTITIONED by stratum (never a global sort); the apportionment
  // runs on the |strata|-row count frame (a dictionary — its window is
  // 100 rows here; at data scale E·n_s products move to 128-bit or a
  // divide-first decomposition, noted here at the call site). All
  // allocation arithmetic is exact integers.
  private def evalSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(s, dir)
      .select($"lang", $"source", $"doc_id")
      .withColumn("h", md5(concat(lit("split:"), $"doc_id".cast(StringType))))
    val strata = d.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_pool"))
    val tot = strata.agg(sum($"n_pool").as("nn"))
    val quota = strata.crossJoin(broadcast(tot))
      .withColumn("e", expr("nn div 20"))
      .withColumn("base", expr("(e * n_pool) div nn"))
      .withColumn("rem", expr("(e * n_pool) % nn"))
    // leftover seats: E - Σbase, handed to the largest remainders; the
    // window runs over the stratum dictionary (|langs|·|sources| rows)
    val wrem = Window.orderBy($"rem".desc, $"lang".asc, $"source".asc)
    val wleft = Window.partitionBy(lit(1))
    val alloc = quota
      .withColumn("left", $"e" - sum($"base").over(wleft))
      .withColumn("rr", row_number().over(wrem))
      .withColumn("n_alloc",
        $"base" + when($"rr" <= $"left", 1L).otherwise(0L))
      .select($"lang", $"source", $"n_pool", $"n_alloc", $"e", $"nn")
    val wsel = Window.partitionBy($"lang", $"source")
      .orderBy($"h".asc, $"doc_id".asc)
    val sel = d.withColumn("rn", row_number().over(wsel))
      .join(broadcast(alloc.select($"lang", $"source", $"n_alloc")),
        Seq("lang", "source"))
      .filter($"rn" <= $"n_alloc")
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_sel"), sum($"doc_id").as("sum_sel_ids"))
    alloc.join(sel, Seq("lang", "source"), "left")
      .select($"lang", $"source", $"n_pool", $"n_alloc",
        coalesce($"n_sel", lit(0L)).as("n_sel"),
        coalesce($"sum_sel_ids", lit(0L)).as("sum_sel_ids"),
        Num.roundAt($"n_pool".cast(DoubleType) / $"nn".cast(DoubleType), 6)
          .as("share_pool"),
        Num.roundAt($"n_alloc".cast(DoubleType) / $"e".cast(DoubleType), 6)
          .as("share_eval"))
      .orderBy($"lang", $"source")
  }

  // ---------------------------------------------------------------------
  // q184: PMI collocations — pointwise mutual information over adjacent
  // token pairs, the classic collocation extractor (Church & Hanks): for
  // bigram (x,y), pmi = ln(c_xy * N / (c_x * c_y)) where c_x / c_y are
  // the bigram's positional marginals and N the total bigram count.
  // High-PMI pairs are the multi-word units a tokenizer or phrase-miner
  // should learn as one symbol (the statistic behind q114's BPE merges —
  // BPE greedily merges the most FREQUENT pair; PMI ranks the most
  // ASSOCIATED, surfacing rare-but-rigid phrases frequency misses).
  // Scale shape: ONE corpus scan explodes bigrams; every marginal and N
  // derive from the (x,y) count frame itself (vocabulary²-bounded, never
  // a corpus re-scan); min-support 5 cuts the frame before the global
  // top-20 TakeOrderedAndProject. Determinism: counts are exact ints;
  // the pmi ln runs on the same exact-int ratio both engines (q58/q127
  // precedent); ordering ties break on (x, y).
  private def pmiCollocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.documents(s, dir)
      .select(split($"text", " ").as("ts"))
      // Single-token guard (mirrors q127/q192): without it a 1-token doc
      // sends sequence(1, 0) DESCENDING to [1, 0] and element_at(ts, 0)
      // throws, while the oracle's range(1, 1) is simply empty.
      .filter(size($"ts") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1)," +
          " i -> struct(element_at(ts, i) AS x, element_at(ts, i + 1) AS y))"))
        .as("b"))
      .select($"b.x", $"b.y")
    val cxy = big.groupBy($"x", $"y").agg(count(lit(1)).as("c_xy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cx = cxy.groupBy($"x").agg(sum($"c_xy").as("c_x"))
    val cy = cxy.groupBy($"y").agg(sum($"c_xy").as("c_y"))
    val n = cxy.agg(sum($"c_xy").as("n_bigrams"))
    val scored = cxy.filter($"c_xy" >= 5)
      .join(broadcast(cx), "x")
      .join(broadcast(cy), "y")
      .crossJoin(broadcast(n))
      .withColumn("pmi_raw",
        log(($"c_xy" * $"n_bigrams").cast(DoubleType) /
          ($"c_x" * $"c_y").cast(DoubleType)))
    scored.orderBy($"pmi_raw".desc, $"x".asc, $"y".asc).limit(20)
      .select($"x", $"y", $"c_xy", $"c_x", $"c_y",
        Num.roundAt($"pmi_raw", 6).as("pmi"))
      .orderBy($"pmi".desc, $"x".asc, $"y".asc)
  }

  // ---------------------------------------------------------------------
  // q192: HELD-OUT perplexity by source — q127's LM quality filter with
  // train/score hygiene: the bigram statistics come ONLY from the q120
  // hash-split train shard (~80%), and the held-out shard is scored
  // against them — the measurement q127 cannot give, because a model
  // scored on its own training data never sees an unseen bigram. Two
  // per-source signals on genuinely unseen text: mean NLL (distribution
  // shift — a source whose held-out docs surprise the train statistics
  // is drifting) and the unseen-bigram rate (the OOV mass add-one
  // smoothing absorbs; joins are LEFT joins with coalesce(0), the path
  // q127's inner joins never exercise). Scale shape: count tables are
  // bigram-vocabulary-sized and derive from one explode; scoring is two
  // (shuffle-able) equi-joins + a per-doc ordered fold; census is
  // |sources| rows. Determinism: Det rules — position-ordered left
  // folds, exact-int ln ratios, floor-scaled int64 means.
  private def heldoutPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = 2147483647L
    val tok = Tables.documents(s, dir)
      .select($"doc_id", $"source", split($"text", " ").as("t"))
      .withColumn("is_train",
        $"doc_id" % p * 16807L % p * 48271L % p % 100 < 80)
    val big = tok.filter(size($"t") >= 2)
      .select($"doc_id", $"source", $"is_train", posexplode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
        .as(Seq("pos", "b")))
      .select($"doc_id", $"source", $"is_train", $"pos",
        $"b.w1".as("w1"), $"b.w2".as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = big.filter($"is_train").groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val v = tok.filter($"is_train").select(explode($"t").as("w"))
      .agg(count_distinct($"w").as("v"))
    val perDoc = big.filter(!$"is_train")
      // LEFT joins: held-out bigrams may be absent from train — the
      // smoothing floor (0+1)/(0+V) is exactly what add-one is for
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("c12n", coalesce($"c12", lit(0L)))
      .withColumn("c1n", coalesce($"c1", lit(0L)))
      .withColumn("lp",
        log(($"c12n" + 1).cast(DoubleType) / ($"c1n" + $"v").cast(DoubleType)))
      .withColumn("unseen", when($"c12n" === 0L, 1L).otherwise(0L))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("nb"), sum($"unseen").as("nu"),
        sort_array(collect_list(struct($"pos", $"lp"))).as("lps"))
      .withColumn("nll",
        -aggregate($"lps", lit(0.0), (acc, x) => acc + x.getField("lp")) /
          $"nb".cast(DoubleType))
    perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nb").as("n_bigrams"), sum($"nu").as("n_unseen"),
        sum(floor($"nll" * lit(1e9))).as("snll"))
      .select($"source", $"n_docs", $"n_bigrams", $"n_unseen",
        Num.roundAt($"n_unseen".cast(DoubleType) / $"n_bigrams", 6)
          .as("unseen_rate"),
        Num.roundAt($"snll".cast(DoubleType) / $"n_docs".cast(DoubleType)
          / lit(1e9), 6).as("mean_nll"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q194: ranking-agreement census — Kendall tau + Spearman footrule
  // between BM25 (q83) and plain TF-IDF over the same query and the same
  // top-20 shortlist: the retrieval-eval statistic that answers "does
  // the cheaper scorer order results the same way" BEFORE swapping
  // scorers in a pipeline (the lexical mirror of q146's ANN recall
  // harness). Both statistics are EXACT integers over the 20-item
  // shortlist (190 pair comparisons, rank-displacement sum) — no
  // sampling, no float reductions; only the final tau division is fp.
  // Scale shape: corpus-side work is the two scorers' term-filtered
  // aggregates (posting-list sized); everything after the shortlist is
  // a 20-row frame (the documented bounded contract-frame pattern), so
  // the pair join is 190 rows regardless of corpus size.
  private def rankAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val top = bm25Top(s, dir) // bounded 20-row driver contract frame
    val bmRank = s.createDataFrame(
      top.zipWithIndex.toSeq.map { case ((id, _), i) => (id, i + 1) })
      .toDF("doc_id", "rank_bm")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin("join", "scan", "merge"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir)
      .agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val tfidf = tf.join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("sc", $"tf" * log($"n_docs" / $"df"))
      // fixed-operand-order 3-term sum (the q83 determinism trick)
      .groupBy($"doc_id")
      .agg(sum(when($"term" === "join", $"sc")).as("s1"),
        sum(when($"term" === "scan", $"sc")).as("s2"),
        sum(when($"term" === "merge", $"sc")).as("s3"))
      .withColumn("score", coalesce($"s1", lit(0.0))
        + coalesce($"s2", lit(0.0)) + coalesce($"s3", lit(0.0)))
    val w = Window.orderBy($"score".desc, $"doc_id".asc) // 20-row frame
    val ranked = bmRank.join(tfidf.select($"doc_id", $"score"), Seq("doc_id"))
      .withColumn("rank_tf", row_number().over(w))
    val pairs = ranked.as("a").join(ranked.as("b"),
        $"a.rank_bm" < $"b.rank_bm")
      .select(when($"a.rank_tf" < $"b.rank_tf", 1L).otherwise(0L).as("conc"))
      .agg(count(lit(1)).as("n_pairs"), sum($"conc").as("concordant"))
    val foot = ranked
      .agg(count(lit(1)).as("n_docs"),
        sum(abs($"rank_bm" - $"rank_tf")).cast(LongType).as("footrule"))
    foot.crossJoin(pairs)
      .select($"n_docs", $"n_pairs", $"concordant",
        ($"n_pairs" - $"concordant").as("discordant"),
        Num.roundAt(($"concordant" * 2L - $"n_pairs").cast(DoubleType)
          / $"n_pairs".cast(DoubleType), 6).as("kendall_tau"),
        $"footrule")
  }

  // ---------------------------------------------------------------------
  // q207: reciprocal-rank-fusion (RRF) — the fusion operator q194's
  // agreement statistic argues for: when two scorers barely agree
  // (measured tau 0.07 between BM25 and TF-IDF here), the standard
  // production answer is not to pick one but to FUSE their rankings —
  // RRF(d) = Σ_lists 1/(60 + rank_d), the k=60 form every hybrid
  // (lexical + vector) search stack ships, robust because it consumes
  // only RANKS, never incomparable score scales. Each scorer
  // contributes its global top-20; the fused top-10 carries both source
  // ranks so the readout shows which list each winner came from
  // (consensus docs rise, single-list docs sink). Determinism: ranks
  // are exact ints off total orders (score desc, doc_id); RRF is a
  // fixed-order two-term sum of exact-int reciprocals. Scale shape:
  // corpus work is the two posting-list-filtered scorers (never a
  // corpus scan per query term); everything after the two top-20
  // frames is ≤ 40 rows.
  // r14->r15 bench adjudication: r14 board 1.93 s was steal; the warm floor
  // needs ~6 reps to surface (many small parallel subquery jobs) and lands
  // at 1.20 s in a clean window, at the r13 board (1.22). Plan unchanged.
  private def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bmRank = s.createDataFrame(
      bm25Top(s, dir).zipWithIndex.toSeq.map { case ((id, _), i) =>
        (id, i + 1)
      }).toDF("doc_id", "rank_bm")
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin("join", "scan", "merge"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, dir)
      .agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val wtf = Window.orderBy($"score".desc, $"doc_id".asc)
    val tfRank = tf.join(broadcast(dfq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("sc", $"tf" * log($"n_docs" / $"df"))
      .groupBy($"doc_id")
      .agg(sum(when($"term" === "join", $"sc")).as("s1"),
        sum(when($"term" === "scan", $"sc")).as("s2"),
        sum(when($"term" === "merge", $"sc")).as("s3"))
      .withColumn("score", coalesce($"s1", lit(0.0))
        + coalesce($"s2", lit(0.0)) + coalesce($"s3", lit(0.0)))
      .withColumn("rank_tf", row_number().over(wtf))
      .filter($"rank_tf" <= 20)
      .select($"doc_id", $"rank_tf")
    val wf = Window.orderBy($"rrf".desc, $"doc_id".asc)
    bmRank.join(tfRank, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + $"rank_bm"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"rank_tf"), lit(0.0)))
      .withColumn("fused_rank", row_number().over(wf))
      .filter($"fused_rank" <= 10)
      .select($"fused_rank", $"doc_id", $"rank_bm", $"rank_tf",
        Num.roundAt($"rrf", 6).as("rrf_score"))
      .orderBy($"fused_rank")
  }

  // ---------------------------------------------------------------------
  // q226: DSIR-style importance-weighted data selection (Xie et al.
  // 2023, "Data Selection for Language Models via Importance
  // Resampling") — the modern answer to "which slice of a 100 TB crawl
  // looks like my target distribution": featurize every doc into HASHED
  // N-GRAM BUCKET counts (unigrams + bigrams → 1024 buckets, the
  // dimension-free trick that makes the estimator one broadcastable
  // table instead of a vocabulary), fit two smoothed bag-of-ngrams
  // models — the TARGET class (lang = 'en', the wanted distribution)
  // and the RAW pool (everything) — and score each doc by its summed
  // log-likelihood ratio Σ_tokens [ln p̂_t(b) − ln p̂_r(b)]. The census
  // reads selection per LANGUAGE at the top-20% cutoff: English rises,
  // the rest fall in proportion to shared-bucket collision mass — the
  // interpretable cross-lingual readout of what the sampler would buy.
  // Determinism: bucket deltas are floor-scaled to int micro-units ONCE
  // per bucket (ln matches across engines — q127/q159/q182 precedent;
  // int64 per-doc sums are order-free), and the cutoff is the exact
  // percentile both engines interpolate identically (q52 precedent).
  // Gumbel-noise resampling is replaced by the deterministic top-quantile
  // cut — same selection set the expected-weight resampler concentrates
  // on, and the only version an oracle can replay.
  // Scale shape: ONE token-stream shuffle (doc_id, bucket) with map-side
  // combine; bucket stats aggregate FROM that frame (never a second
  // corpus scan) into a 1024-row broadcast; census is |lang| rows. The
  // token stream never persists; the only wide exchange carries
  // (doc_id, bucket, count) — tokens collapse before they shuffle.
  // Round-13 watch item (r12 verdict #8, the 2.66→3.22 s board delta
  // after the restructure): 16-job trace at sf0.1, largest job 0.35 s,
  // warm resident 1.81 s min-of-4 — no dominant stage appeared, so the
  // board delta is bench-condition variance (cold caches between 290
  // queries read ~2× resident, the documented factor), not a
  // regression. sf1 paired ratio re-measured at 2.1× (6.4 s vs 3.1 s).
  // r14->r15 bench adjudication: r14 board 2.90 s was steal; clean-window
  // warm min (r15) = 1.35 s, well below the r13 board (2.04). Plan unchanged.
  private def dsirSelection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = 1024
    val docs = Tables.documents(s, dir).select($"doc_id", $"lang", $"text")
      .withColumn("ts", split($"text", " "))
    // unigrams ++ bigrams via the native shingle_windows GENERATOR (one
    // row per 2-token window, space-joined — the same strings the
    // composed transform/sequence spelling builds). Two streamed
    // generates over the 3-column scan beat one triple-HOF
    // transform-explode 0.49 s vs 0.83 s warm at sf0.1: the generator
    // keeps the fan-out inside whole-stage codegen, while project
    // collapsing re-inlines the lambda arrays at every reference in the
    // composed form (the measured HOF-CSE trap). Docs with < 2 tokens
    // emit no bigram window by the generator's contract — the q184
    // descending-sequence guard is structural here, not a filter.
    val uni = docs.select($"doc_id", $"lang", explode($"ts").as("g"))
    val bi = docs.select($"doc_id", $"lang",
        expr("shingle_windows(ts, 2)").as(Seq("pos", "g")))
      .select($"doc_id", $"lang", $"g")
    val grams = uni.unionAll(bi)
      .withColumn("b", expr(s"h7(g) % $B"))
    // one shuffle: per-(doc, bucket) counts; everything derives from it.
    // PERSISTED — two consumers (the 1024-row bucket stats and the
    // per-doc score join), and without the cache each would re-run the
    // token explode + combine from the corpus scan. This frame is the
    // collapsed (doc, bucket) census (≤ 1024 rows per doc, no text), so
    // it is orders of magnitude smaller than the token stream it sums.
    val dbc = grams.groupBy($"doc_id", $"lang", $"b")
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dbc.groupBy($"b")
      .agg(sum(when($"lang" === "en", $"c").otherwise(0L)).as("ct"),
        sum($"c").as("cr"))
    // totals straight off the cached frame — summing the 1024-row stats
    // would re-run its aggregation chain for the broadcast job
    val tots = dbc.agg(
      sum(when($"lang" === "en", $"c").otherwise(0L)).as("tt"),
      sum($"c").as("tr"))
    // add-one smoothing over B buckets; delta frozen to int micro-units
    // at the BUCKET (1024 rows), so per-doc scores are exact int sums
    val delta = stats.crossJoin(broadcast(tots))
      .select($"b",
        floor((log(($"ct" + lit(1)).cast(DoubleType) /
            ($"tt" + lit(B)).cast(DoubleType)) -
          log(($"cr" + lit(1)).cast(DoubleType) /
            ($"tr" + lit(B)).cast(DoubleType))) * lit(1000000.0))
          .cast(LongType).as("dm"))
    // PERSISTED (round-12): scores has two consumers — the percentile
    // cut and the per-language census — and without the cache each
    // re-runs the dbc→delta join and per-doc aggregation chain end to
    // end (measured: the duplicated chain was ~0.6 s of the 2.7 s warm).
    // The frame is one slim row per doc.
    val scores = dbc.join(broadcast(delta), Seq("b"))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"c" * $"dm").as("score_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cut = scores.agg(
      percentile($"score_micro", lit(0.8)).as("thr"))
    scores.crossJoin(broadcast(cut))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"score_micro" >= $"thr", 1L).otherwise(0L)).as("n_sel"),
        sum($"score_micro").as("sum_score_micro"))
      .select($"lang", $"n_docs", $"n_sel",
        Num.roundAt($"n_sel".cast(DoubleType) / $"n_docs".cast(DoubleType), 6)
          .as("sel_rate"),
        $"sum_score_micro")
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------------
  // q229: Gopher-style repetition filters (Rae et al. 2021, MassiveText
  // quality rules C.2) — q70 publishes ONE per-doc repeated-bigram
  // score; this is the POLICY harness for the full rule family (the
  // q209/q213 pattern): the two intra-document repetition signals a
  // pretraining pipeline screens before any inter-document dedup —
  // (a) the occurrence share of the MODAL 2-gram (boilerplate/spam
  // keyword stuffing) and (b) the duplicated-5-gram occurrence fraction
  // (a document repeating itself). The raw corpus is word-salad with a
  // ~40-term vocabulary, so both signals are naturally near zero; two
  // deterministic planted waves make the rules' operating point
  // measurable (the q227/q158 pattern): doc_id%7 docs get ' buy now'
  // keyword-stuffing proportional to their length (share ~1/6 regardless
  // of doc size — the reason the rule must be RELATIVE, not an absolute
  // count), and doc_id%9 (not also %7) docs are self-concatenated
  // (dup-5-gram frac → ~0.5 for long docs, decaying below threshold for
  // tiny ones — the census SHOWS the short-doc evasion instead of hiding
  // it). Census per source: flags fired, planted wave caught,
  // precision/recall of flag-any vs planted-any.
  // Determinism: both fractions are frozen per doc as pure-integer
  // micro-units (maxc*1e6 div total — no float ever compares against
  // the threshold), means are exact int64 sums scaled once at the end.
  // Scale shape: ONE corpus scan builds both gram families in a single
  // projection; (doc, gram) pairs shuffle once with map-side combine
  // (reduce side sees per-doc distinct grams, ~doc length, never
  // corpus x vocabulary); the census is |sources| rows. At 100 TB the
  // modal-gram census stays doc-local — nothing global is built.
  private def gopherRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = docs(s, dir)
      .select($"doc_id", $"source", $"text",
        size(split($"text", " ")).as("n0"))
      .withColumn("wave_a", $"doc_id" % 7 === 0 && $"n0" >= 8)
      .withColumn("wave_b", $"doc_id" % 9 === 0 && $"doc_id" % 7 =!= 0)
      .withColumn("txt",
        when($"wave_a", concat($"text", expr("repeat(' buy now', n0 div 4)")))
          .when($"wave_b", concat($"text", lit(" "), $"text"))
          .otherwise($"text"))
      .withColumn("planted", $"wave_a" || $"wave_b")
      .withColumn("ts", split($"txt", " "))
      .withColumn("n", size($"ts"))
      .withColumn("g2",
        when($"n" >= 2, expr(
          "transform(sequence(1, n - 1), i -> concat_ws(' ', slice(ts, i, 2)))"))
          .otherwise(expr("cast(array() as array<string>)")))
      .withColumn("g5",
        when($"n" >= 5, expr(
          "transform(sequence(1, n - 4), i -> concat_ws(' ', slice(ts, i, 5)))"))
          .otherwise(expr("cast(array() as array<string>)")))
      .select($"doc_id", $"source", $"planted", $"g2", $"g5")
    val grams = corpus.select($"doc_id", explode(concat(
        transform($"g2", g => struct(lit(2).as("k"), g.as("g"))),
        transform($"g5", g => struct(lit(5).as("k"), g.as("g"))))).as("kg"))
      .select($"doc_id", $"kg.k".as("k"), $"kg.g".as("g"))
    val per = grams.groupBy($"doc_id", $"k", $"g")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max(when($"k" === 2, $"c")).as("max2"),
        sum(when($"k" === 2, $"c")).as("tot2"),
        sum(when($"k" === 5, $"c")).as("tot5"),
        count(when($"k" === 5, lit(1))).as("nd5"))
    corpus.select($"doc_id", $"source", $"planted")
      .join(per, Seq("doc_id"), "left")
      .withColumn("top2_micro",
        coalesce(expr("max2 * 1000000 div tot2"), lit(0L)))
      .withColumn("dup5_micro",
        coalesce(expr("(tot5 - nd5) * 1000000 div tot5"), lit(0L)))
      .withColumn("f2", $"top2_micro" >= 100000L)
      .withColumn("f5", $"dup5_micro" >= 300000L)
      .withColumn("fa", $"f2" || $"f5")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"planted", 1L).otherwise(0L)).as("n_planted"),
        sum(when($"f2", 1L).otherwise(0L)).as("n_flag_top2"),
        sum(when($"f5", 1L).otherwise(0L)).as("n_flag_dup5"),
        sum(when($"fa", 1L).otherwise(0L)).as("n_flagged"),
        sum(when($"fa" && $"planted", 1L).otherwise(0L)).as("n_caught"),
        sum($"dup5_micro").as("sum_dup5_micro"))
      .select($"source", $"n_docs", $"n_planted", $"n_flag_top2",
        $"n_flag_dup5", $"n_flagged", $"n_caught",
        when($"n_flagged" > 0, Num.roundAt(
          $"n_caught".cast(DoubleType) / $"n_flagged".cast(DoubleType), 6))
          .as("flag_precision"),
        when($"n_planted" > 0, Num.roundAt(
          $"n_caught".cast(DoubleType) / $"n_planted".cast(DoubleType), 6))
          .as("flag_recall"),
        $"sum_dup5_micro",
        Num.roundAt($"sum_dup5_micro".cast(DoubleType) /
          ($"n_docs".cast(DoubleType) * lit(1000000.0)), 6)
          .as("mean_dup5_frac"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // q230: temperature-scaled language sampling sweep (the multilingual
  // mixture knob of mBERT/XLM-R: sample language l with probability
  // proportional to p_l^alpha, alpha < 1 upweighting low-resource
  // languages) — the DERIVED-weights sibling of q121 (which takes target
  // weights as GIVEN) and q202/q214 (which apportion a fixed mixture).
  // For alpha in {0.25, 0.5, 0.75, 1.0} the sweep prices one knob value
  // per row: token budget allocated per language by Hamilton largest
  // remainder over the tempered weights, plus the boost factor
  // alloc/corpus-mass that shows exactly how hard each alpha leans into
  // the tail. alpha = 1.0 is the self-check row: tempered weight ==
  // corpus share, boost ~= budget fraction for every language.
  // Determinism: the ONLY float is the tempered weight exp(alpha ln p),
  // frozen to int micro-units per (language, alpha) — a 4x|langs| row
  // dictionary (the q226/q227 freeze pattern); every allocation after
  // that is exact int64 largest-remainder arithmetic (q228 precedent),
  // so Sigma alloc == budget exactly per alpha.
  // Scale shape: ONE corpus scan reduces to the |langs|-row token-mass
  // frame; the sweep is arithmetic over |langs| x 4 rows joined via
  // 1-row aggregates — at 100 TB the scan is the entire cost.
  private def temperatureMixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mass = docs(s, dir)
      .groupBy($"lang")
      .agg(sum(size(split($"text", " ")).cast(LongType)).as("toks"))
    val tot = mass.agg(sum($"toks").as("tt"))
    val alphas = Seq(25L, 50L, 75L, 100L).toDF("alpha_pct")
    val w = mass.crossJoin(broadcast(tot)) // 1-row aggregate frame
      .crossJoin(broadcast(alphas))
      .withColumn("w_micro",
        floor(exp(($"alpha_pct".cast(DoubleType) / lit(100.0)) *
          log($"toks".cast(DoubleType) / $"tt".cast(DoubleType))) *
          lit(1000000.0)).cast(LongType))
    val sums = w.groupBy($"alpha_pct")
      .agg(sum($"w_micro").as("sw"), max($"tt").as("tt"))
      .withColumn("budget", expr("tt div 2"))
    val quota = w.drop("tt").join(broadcast(sums), Seq("alpha_pct"))
      .withColumn("base", expr("budget * w_micro div sw"))
      .withColumn("rem", expr("budget * w_micro % sw"))
    val leftover = quota.groupBy($"alpha_pct")
      .agg((max($"budget") - sum($"base")).as("extra"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy($"alpha_pct").orderBy($"rem".desc, $"lang".asc)
    quota.join(broadcast(leftover), Seq("alpha_pct"))
      .withColumn("alloc",
        $"base" + when(row_number().over(rk) <= $"extra", 1L).otherwise(0L))
      .select(
        Num.roundAt($"alpha_pct".cast(DoubleType) / lit(100.0), 2)
          .as("alpha"),
        $"lang", $"toks".as("corpus_tokens"),
        expr("toks * 1000000 div tt").as("share_micro"),
        $"w_micro", $"alloc".as("alloc_tokens"),
        Num.roundAt($"alloc".cast(DoubleType) / $"toks".cast(DoubleType), 6)
          .as("boost"))
      .orderBy($"alpha", $"lang")
  }

  // ---------------------------------------------------------------------
  // q233: context-length packing sweep — the "which sequence length"
  // decision input q79's packer (fixed 4096) takes as given. Training
  // pipelines that concatenate-and-chop a shard into fixed windows pay
  // two costs that move OPPOSITE ways with L: boundary fragmentation
  // (docs split across window edges lose cross-boundary attention;
  // shrinks as L grows) and tail padding (the last window per shard is
  // part-empty; grows as L grows). The sweep prices L in {128, 512,
  // 2048} from ONE per-language running cumsum — a doc occupying token
  // span [cum-n, cum-1] is split iff its span crosses a multiple of L,
  // i.e. (cum-1) div L != (cum-n) div L — so all three candidate
  // lengths read the same window frame and no re-scan or re-sort
  // happens per L. Everything is exact integer arithmetic.
  // Scale shape: q79's — the cumsum windows partition by language
  // ((lang, shard) at 100 TB so no ordering grows unbounded); the sweep
  // is a 3-row broadcast cross join; census is 3 rows.
  private def packingSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = docs(s, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast(LongType).as("n"))
      .withColumn("cum", sum($"n").over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ls = Seq(128L, 512L, 2048L).toDF("ctx_len")
    val frag = c.crossJoin(broadcast(ls))
      .withColumn("n_cross",
        expr("(cum - 1) div ctx_len - (cum - n) div ctx_len"))
      .groupBy($"ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"n_cross" > 0, 1L).otherwise(0L)).as("n_split_docs"),
        sum($"n_cross").as("n_boundary_cuts"))
    val pad = c.groupBy($"lang").agg(max($"cum").as("t"))
      .crossJoin(broadcast(ls))
      .groupBy($"ctx_len")
      .agg(sum(expr("(t + ctx_len - 1) div ctx_len")).as("n_seqs"),
        sum(expr("((t + ctx_len - 1) div ctx_len) * ctx_len - t"))
          .as("pad_tokens"))
    frag.join(pad, Seq("ctx_len"))
      .select($"ctx_len", $"n_docs", $"n_split_docs", $"n_boundary_cuts",
        $"n_seqs", $"pad_tokens",
        Num.roundAt($"n_split_docs".cast(DoubleType) /
          $"n_docs".cast(DoubleType), 6).as("split_frac"),
        Num.roundAt($"pad_tokens".cast(DoubleType) /
          ($"n_seqs" * $"ctx_len").cast(DoubleType), 6).as("pad_frac"))
      .orderBy($"ctx_len")
  }

  // ---------------------------------------------------------------------
  // q235: phrase-vocabulary coverage sweep — "how many merges buy how
  // much of the corpus": rank the bigram vocabulary by frequency and
  // read the exact token-mass coverage of the top K ∈ {50, 200, 800}
  // phrases — the merge-budget sizing input for q114's BPE (frequency
  // mass is what greedy BPE optimizes) and the OOV-rate twin of q170's
  // fertility. Unigrams would be degenerate on this corpus (~46-term
  // vocabulary, any K covers 100%); the bigram space (~vocab²) has the
  // Zipf tail that makes the knee measurable. Census per K: covered
  // occurrences, coverage fraction, OOV fraction, and the share of the
  // DISTINCT vocabulary the budget spends — all exact ints over one
  // (bigram, count) frame.
  // Scale shape: one corpus scan explodes bigrams into a map-side-
  // combined count; the rank window runs on the VOCABULARY-sized count
  // frame (dictionary scale, q159's Zipf precedent — at 100 TB a df-cap
  // pre-filter bounds it before the single-partition rank); the sweep
  // is a 3-row broadcast cross join against per-K running masses.
  private def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val big = docs(s, dir)
      .select(split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1)," +
          " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
        .as("g"))
    val counts = big.groupBy($"g").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum($"c").as("n_occ"),
      count(lit(1)).as("n_vocab"))
    // only ranks ≤ max(k_budget)=800 ever survive the filter, so the
    // rank/running-mass windows run on a distributed TakeOrdered
    // top-800 — an 800-row constant-bounded frame (partitioned by a
    // literal so WindowExec doesn't log its data-scale warning) — never
    // on the full bigram vocabulary, which grows with the corpus
    val ranked = counts
      .orderBy($"c".desc, $"g".asc).limit(800)
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(0)).orderBy($"c".desc, $"g".asc)))
      .withColumn("cum", sum($"c").over(
        Window.partitionBy(lit(0)).orderBy($"rk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ks = Seq(50L, 200L, 800L).toDF("k_budget")
    ranked.crossJoin(broadcast(ks))
      .filter($"rk" <= $"k_budget")
      .groupBy($"k_budget")
      .agg(max($"cum").as("covered_occ"), count(lit(1)).as("k_eff"))
      .crossJoin(broadcast(tot)) // 1-row totals frame
      .select($"k_budget", $"k_eff", $"covered_occ", $"n_occ", $"n_vocab",
        Num.roundAt($"covered_occ".cast(DoubleType) /
          $"n_occ".cast(DoubleType), 6).as("coverage"),
        Num.roundAt(($"n_occ" - $"covered_occ").cast(DoubleType) /
          $"n_occ".cast(DoubleType), 6).as("oov_rate"),
        Num.roundAt($"k_eff".cast(DoubleType) /
          $"n_vocab".cast(DoubleType), 6).as("vocab_spend"))
      .orderBy($"k_budget")
  }

  // ---------------------------------------------------------------------
  // q241: leave-one-source-out influence — the cheapest member of the
  // data-valuation family (the question Shapley-value sampling
  // approximates): how much does each SOURCE contribute to how well the
  // corpus statistics model held-out text? A fixed probe shard
  // (doc_id % 23) is scored under the full train unigram model and
  // under each of the 20 leave-one-source-out models; influence =
  // NLL_loo − NLL_full (positive ⇒ the source was helping). The LOO
  // trick that makes this one pass instead of 21: every LOO count is
  // c_full(t) − c_(t,s), so all 21 dictionaries derive ARITHMETICALLY
  // from one (term, source) count frame — no per-model corpus re-scan,
  // the reason this operator is runnable at 100 TB while true Shapley
  // is not. Smoothing is add-one over the full-train vocabulary for
  // every model (same V, so influence isolates the counts, not the
  // support). Determinism: ln((c+1)/(T+V)) frozen to int micro-units
  // per (term, model) — a |V| x 21 dictionary (q226/q227 freeze
  // pattern); probe scores are exact int sums over the probe's
  // aggregate term counts (no per-doc state at all).
  // Scale shape: two scans (train counts, probe counts) collapse to
  // dictionary-sized frames; everything after is arithmetic on
  // |V| x |sources| rows.
  // r14->r15 bench adjudication: r14 board 1.36 s was steal; clean-window
  // warm min (r15) = 0.92 s, below the r13 board (1.04). Plan unchanged.
  private def looInfluence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", $"source", explode(split($"text", " ")).as("t"))
    val isProbe = $"doc_id" % 23 === 0
    val tc = toks.filter(!isProbe)
      .groupBy($"t", $"source").agg(count(lit(1)).as("c_ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val full = tc.groupBy($"t").agg(sum($"c_ts").as("c_t"))
    val srcTot = tc.groupBy($"source").agg(sum($"c_ts").as("t_s"))
    val gl = full.agg(sum($"c_t").as("t_full"),
      count(lit(1)).as("v"))
    // 21 models: '__full__' plus one LOO per source, each a (T, and a
    // per-term count derivable from c_t and c_ts)
    val models = srcTot.crossJoin(broadcast(gl))
      .select($"source".as("model"), ($"t_full" - $"t_s").as("t_m"), $"v")
      .unionAll(gl.select(lit("__full__").as("model"),
        $"t_full".as("t_m"), $"v"))
    val dict = full.crossJoin(broadcast(models))
      .join(tc.select($"t", $"source".as("model"), $"c_ts"),
        Seq("t", "model"), "left")
      .withColumn("c_m", $"c_t" - coalesce($"c_ts", lit(0L)))
      .withColumn("lnp_micro",
        floor(log(($"c_m" + 1).cast(DoubleType) /
          ($"t_m" + $"v").cast(DoubleType)) * lit(1000000.0))
          .cast(LongType))
      .select($"t", $"model", $"lnp_micro")
    val pt = toks.filter(isProbe).groupBy($"t")
      .agg(count(lit(1)).as("pc"))
    // probe terms unseen by a model fall to the add-one floor ln(1/(T+V))
    val scoredM = pt.crossJoin(broadcast(models))
      .join(dict, Seq("t", "model"), "left")
      .withColumn("lnp", coalesce($"lnp_micro",
        floor(log(lit(1.0) / ($"t_m" + $"v").cast(DoubleType)) *
          lit(1000000.0)).cast(LongType)))
      .groupBy($"model")
      .agg(sum($"pc" * $"lnp").as("sum_lnp"), sum($"pc").as("n_tok"))
      .withColumn("nll_micro", expr("(-sum_lnp) div n_tok"))
    val fullRow = scoredM.filter($"model" === "__full__")
      .select($"nll_micro".as("nll_full_micro"))
    scoredM.filter($"model" =!= "__full__")
      .crossJoin(broadcast(fullRow)) // 1-row scalar frame
      .join(srcTot.withColumnRenamed("source", "model"), Seq("model"))
      .select($"model".as("source"), $"t_s".as("train_tokens"),
        $"n_tok".as("probe_tokens"),
        Num.roundAt($"nll_micro".cast(DoubleType) / lit(1e6), 6)
          .as("nll_loo"),
        Num.roundAt($"nll_full_micro".cast(DoubleType) / lit(1e6), 6)
          .as("nll_full"),
        ($"nll_micro" - $"nll_full_micro").as("influence_micro"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // q247: delete-one-bucket jackknife — the error bar ON a corpus metric
  // itself (q241 prices each source's influence on quality; this prices
  // how STABLE the headline number is): the corpus mean tokens-per-doc
  // is re-estimated 20 times, each time deleting one deterministic
  // md5 bucket (the q120 split rule, so the resampling plan survives
  // retries and repartitioning), and the jackknife variance
  // (G−1)/G · Σ(θ̂₍₋g₎ − θ̄)² turns the point estimate into a standard
  // error — the number a dashboard needs before calling a week-over-
  // week metric move real. Every leave-one-out mean is the TOTALS MINUS
  // THE BUCKET — (T−t_g)/(N−n_g) off one 20-row census, never 20 corpus
  // passes. Determinism: LOO means are frozen to exact int 1e-4 units
  // via integer floor-division, deviations d_g = G·loo_g − Σloo are
  // exact ints, and the squared sum runs in decimal(38,0)/HUGEINT so no
  // float exists until the final sqrt readout (single IEEE ops over
  // identical exact ints on both engines). Scale shape: ONE scan
  // reduces map-side to the 20-row bucket census; everything after is
  // broadcast arithmetic on that census.
  private def jackknifeVariance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val S = 10000L // 1e-4-unit freeze for LOO means
    val b = Tables.documents(s, dir)
      .select((Det.h7($"doc_id".cast(StringType)) % 20L).as("bucket"),
        size(split($"text", " ")).cast(LongType).as("tok"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"tok").as("sum_tokens"))
    val tot = b.agg(sum($"n_docs").as("nn"), sum($"sum_tokens").as("tt"),
      count(lit(1)).as("g"))
    val loo = b.crossJoin(broadcast(tot))
      .withColumn("loo_s",
        expr(s"($S * (tt - sum_tokens)) div (nn - n_docs)"))
    val sl = loo.agg(sum($"loo_s").as("sum_loo"))
    val d = loo.crossJoin(broadcast(sl))
      .withColumn("dd", $"g" * $"loo_s" - $"sum_loo")
    val ssd = d.agg(sum($"dd".cast(DecimalType(38, 0)) *
      $"dd".cast(DecimalType(38, 0))).as("ssd"))
    d.crossJoin(broadcast(ssd))
      .select($"bucket", $"n_docs", $"sum_tokens",
        Num.roundAt($"loo_s".cast(DoubleType) / lit(S.toDouble), 6)
          .as("loo_mean"),
        Num.roundAt($"tt".cast(DoubleType) / $"nn".cast(DoubleType), 6)
          .as("theta_mean"),
        Num.roundAt(sqrt(
          ($"g" - 1L).cast(DoubleType) * $"ssd".cast(DoubleType) /
            ($"g" * $"g" * $"g").cast(DoubleType) /
            lit(S.toDouble * S.toDouble)), 6).as("jk_se"))
      .orderBy($"bucket")
  }

  // ---------------------------------------------------------------------
  // q254: Good–Turing frequency census — the unseen-mass estimate under
  // every smoothed language model (and the honest answer to "how much
  // of the n-gram distribution has this corpus NOT seen", the question
  // q235's coverage sweep asks only about seen types): count-of-counts
  // N_r for r ≤ 10 over BIGRAMS (the corpus' 31-word unigram vocabulary
  // saturates — every word repeats 26+ times — while the bigram line
  // has the genuine rare tail GT exists for), the GT re-estimated count
  // r* = (r+1)·N_{r+1}/N_r, each level's share of total occurrence
  // mass, and the leave-mass-for-unseen estimate p₀ = N₁/N on every
  // row. All counts are exact ints off two map-side-combined groupBys;
  // the sparse N_{r+1} lookup is a self-join on r+1 (NEVER a window
  // over the sparse r line — lead() would read the next EXISTING level,
  // not level r+1); ratios are single IEEE readouts. Scale shape:
  // (bigram → count) shuffles once; count-of-counts is a vocabulary-
  // sized second aggregate; everything after runs on a ≤10-row frame
  // with two 1-row broadcasts.
  private def goodTuring(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, dir)
      .select(split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> " +
          "concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
        .as("t"))
      .groupBy($"t").agg(count(lit(1)).as("r"))
    val coc = tf.groupBy($"r").agg(count(lit(1)).as("n_types"))
    val tot = coc.agg(sum($"r" * $"n_types").as("nn"))
    val n1 = coc.filter($"r" === 1L).select($"n_types".as("n1"))
    val nxt = coc.select(($"r" - 1L).as("r"), $"n_types".as("n_next"))
    coc.join(nxt, Seq("r"), "left")
      .filter($"r" <= 10L)
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
      .select($"r", $"n_types",
        when($"n_next".isNotNull,
          Num.roundAt((($"r" + 1L) * $"n_next").cast(DoubleType) /
            $"n_types".cast(DoubleType), 6))
          .otherwise(lit(null).cast(DoubleType)).as("r_star"),
        Num.roundAt(($"r" * $"n_types").cast(DoubleType) /
          $"nn".cast(DoubleType), 6).as("mass_frac"),
        Num.roundAt($"n1".cast(DoubleType) / $"nn".cast(DoubleType), 6)
          .as("p0_unseen"))
      .orderBy($"r")
  }

  // ---------------------------------------------------------------------
  // q256: nDCG ranking-quality census — the GRADED eval the retrieval
  // family still lacked: q83 ranks by BM25, q194 compares rankers by
  // rank agreement, but nothing scored a ranking against graded
  // relevance. Relevance here is the exact query-term occurrence count
  // per document (an exact-int label, no judgment model), and the
  // census reads out DCG@k, ideal DCG@k and their ratio at k ∈
  // {5,10,20} — the standard "did the ranker put the heavy documents
  // up top" number. Gains rel/log₂(rank+1) are single IEEE ops in rank
  // order and the cumsums run over ≤20-row frames, so the floats are
  // cross-engine stable. Scale shape: relevance is one map-side
  // term-filtered aggregate; the ideal list is a TakeOrdered top-20
  // (never a corpus-wide window); both cumulative windows run on
  // 20-row frames.
  private def ndcgEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rel = Tables.documents(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term".isin("join", "scan", "merge"))
      .groupBy($"doc_id").agg(count(lit(1)).as("rel"))
    val log2 = (c: org.apache.spark.sql.Column) => log(c) / log(lit(2.0))
    val wS = Window.orderBy($"rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sysD = bm25(s, dir).select($"doc_id", $"rank")
      .join(rel, Seq("doc_id"), "left").na.fill(0L, Seq("rel"))
      .withColumn("dcg", sum($"rel".cast(DoubleType) /
        log2($"rank".cast(DoubleType) + lit(1.0))).over(wS))
    val ideal = rel.orderBy($"rel".desc, $"doc_id".asc).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy($"rel".desc, $"doc_id".asc)))
      .withColumn("idcg", sum($"rel".cast(DoubleType) /
        log2($"rank".cast(DoubleType) + lit(1.0))).over(wS))
    sysD.filter($"rank".isin(5, 10, 20))
      .select($"rank".cast(LongType).as("k"), $"dcg")
      .join(ideal.filter($"rank".isin(5, 10, 20))
        .select($"rank".cast(LongType).as("k"), $"idcg"), Seq("k"))
      .select($"k", Num.roundAt($"dcg", 6).as("dcg"),
        Num.roundAt($"idcg", 6).as("idcg"),
        Num.roundAt($"dcg" / $"idcg", 6).as("ndcg"))
      .orderBy($"k")
  }

  // ---------------------------------------------------------------------
  // q262: Kneser–Ney heldout perplexity — the smoothing ladder's top
  // rung (q127 add-k in-sample → q192 add-one heldout → q254's
  // Good–Turing counts → THIS, the interpolated-KN estimator every
  // n-gram LM actually ships): absolute discount D = N₁/(N₁+2N₂)
  // derived from the train count-of-counts, continuation probability
  // P_cont(w₂) = N₁₊(·w₂)/|bigram types| (how many CONTEXTS a word
  // completes — the insight that "Francisco" is frequent but
  // unversatile), and P_KN = max(c₁₂−D,0)/c₁ + D·N₁₊(w₁·)/c₁ ·
  // P_cont. Unseen w₁ backs off to P_cont alone; a word with no
  // continuation statistics gets the 1/(V+1) floor — every branch
  // total and deterministic. Same 80/20 minstd split and per-doc
  // position-ordered ln fold as q192, so the two estimators are
  // directly comparable (the spec pins KN strictly better). Scale
  // shape: the bigram frame persists once (train counts + eval probes
  // read it); all model frames are vocabulary-sized; the three eval
  // joins are the q192 shape plus one more dictionary join.
  private def knPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = 2147483647L
    val tok = Tables.documents(s, dir)
      .select($"doc_id", $"source", split($"text", " ").as("t"))
      .withColumn("is_train",
        $"doc_id" % p * 16807L % p * 48271L % p % 100 < 80)
    val big = tok.filter(size($"t") >= 2)
      .select($"doc_id", $"source", $"is_train", posexplode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> struct(element_at(t, i) as w1, element_at(t, i + 1) as w2))"))
        .as(Seq("pos", "b")))
      .select($"doc_id", $"source", $"is_train", $"pos",
        $"b.w1".as("w1"), $"b.w2".as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = big.filter($"is_train").groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // c1 carries N1+(w1·) alongside: one pass over the type dictionary
    val c1 = c12.groupBy($"w1")
      .agg(sum($"c12").as("c1"), count(lit(1)).as("r1"))
    val cl = c12.groupBy($"w2").agg(count(lit(1)).as("l2"))
    val bt = c12.agg(count(lit(1)).as("btypes"),
      sum(when($"c12" === 1L, 1L).otherwise(0L)).as("nn1"),
      sum(when($"c12" === 2L, 1L).otherwise(0L)).as("nn2"))
    val v = tok.filter($"is_train").select(explode($"t").as("w"))
      .agg(count_distinct($"w").as("v"))
    val perDoc = big.filter(!$"is_train")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(cl, Seq("w2"), "left")
      .crossJoin(broadcast(bt)).crossJoin(broadcast(v))
      .withColumn("dd", $"nn1".cast(DoubleType) /
        ($"nn1" + $"nn2" * 2L).cast(DoubleType))
      .withColumn("pc", coalesce(
        $"l2".cast(DoubleType) / $"btypes".cast(DoubleType),
        lit(1.0) / ($"v" + 1L).cast(DoubleType)))
      .withColumn("pkn", when($"c1".isNull, $"pc")
        .otherwise(
          greatest(coalesce($"c12", lit(0L)).cast(DoubleType) - $"dd",
            lit(0.0)) / $"c1".cast(DoubleType) +
          $"dd" * $"r1".cast(DoubleType) / $"c1".cast(DoubleType) * $"pc"))
      .withColumn("lp", log($"pkn"))
      .withColumn("unseen",
        when(coalesce($"c12", lit(0L)) === 0L, 1L).otherwise(0L))
      .groupBy($"doc_id", $"source", $"dd")
      .agg(count(lit(1)).as("nb"), sum($"unseen").as("nu"),
        sort_array(collect_list(struct($"pos", $"lp"))).as("lps"))
      .withColumn("nll",
        -aggregate($"lps", lit(0.0), (acc, x) => acc + x.getField("lp")) /
          $"nb".cast(DoubleType))
    perDoc.groupBy($"source", $"dd")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nb").as("n_bigrams"), sum($"nu").as("n_unseen"),
        sum(floor($"nll" * lit(1e9))).as("snll"))
      .select($"source", $"n_docs", $"n_bigrams", $"n_unseen",
        Num.roundAt($"dd", 6).as("d_discount"),
        Num.roundAt($"n_unseen".cast(DoubleType) / $"n_bigrams", 6)
          .as("unseen_rate"),
        Num.roundAt($"snll".cast(DoubleType) / $"n_docs".cast(DoubleType)
          / lit(1e9), 6).as("mean_nll"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------------
  // q264: effective token-yield census — the number a training-data
  // budget is actually planned in: raw token counts (q42) overstate a
  // corpus whose documents repeat, and the dedup ops (q20/q56) report
  // doc counts, not token mass. Per source: raw vs exact-unique
  // document and token counts and the yield ratio — "of the tokens we
  // pay to store/scan, how many survive exact dedup" — the per-source
  // discount a mixture planner (q121/q168) should apply before
  // weighting. Identical texts have identical token counts, so the
  // per-digest frame carries ONE token count and a copy count, and
  // both the raw and unique masses are exact integer sums off it.
  // Scale shape: one scan to the (source, digest) frame — only 16-byte
  // digests and two ints shuffle, never text — then a |sources|-row
  // census.
  private def tokenYield(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val uniq = Tables.documents(s, dir)
      .select($"source", md5($"text").as("digest"),
        size(split($"text", " ")).cast(LongType).as("tok"))
      .groupBy($"source", $"digest")
      .agg(count(lit(1)).as("copies"), max($"tok").as("tok"))
    uniq.groupBy($"source")
      .agg(sum($"copies").as("n_docs"), count(lit(1)).as("n_unique_docs"),
        sum($"tok" * $"copies").as("raw_tokens"),
        sum($"tok").as("unique_tokens"))
      .select($"source", $"n_docs", $"n_unique_docs",
        $"raw_tokens", $"unique_tokens",
        Num.roundAt($"unique_tokens".cast(DoubleType) /
          $"raw_tokens".cast(DoubleType), 6).as("token_yield"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // q271: dedup survivorship-shift census — dedup changes WHAT the
  // corpus is, not just how big: if duplicates skew short (boilerplate)
  // or low-diversity (templates), the surviving distribution shifts,
  // and a model trained post-dedup sees different statistics than the
  // raw corpus audit promised. One scan computes per-doc token count
  // and type-token ratio (frozen to 1e-6 ints); the pre-corpus census
  // aggregates everything, the post-corpus census aggregates one
  // smallest-id survivor per digest — and the paired rows expose the
  // shift. All integer until the mean readouts. Scale shape: per-doc
  // stats reduce map-side; the survivor election is one digest groupBy
  // (min_by smallest id, the q20 rule); censuses are 2 rows.
  private def survivorshipShift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir)
      .select($"doc_id", md5($"text").as("digest"),
        size(split($"text", " ")).cast(LongType).as("tok"),
        floor(lit(1e6) *
          size(array_distinct(split($"text", " "))).cast(DoubleType) /
          size(split($"text", " ")).cast(DoubleType)).cast(LongType)
          .as("ttr_micro"))
    def census(stage: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum($"tok").as("st"),
        sum($"ttr_micro").as("sr"))
        .select(lit(stage).as("stage"), $"n_docs",
          Num.roundAt($"st".cast(DoubleType) / $"n_docs".cast(DoubleType), 6)
            .as("mean_tokens"),
          Num.roundAt($"sr".cast(DoubleType) /
            ($"n_docs".cast(DoubleType) * lit(1e6)), 6).as("mean_ttr"))
    val post = d.groupBy($"digest")
      .agg(min_by(struct($"tok", $"ttr_micro"), $"doc_id").as("rep"))
      .select($"rep.tok".as("tok"), $"rep.ttr_micro".as("ttr_micro"))
    census("1_pre_dedup", d).unionAll(census("2_post_dedup", post))
      .orderBy($"stage")
  }

  // ---------------------------------------------------------------------
  // q272: Wilson score intervals for gate pass-rates — the error bar
  // q180/q227's retention censuses ship without: "source A passes 62%,
  // source B 58%" means nothing until the intervals separate, and the
  // Wilson interval (unlike the naive ±z√(p̂q̂/n)) stays inside [0,1]
  // and behaves at small n and extreme p̂ — exactly the regime of
  // small, dirty sources. Per source: exact pass counts for one
  // documented gate (≥ 50 tokens AND type-token ratio ≥ 0.5), the
  // point rate and the Wilson 95% bounds — one fixed IEEE float
  // sequence over exact integer counts. Scale shape: one scan,
  // map-side gate evaluation, |sources|-row census.
  private def wilsonGateCi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val z2 = 1.96 * 1.96
    val g = Tables.documents(s, dir)
      .select($"source",
        when(size(split($"text", " ")) >= 50 &&
          floor(lit(1e6) *
            size(array_distinct(split($"text", " "))).cast(DoubleType) /
            size(split($"text", " ")).cast(DoubleType)) >= 500000L,
          1L).otherwise(0L).as("pass"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"pass").as("k"))
    g.withColumn("ph", $"k".cast(DoubleType) / $"n".cast(DoubleType))
      .withColumn("den", lit(1.0) + lit(z2) / $"n".cast(DoubleType))
      .withColumn("ctr", ($"ph" + lit(z2) /
        (lit(2.0) * $"n".cast(DoubleType))) / $"den")
      .withColumn("hw", lit(1.96) * sqrt(
        $"ph" * (lit(1.0) - $"ph") / $"n".cast(DoubleType) +
          lit(z2) / (lit(4.0) * $"n".cast(DoubleType) *
            $"n".cast(DoubleType))) / $"den")
      .select($"source", $"n", $"k".as("n_pass"),
        Num.roundAt($"ph", 6).as("pass_rate"),
        Num.roundAt($"ctr" - $"hw", 6).as("wilson_lo"),
        Num.roundAt($"ctr" + $"hw", 6).as("wilson_hi"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // q279: mixture-reweight step (DoReMi-style, Xie et al. 2023's
  // group-DRO loop reduced to its data-engine core) — q121 prices a
  // STATIC corpus mixture and q226 selects docs toward a target; this
  // runs the one step that LEARNS the mixture: per language domain, the
  // unigram NLL per token (the corpus-fit loss q127's ladder measures),
  // the EXCESS loss over the corpus reference, and the exponentiated-
  // gradient update w' ∝ w·exp(η·excess) with η = 1 — domains the
  // reference model fits worst gain weight, the DoReMi prescription.
  // Determinism: ln p freezes to micro-units at the dictionary (q127
  // rule), per-domain sums are exact ints, each domain's raw updated
  // weight freezes to nano-units after the ONE exp (q230's floor-exp
  // precedent), so the normalizing sum is an exact integer reduction.
  // Scale shape: one token shuffle collapsed to (lang, term) counts
  // (persisted — dictionary AND domain sums read it), a broadcast
  // dictionary join, then 5-row frames.
  private def doremiReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ltc = docs(s, dir)
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang", $"term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = ltc.groupBy($"term").agg(sum($"c").as("ct"))
    val tot = ltc.agg(sum($"c").as("nn"))
    val lnp = dict.crossJoin(broadcast(tot))
      .select($"term",
        floor(log($"ct".cast(DoubleType) / $"nn".cast(DoubleType))
          * lit(1000000.0)).cast(LongType).as("lnp_micro"))
    val dom = ltc.join(broadcast(lnp), Seq("term"))
      .groupBy($"lang")
      .agg(sum($"c" * $"lnp_micro").as("slp"), sum($"c").as("ntok"))
    val ref = dom.agg(sum($"slp").as("tslp"), sum($"ntok").as("tn"))
    val y = dom.crossJoin(broadcast(ref))
      .withColumn("nllm", floor(-($"slp".cast(DoubleType) /
        $"ntok".cast(DoubleType))).cast(LongType))
      .withColumn("refm", floor(-($"tslp".cast(DoubleType) /
        $"tn".cast(DoubleType))).cast(LongType))
      .withColumn("excess", greatest(lit(0L), $"nllm" - $"refm"))
      .withColumn("raw", floor(lit(1e9) *
        ($"ntok".cast(DoubleType) / $"tn".cast(DoubleType)) *
        exp($"excess".cast(DoubleType) / lit(1000000.0))).cast(LongType))
    val z = y.agg(sum($"raw").as("rs"))
    y.crossJoin(broadcast(z))
      .select($"lang", $"ntok".as("n_tokens"),
        Num.roundAt($"nllm".cast(DoubleType) / lit(1000000.0), 6)
          .as("nll_per_token"),
        $"excess".as("excess_micro"),
        Num.roundAt($"ntok".cast(DoubleType) / $"tn".cast(DoubleType), 6)
          .as("old_share"),
        Num.roundAt($"raw".cast(DoubleType) / $"rs".cast(DoubleType), 6)
          .as("new_share"))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------------
  // q293: cross-source vocabulary overlap — the corpus-redundancy map a
  // mixture designer reads BEFORE weighting sources (q121/q279 tune
  // shares; this says which sources even differ): for every source pair,
  // |V_a ∩ V_b| and Jaccard over the distinct-token vocabularies. Scale
  // shape: one scan to the DISTINCT (source, token) inventory, then the
  // intersection is an equi-join ON TOKEN (per-token work = squared
  // source-occupancy of that token, Σ bounded by |sources|²·|V| — never
  // doc-pairwise), per-source sizes broadcast to the pair census. The
  // pair frame is |sources|² rows.
  private def vocabOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tv = Tables.documents(s, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = tv.groupBy($"source").agg(count(lit(1)).as("nv"))
    val inter = tv.toDF("sa", "t")
      .join(tv.toDF("sb", "t2"), $"t" === $"t2")
      .filter($"sa" < $"sb")
      .groupBy($"sa", $"sb").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("sa", "nva")), Seq("sa"))
      .join(broadcast(sizes.toDF("sb", "nvb")), Seq("sb"))
      .select($"sa".as("source_a"), $"sb".as("source_b"),
        $"nva".as("vocab_a"), $"nvb".as("vocab_b"), $"n_common",
        Num.roundAt($"n_common".cast(DoubleType) /
          ($"nva" + $"nvb" - $"n_common").cast(DoubleType), 6)
          .as("jaccard"))
      .orderBy($"source_a", $"source_b")
  }

  // ---------------------------------------------------------------------
  // q295: token burstiness census — the boilerplate detector quality
  // pipelines run beside q229's windowed repetition: a token whose
  // per-document counts are OVERDISPERSED (variance-to-mean ratio ≫ 1,
  // zeros included) concentrates in few documents — template/boilerplate
  // mass — while VMR ≈ 1 is Poisson-like organic usage. With N docs,
  // per-token occurrences cᵢ and total T: VMR = (N·Σcᵢ² − T²)/(N·T),
  // frozen to micros by integer division — exact on both engines. The
  // zeros never materialize: Σcᵢ² over docs WITH the token plus the
  // N−n₀ zeros is the same sum. Top-20 by (vmr desc, token asc) via
  // distributed TakeOrdered. Scale shape: one scan to (token, doc)
  // counts, one map-side-combinable token rollup, a top-k.
  private def tokenBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nDocs = docs.count()
    val perDoc = docs
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
      .groupBy($"t", $"doc_id").agg(count(lit(1)).as("c"))
    perDoc
      .groupBy($"t")
      .agg(count(lit(1)).as("n_docs_with"), sum($"c").as("total_occ"),
        sum($"c" * $"c").as("sumsq"))
      // decimal intermediates (N·Σc² crosses int64 at corpus scale),
      // integral `div` freeze — quotient is ≤ 1e6·max(c), bigint-safe
      .withColumn("vmr_micro", expr(
        s"""(1000000 * (cast(${nDocs}L as decimal(38,0)) * sumsq
           |  - cast(total_occ as decimal(38,0)) * total_occ))
           |div (${nDocs}L * total_occ)""".stripMargin))
      .orderBy($"vmr_micro".desc, $"t".asc).limit(20)
      .select($"t".as("token"), $"n_docs_with", $"total_occ",
        Num.roundAt($"vmr_micro".cast(DoubleType) / lit(1e6), 6).as("vmr"))
  }

  // ---------------------------------------------------------------------
  // q297: metadata mutual-information census — BEFORE stratifying or
  // mixture-weighting by two metadata fields (q228 splits on
  // (lang, source); q230/q279 weight by lang), measure whether the
  // fields are even independent: MI(lang, source) with both marginal
  // entropies and the two uncertainty coefficients U(X|Y) = MI/H(X) —
  // near-0 means the fields carry independent signal (stratify on
  // both), near-1 means one is a relabeling of the other (stratifying
  // on both just fragments strata). Determinism: each cell's
  // c·ln(cN/(c_l·c_s)) freezes to nano-units at the |langs|×|sources|
  // census (the q259 r·ln r rule), marginal entropy terms likewise, so
  // all three reductions are exact integer sums and the readouts are
  // single IEEE divisions. Scale shape: one scan map-side-combines to
  // the ≤|langs|·|sources| cell census; everything after is
  // census-sized (marginals derive FROM the cells, no second scan).
  private def fieldMi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables.documents(s, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm = cells.groupBy($"lang").agg(sum($"c").as("cl"))
    val sm = cells.groupBy($"source").agg(sum($"c").as("cs"))
    val tot = cells.agg(sum($"c").as("nn"), count(lit(1)).as("n_cells"))
    val smi = cells.join(broadcast(lm), Seq("lang"))
      .join(broadcast(sm), Seq("source"))
      .crossJoin(broadcast(tot.select($"nn")))
      .select(expr(
        """cast(floor(cast(c as double) * ln((cast(c as double)
          |  * cast(nn as double)) / (cast(cl as double)
          |  * cast(cs as double))) * 1e9) as bigint)""".stripMargin)
        .as("minano"))
      .agg(sum($"minano").as("smi"))
    val shl = lm.crossJoin(broadcast(tot.select($"nn")))
      .select(expr(
        """cast(floor(cast(cl as double) * ln(cast(nn as double)
          |  / cast(cl as double)) * 1e9) as bigint)""".stripMargin)
        .as("hn"))
      .agg(sum($"hn").as("shl"), count(lit(1)).as("n_langs"))
    val shs = sm.crossJoin(broadcast(tot.select($"nn")))
      .select(expr(
        """cast(floor(cast(cs as double) * ln(cast(nn as double)
          |  / cast(cs as double)) * 1e9) as bigint)""".stripMargin)
        .as("hn"))
      .agg(sum($"hn").as("shs"), count(lit(1)).as("n_sources"))
    tot.crossJoin(broadcast(smi)).crossJoin(broadcast(shl))
      .crossJoin(broadcast(shs))
      .select($"nn".as("n_docs"), $"n_langs", $"n_sources", $"n_cells",
        Num.roundAt($"shl".cast(DoubleType) /
          ($"nn".cast(DoubleType) * lit(1e9)), 6).as("h_lang"),
        Num.roundAt($"shs".cast(DoubleType) /
          ($"nn".cast(DoubleType) * lit(1e9)), 6).as("h_source"),
        Num.roundAt($"smi".cast(DoubleType) /
          ($"nn".cast(DoubleType) * lit(1e9)), 6).as("mi"),
        Num.roundAt($"smi".cast(DoubleType) / $"shl".cast(DoubleType), 6)
          .as("u_lang_given_source"),
        Num.roundAt($"smi".cast(DoubleType) / $"shs".cast(DoubleType), 6)
          .as("u_source_given_lang"))
  }

  // ---------------------------------------------------------------------
  // q299: Heaps'-law vocabulary-growth fit — the companion of q159's
  // Zipf fit and the capacity planner for every vocabulary-sized
  // structure in this inventory (q24's term census, q114's BPE merges,
  // q235's coverage sweep): walk the corpus in arrival (doc_id) order,
  // record distinct-vocabulary size V(n) at each token-count decile n,
  // and fit V = k·n^β by OLS on (ln n, ln V) over the 10 decile points.
  // β < 1 quantifies how sublinearly the term dictionary grows — the
  // number that says whether a vocab-keyed shuffle still fits at 100 TB.
  // The vocabulary UNIT here is the 3-token shingle (the native
  // shingle_windows generator, q138's machinery): this corpus's closed
  // 31-word unigram vocabulary saturates inside the first decile (the
  // q262-documented synthesis artifact), which would fit β = 0 exactly;
  // the ~30k-shingle space still grows through the walk, so the fit is
  // non-degenerate at every SF. On a real corpus the same operator runs
  // on unigrams unchanged. Exactness: decile boundaries are EXACT
  // arrival ranks off the per-doc cumsum (rank ⌈dN/10⌉'s doc, collected
  // as 10 driver literals); V(n) is an exact count of first occurrences
  // ≤ boundary; both lns freeze to micro-units per decile row so the
  // OLS moments are exact integer sums (q159/q258 rule) and β/k are
  // single IEEE readouts. Scale shape: one generate scan feeds BOTH the
  // per-doc count frame and the (shingle → min doc) first-occurrence
  // frame; the decile census is |V|·10 via a 10-row broadcast, the fit
  // is a 10-row fold.
  private def heapsLaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("tk"))
      .select($"doc_id", expr("shingle_windows(tk, 3)"))
      .select($"doc_id", $"shingle".as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perDoc = toks.groupBy($"doc_id")
      .agg(count(lit(1)).as("ntok"))
      .withColumn("one", lit(1L))
    val cum = Prefix.cumsum(perDoc, "doc_id",
      Seq("ntok" -> "cum_tok", "one" -> "cum_doc"))
    val nD = toks.select($"doc_id").distinct().count()
    val ranks = (1 to 10).map(d => (d.toLong * nD + 9L) / 10L)
    val rankToDecile = ranks.zipWithIndex.map { case (r, i) => r -> (i + 1L) }
    // ranks are strictly increasing for nD ≥ 10; each boundary row is
    // unique, so this collect is exactly 10 rows
    val bounds = cum.filter($"cum_doc".isin(ranks: _*))
      .select($"cum_doc", $"doc_id", $"cum_tok").collect()
      .map(r => (rankToDecile.toMap.apply(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val bdf = bounds.toSeq.toDF("decile", "bdoc", "n_tokens")
    val fo = toks.groupBy($"t").agg(min($"doc_id").as("fd"))
    val census = fo.crossJoin(broadcast(bdf))
      .filter($"fd" <= $"bdoc")
      .groupBy($"decile", $"n_tokens")
      .agg(count(lit(1)).as("vocab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pts = census.select(
      expr("cast(floor(ln(cast(n_tokens as double)) * 1e6) as bigint)").as("x"),
      expr("cast(floor(ln(cast(vocab as double)) * 1e6) as bigint)").as("y"))
    val fit = pts.agg(count(lit(1)).as("np"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select(
        (($"np" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
          ($"np" * $"sxx" - $"sx" * $"sx").cast(DoubleType)).as("beta"),
        $"np", $"sx", $"sy")
      .select($"beta",
        exp(($"sy".cast(DoubleType) - $"beta" * $"sx".cast(DoubleType)) /
          ($"np".cast(DoubleType) * lit(1e6))).as("k"))
    census.crossJoin(broadcast(fit))
      .select($"decile", $"n_tokens", $"vocab",
        Num.roundAt($"beta", 6).as("heaps_beta"),
        Num.roundAt($"k", 6).as("heaps_k"))
      .orderBy($"decile")
  }

  // ---------------------------------------------------------------------
  // q301: Chao1 unseen-vocabulary estimate — the richness extrapolation
  // beside q254's Good–Turing spectrum and q299's Heaps fit: per
  // source, how many 3-shingle TYPES exist that this crawl hasn't seen
  // yet, from the singleton/doubleton counts alone (Chao 1984,
  // bias-corrected: V + f₁(f₁−1)/(2(f₂+1)), defined even at f₂ = 0).
  // The per-source sample-coverage 1 − f₁/n (Turing) rides along — the
  // "is another crawl of this source worth it" decision pair (coverage
  // near 1 AND chao1 near V = the source is exhausted, the q183
  // novelty-curve question answered without arrival history).
  // Everything is exact integers except the two single-division
  // readouts. Scale shape: one generate scan to (source, shingle)
  // counts (map-side combined), a vocabulary-sized count-of-counts
  // rollup, |sources| output rows.
  private def chao1Richness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = docs(s, dir)
      .select($"source", split($"text", " ").as("tk"))
      .select($"source", expr("shingle_windows(tk, 3)"))
      .groupBy($"source", $"shingle").agg(count(lit(1)).as("c"))
    sc.groupBy($"source")
      .agg(count(lit(1)).as("v_obs"), sum($"c").as("n_tokens"),
        sum(when($"c" === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when($"c" === 2L, 1L).otherwise(0L)).as("f2"))
      .select($"source", $"n_tokens", $"v_obs", $"f1", $"f2",
        Num.roundAt($"v_obs".cast(DoubleType) +
          ($"f1" * ($"f1" - 1L)).cast(DoubleType) /
            (lit(2.0) * ($"f2" + 1L).cast(DoubleType)), 4).as("chao1"),
        Num.roundAt(lit(1.0) - $"f1".cast(DoubleType) /
          $"n_tokens".cast(DoubleType), 6).as("coverage"))
      .orderBy($"source")
  }

  // ---------------------------------------------------------------------
  // q302: distinctive-term extraction by weighted log-odds (Monroe,
  // Colaresi & Quinn 2008, the informative-Dirichlet-prior corpus
  // comparison): per language, which 3-shingles are OVER-represented
  // against the rest of the corpus, scored by the z of the smoothed
  // log-odds-ratio delta — the statistically honest version of the
  // "top TF-IDF terms per subcorpus" report (raw ratios blow up on rare
  // terms; the corpus-proportional prior α_i = α₀·p_i shrinks exactly
  // those). Top-3 per language by z (ties to shingle asc). Determinism:
  // counts are exact ints; each row's δ/σ is ONE fixed IEEE sequence
  // (no float crosses a reduction — the only aggregation after scoring
  // is the rank window on bit-identical doubles). Scale shape: one
  // generate scan to (lang, shingle) counts, a vocabulary-sized corpus
  // rollup broadcast back, a |langs|·|V| scored frame, per-lang top-3
  // via the rank window (WindowGroupLimit bounds the shuffle to k per
  // group per partition).
  private def logOddsTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a0 = 1000.0
    val lc = docs(s, dir)
      .select($"lang", split($"text", " ").as("tk"))
      .select($"lang", expr("shingle_windows(tk, 3)"))
      .groupBy($"lang", $"shingle").agg(count(lit(1)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = lc.groupBy($"shingle").agg(sum($"y").as("cy"))
    val nl = lc.groupBy($"lang").agg(sum($"y").as("n"))
    val nn = lc.agg(sum($"y").as("nt"))
    val scored = lc
      .join(corpus, Seq("shingle"))
      .join(broadcast(nl), Seq("lang"))
      .crossJoin(broadcast(nn))
      .withColumn("alpha",
        $"cy".cast(DoubleType) * lit(a0) / $"nt".cast(DoubleType))
      .withColumn("yo", $"cy" - $"y")   // rest-of-corpus count
      .withColumn("no", $"nt" - $"n")
      .withColumn("delta",
        log(($"y".cast(DoubleType) + $"alpha") /
          (($"n".cast(DoubleType) + lit(a0)) -
            ($"y".cast(DoubleType) + $"alpha"))) -
        log(($"yo".cast(DoubleType) + $"alpha") /
          (($"no".cast(DoubleType) + lit(a0)) -
            ($"yo".cast(DoubleType) + $"alpha"))))
      .withColumn("z", $"delta" /
        sqrt(lit(1.0) / ($"y".cast(DoubleType) + $"alpha") +
          lit(1.0) / ($"yo".cast(DoubleType) + $"alpha")))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"z".desc, $"shingle".asc)))
      .filter($"rank" <= 3)
      .select($"lang", $"rank".cast(LongType).as("rank"),
        $"shingle".as("term"), $"y".as("n_in_lang"),
        $"cy".as("n_corpus"), Num.roundAt($"z", 4).as("log_odds_z"))
      .orderBy($"lang", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q301_chao1_richness" -> (chao1Richness _),
    "q302_log_odds_terms" -> (logOddsTerms _),
    "q297_field_mi" -> (fieldMi _),
    "q299_heaps_law" -> (heapsLaw _),
    "q293_vocab_overlap" -> (vocabOverlap _),
    "q295_token_burstiness" -> (tokenBurstiness _),
    "q279_mixture_reweight" -> (doremiReweight _),
    "q262_kn_perplexity" -> (knPerplexity _),
    "q271_survivorship_shift" -> (survivorshipShift _),
    "q272_wilson_gate_ci" -> (wilsonGateCi _),
    "q264_token_yield" -> (tokenYield _),
    "q256_ndcg_eval" -> (ndcgEval _),
    "q254_good_turing" -> (goodTuring _),
    "q247_jackknife_variance" -> (jackknifeVariance _),
    "q241_loo_influence" -> (looInfluence _),
    "q235_vocab_coverage" -> (vocabCoverage _),
    "q233_packing_sweep" -> (packingSweep _),
    "q230_temperature_mixture" -> (temperatureMixture _),
    "q229_gopher_repetition" -> (gopherRepetition _),
    "q228_eval_split" -> (evalSplit _),
    "q227_gate_calibration" -> (gateCalibration _),
    "q226_dsir_selection" -> (dsirSelection _),
    "q207_rrf_fusion" -> (rrfFusion _),
    "q194_rank_agreement" -> (rankAgreement _),
    "q192_heldout_perplexity" -> (heldoutPerplexity _),
    "q184_pmi_collocations" -> (pmiCollocations _),
    "q180_quality_gates" -> (qualityGateCensus _),
    "q175_dedup_search" -> (dedupSearch _),
    "q170_tokenizer_fertility" -> (tokenizerFertility _),
    "q168_dedup_mixture" -> (dedupAwareMixture _),
    "q159_zipf_law" -> (zipfLaw _),
    "q166_proximity_rerank" -> (proximityRerank _),
    "q138_shingle_census" -> (shingleWindowsTop _),
    "q127_perplexity" -> (perplexity _),
    "q129_weighted_sample" -> (weightedSample _),
    "q120_hash_split" -> (hashSplit _),
    "q121_mixture_reweight" -> (mixtureReweight _),
    "q114_bpe_merges" -> (bpeMerges _),
    "q24_text_stats"  -> (textStats _),
    "q83_bm25"        -> (bm25 _),
    "q81_source_cap"  -> (sourceCap _),
    "q40_lang_id"     -> (langId _),
    "q41_quality"     -> (qualityScore _),
    "q42_token_count" -> (tokenCount _),
    "q43_fingerprint" -> (fingerprint _),
    "q58_tfidf"       -> (tfidf _),
    "q67_chunking"    -> (chunking _),
    "q68_pii_scrub"   -> (piiScrub _),
    "q69_length_buckets" -> (lengthBuckets _),
    "q70_repetition"  -> (repetition _),
    "q71_stratified_sample" -> (stratifiedSample _),
    "q79_sequence_pack" -> (sequencePack _),
    "q92_token_entropy" -> (tokenEntropy _),
    "q98_heavy_hitters" -> (heavyHitters _)
  )

  // q98: approximate heavy hitters — single-pass mergeable frequent-items
  // sketch (Spark 4's approx_top_k, datasketches) validated against the
  // exact counts, q36-style: the compared columns are the exact top-10
  // (term, count) plus a deterministic agreement flag. The sketch is the
  // piece that holds at 100 TB on UNBOUNDED-cardinality columns (URLs,
  // user ids) where the exact groupBy's reduce side grows with the key
  // space: one pass, fixed memory, partials merge associatively. The
  // sketch asks for top-50 (k + slack) so count ties at the top-10
  // boundary — where the sketch's intra-tie order is arbitrary — cannot
  // break the containment contract unless MORE THAN 40 terms tie at the
  // boundary count (a 5-term slack was flagged in round 5: a larger tie
  // group could nondeterministically evict a term the exact side picked
  // by term-asc). With maxItemsTracked far above the corpus vocabulary
  // the tracked counts are exact, so agreement is deterministic.
  private def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("term"))
    val sk = tok.agg(expr("approx_top_k(term, 50, 10000)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("term"), $"e.count".as("sk_n"))
    val exact = tok.groupBy($"term").agg(count(lit(1)).as("n"))
    // exact top-10 via TakeOrderedAndProject — the vocabulary aggregate
    // is UNBOUNDED at 100 TB, so a global rank window over it would
    // single-partition the whole vocabulary (the q117 defect, fixed the
    // same way): distributed partial top-k, rank from the collected
    // 10-row order
    val top = exact.orderBy($"n".desc, $"term".asc).limit(10).collect()
    s.createDataFrame(top.zipWithIndex.toSeq.map { case (r, i) =>
      (i + 1, r.getString(0), r.getLong(1))
    }).toDF("rank", "term", "n")
      .join(broadcast(sk), Seq("term"), "left")
      .select($"rank", $"term", $"n",
        ($"sk_n".isNotNull && $"sk_n" === $"n").as("sketch_agrees"))
      .orderBy("rank")
  }

  // q92: unigram (token) Shannon entropy per document — the
  // information-density quality signal next to q41's surface ratios and
  // q70's repetition score: near-zero entropy means one token dominates
  // (boilerplate, keyword stuffing), high entropy tracks natural prose.
  // Exact integer counts carry everything; the single FP reduction
  // (Σ c·ln c) is a LEFT FOLD over token-sorted terms (Det rule 2), so
  // both engines add identical doubles in identical order and
  // H = ln N − (Σ c·ln c)/N is bit-stable. Scale shape: one
  // map-side-combined shuffle to (doc_id, token) counts, one to per-doc
  // rows — state per doc is its vocabulary, never the corpus.
  private def tokenEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("c"))
    counts.groupBy($"doc_id")
      .agg(
        sum($"c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sort_array(collect_list(struct($"tok", $"c"))).as("terms"))
      .withColumn("clogc",
        aggregate($"terms", lit(0.0),
          (acc, t) => acc +
            t.getField("c").cast(DoubleType) * log(t.getField("c").cast(DoubleType))))
      .select(
        $"doc_id", $"n_tokens", $"n_types",
        Num.roundAt(
          log($"n_tokens".cast(DoubleType)) - $"clogc" / $"n_tokens".cast(DoubleType),
          6).as("entropy"))
      .orderBy("doc_id")
  }

  // q120: deterministic train/val/test split — the reproducibility
  // primitive of every training pipeline. rand()-based splits break under
  // retries, AQE re-plans and cluster-size changes; a global sort+ntile is
  // a full shuffle. Instead the split is a PURE PROJECTION of the key:
  // two rounds of the minstd Lehmer LCG (x -> x*16807 mod 2^31-1, then
  // *48271 mod 2^31-1) mix doc_id into a uniform 31-bit value, and
  // bucket h mod 100 cuts 80/10/10. Every operand stays under 2^47, so
  // the same arithmetic runs overflow-free in any engine with 64-bit
  // integers — the oracle executes the IDENTICAL formula. At 100 TB this
  // means: no shuffle, stable under re-execution and partial recompute,
  // and any derived table (embeddings, labels) lands in the SAME split by
  // recomputing the hash on the foreign key alone, no join against a
  // split-assignment table needed. Output: per-(split, source) census
  // with token mass, proving the cut tracks the 80/10/10 target.
  private def hashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val M = 2147483647L // 2^31 - 1, the minstd modulus (Mersenne prime)
    val h = $"doc_id" % M * 16807L % M * 48271L % M
    val splitCol = when(h % 100 < 80, lit("train"))
      .when(h % 100 < 90, lit("val"))
      .otherwise(lit("test"))
    docs(s, dir)
      .select($"source", splitCol.as("split"),
        size(split($"text", " ")).cast(LongType).as("toks"))
      .groupBy($"split", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("n_tokens"))
      .orderBy($"split", $"source")
  }

  // q121: domain-mixture reweighting — given per-source token masses, a
  // target mixture weight per source and a total token budget, compute
  // per-source sampling allocations with one water-filling redistribution
  // round (the DoReMi/Pile-style "sample web down, books up" op). Shape:
  // ONE corpus scan reduces to a |sources|-row frame; every subsequent
  // step (budget, caps, redistribution) is arithmetic over that tiny
  // frame joined via 1-row aggregates — at 100 TB the scan is the whole
  // cost and the mixture math is free. All allocation arithmetic is
  // exact int64 (div, least) so the oracle reproduces it bit-for-bit;
  // rate_pct is the integer floor percentage. Sources whose target
  // exceeds their inventory cap at inventory (deficit=true); the spare
  // budget spreads equally across the uncapped rest — one round,
  // documented as such (a full fixpoint iterates the same two steps).
  // r14->r15 bench adjudication: r14 board 1.78 s was steal; clean-window
  // warm min (r15) = 1.30 s, at the r13 board (1.29). Plan unchanged.
  private def mixtureReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // target weight: odd-numbered sources 9, even 1 (literal policy map;
    // a production run would join a curated weights table)
    val t = docs(s, dir)
      .select($"source", size(split($"text", " ")).cast(LongType).as("tk"))
      .groupBy($"source")
      .agg(sum($"tk").as("toks"))
      .withColumn("w",
        when(substring($"source", 4, 10).cast(LongType) % 2 === 1, 9L)
          .otherwise(1L))
    val g = t.agg(sum($"toks").as("total"), sum($"w").as("sw"))
    val p1 = t.crossJoin(g) // 1-row aggregate frame
      .withColumn("share", expr("total * 4 div 5 * w div sw"))
    val caps = p1.agg(
      sum(when($"toks" < $"share", $"share" - $"toks").otherwise(0L)).as("spare"),
      sum(when($"toks" >= $"share", 1L).otherwise(0L)).as("nun"))
    p1.crossJoin(caps) // 1-row aggregate frame
      .select(
        $"source", $"toks", $"share".as("base_share"),
        when($"toks" < $"share", $"toks")
          .otherwise(least($"toks",
            $"share" + expr("spare div greatest(nun, 1)"))).as("alloc_tokens"),
        ($"toks" < $"share").as("deficit"))
      .withColumn("rate_pct", expr("alloc_tokens * 100 div toks"))
      .orderBy($"source")
  }

  val oracle: Map[String, String] = Map(
    "q301_chao1_richness" ->
      """WITH tok AS (
        |  SELECT source, string_split(text, ' ') AS tk FROM documents),
        |idx AS (
        |  SELECT source, tk, unnest(range(1, len(tk) - 1)) AS pos
        |  FROM tok WHERE len(tk) >= 3),
        |sc AS (
        |  SELECT source, array_to_string(tk[pos:pos+2], ' ') AS sh
        |  FROM idx),
        |cnt AS (SELECT source, sh, CAST(count(*) AS BIGINT) AS c
        |      FROM sc GROUP BY 1, 2),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS v_obs,
        |        CAST(sum(c) AS BIGINT) AS n_tokens,
        |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |      FROM cnt GROUP BY 1)
        |SELECT source, n_tokens, v_obs, f1, f2,
        |  round(CAST(v_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
        |    / (2.0 * CAST(f2 + 1 AS DOUBLE)), 4) AS chao1,
        |  round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS coverage
        |FROM agg ORDER BY source""".stripMargin,

    "q302_log_odds_terms" ->
      """WITH tok AS (
        |  SELECT lang, string_split(text, ' ') AS tk FROM documents),
        |idx AS (
        |  SELECT lang, tk, unnest(range(1, len(tk) - 1)) AS pos
        |  FROM tok WHERE len(tk) >= 3),
        |sh AS (
        |  SELECT lang, array_to_string(tk[pos:pos+2], ' ') AS shingle
        |  FROM idx),
        |lc AS (SELECT lang, shingle, CAST(count(*) AS BIGINT) AS y
        |      FROM sh GROUP BY 1, 2),
        |corpus AS (SELECT shingle, CAST(sum(y) AS BIGINT) AS cy
        |      FROM lc GROUP BY 1),
        |nl AS (SELECT lang, CAST(sum(y) AS BIGINT) AS n FROM lc GROUP BY 1),
        |nn AS (SELECT CAST(sum(y) AS BIGINT) AS nt FROM lc),
        |s2 AS (SELECT lang, shingle, y, cy, n, nt,
        |        CAST(cy AS DOUBLE) * 1000.0 / CAST(nt AS DOUBLE) AS alpha,
        |        cy - y AS yo, nt - n AS nother
        |      FROM lc JOIN corpus USING (shingle) JOIN nl USING (lang), nn),
        |z AS (SELECT lang, shingle, y, cy,
        |        (ln((CAST(y AS DOUBLE) + alpha)
        |            / ((CAST(n AS DOUBLE) + 1000.0)
        |               - (CAST(y AS DOUBLE) + alpha)))
        |         - ln((CAST(yo AS DOUBLE) + alpha)
        |            / ((CAST(nother AS DOUBLE) + 1000.0)
        |               - (CAST(yo AS DOUBLE) + alpha))))
        |        / sqrt(1.0 / (CAST(y AS DOUBLE) + alpha)
        |               + 1.0 / (CAST(yo AS DOUBLE) + alpha)) AS z
        |      FROM s2),
        |r AS (SELECT lang, shingle, y, cy, z,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY z DESC, shingle ASC) AS rank
        |      FROM z)
        |SELECT lang, rank, shingle AS term, y AS n_in_lang, cy AS n_corpus,
        |  round(z, 4) AS log_odds_z
        |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    "q297_field_mi" ->
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |      FROM documents GROUP BY 1, 2),
        |lm AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl
        |      FROM cells GROUP BY 1),
        |sm AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
        |      FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
        |        CAST(count(*) AS BIGINT) AS n_cells FROM cells),
        |smi AS (SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE)
        |          * ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
        |            / (CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE))) * 1e9)
        |          AS BIGINT)) AS BIGINT) AS smi
        |      FROM cells JOIN lm USING (lang) JOIN sm USING (source), tot),
        |shl AS (SELECT CAST(sum(CAST(floor(CAST(cl AS DOUBLE)
        |          * ln(CAST(nn AS DOUBLE) / CAST(cl AS DOUBLE)) * 1e9)
        |          AS BIGINT)) AS BIGINT) AS shl,
        |        CAST(count(*) AS BIGINT) AS n_langs FROM lm, tot),
        |shs AS (SELECT CAST(sum(CAST(floor(CAST(cs AS DOUBLE)
        |          * ln(CAST(nn AS DOUBLE) / CAST(cs AS DOUBLE)) * 1e9)
        |          AS BIGINT)) AS BIGINT) AS shs,
        |        CAST(count(*) AS BIGINT) AS n_sources FROM sm, tot)
        |SELECT nn AS n_docs, n_langs, n_sources, n_cells,
        |  round(CAST(shl AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e9), 6)
        |    AS h_lang,
        |  round(CAST(shs AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e9), 6)
        |    AS h_source,
        |  round(CAST(smi AS DOUBLE) / (CAST(nn AS DOUBLE) * 1e9), 6) AS mi,
        |  round(CAST(smi AS DOUBLE) / CAST(shl AS DOUBLE), 6)
        |    AS u_lang_given_source,
        |  round(CAST(smi AS DOUBLE) / CAST(shs AS DOUBLE), 6)
        |    AS u_source_given_lang
        |FROM tot, smi, shl, shs""".stripMargin,

    "q299_heaps_law" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |idx AS (
        |  SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS pos
        |  FROM tok WHERE len(tk) >= 3),
        |toks AS (
        |  SELECT doc_id, array_to_string(tk[pos:pos+2], ' ') AS t
        |  FROM idx),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok
        |      FROM toks GROUP BY 1),
        |cum AS (SELECT doc_id,
        |        CAST(sum(ntok) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum_tok,
        |        CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
        |          AS cum_doc
        |      FROM pd),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pd),
        |decs AS (SELECT CAST(d AS BIGINT) AS decile, (d * n + 9) // 10 AS rk
        |      FROM (SELECT unnest(generate_series(1, 10)) AS d), nd),
        |b AS (SELECT decile, doc_id AS bdoc, cum_tok AS n_tokens
        |      FROM decs JOIN cum ON cum.cum_doc = decs.rk),
        |fo AS (SELECT t, CAST(min(doc_id) AS BIGINT) AS fd
        |      FROM toks GROUP BY 1),
        |census AS (SELECT decile, n_tokens, CAST(count(*) AS BIGINT) AS vocab
        |      FROM fo, b WHERE fd <= bdoc GROUP BY 1, 2),
        |pts AS (SELECT
        |        CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |        CAST(floor(ln(CAST(vocab AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |      FROM census),
        |fit0 AS (SELECT CAST(count(*) AS BIGINT) AS np,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * y) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx FROM pts),
        |fit AS (SELECT CAST(np * sxy - sx * sy AS DOUBLE)
        |          / CAST(np * sxx - sx * sx AS DOUBLE) AS beta,
        |        np, sx, sy FROM fit0),
        |f2 AS (SELECT beta,
        |        exp((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
        |          / (CAST(np AS DOUBLE) * 1e6)) AS k FROM fit)
        |SELECT decile, n_tokens, vocab,
        |  round(beta, 6) AS heaps_beta, round(k, 6) AS heaps_k
        |FROM census, f2 ORDER BY decile""".stripMargin,

    "q293_vocab_overlap" ->
      """WITH tv AS (SELECT DISTINCT source, t.tok AS t
        |      FROM documents,
        |        unnest(string_split(text, ' ')) AS t(tok)
        |      WHERE t.tok <> ''),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
        |      FROM tv GROUP BY 1),
        |inter AS (SELECT a.source AS sa, b.source AS sb,
        |        CAST(count(*) AS BIGINT) AS n_common
        |      FROM tv a JOIN tv b ON a.t = b.t AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT sa AS source_a, sb AS source_b,
        |  za.nv AS vocab_a, zb.nv AS vocab_b, n_common,
        |  round(CAST(n_common AS DOUBLE)
        |    / CAST(za.nv + zb.nv - n_common AS DOUBLE), 6) AS jaccard
        |FROM inter
        |JOIN sz za ON za.source = sa
        |JOIN sz zb ON zb.source = sb
        |ORDER BY source_a, source_b""".stripMargin,

    "q295_token_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |pd AS (SELECT t.tok AS t, doc_id,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM documents,
        |        unnest(string_split(text, ' ')) AS t(tok)
        |      WHERE t.tok <> '' GROUP BY 1, 2),
        |tok AS (SELECT t, CAST(count(*) AS BIGINT) AS n_docs_with,
        |        CAST(sum(c) AS BIGINT) AS total_occ,
        |        CAST(sum(c * c) AS BIGINT) AS sumsq
        |      FROM pd GROUP BY 1),
        |v AS (SELECT t, n_docs_with, total_occ,
        |        CAST((1000000 * (CAST(n AS HUGEINT) * sumsq
        |            - CAST(total_occ AS HUGEINT) * total_occ))
        |          // (CAST(n AS HUGEINT) * total_occ) AS BIGINT)
        |          AS vmr_micro
        |      FROM tok, nd)
        |SELECT t AS token, n_docs_with, total_occ,
        |  round(CAST(vmr_micro AS DOUBLE) / 1e6, 6) AS vmr
        |FROM v ORDER BY vmr_micro DESC, t ASC LIMIT 20""".stripMargin,

    "q279_mixture_reweight" ->
      """WITH ltc AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |lc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
        |      FROM ltc GROUP BY 1, 2),
        |dict AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct
        |      FROM lc GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM dict),
        |lnp AS (SELECT term,
        |        CAST(floor(ln(CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
        |          * 1000000.0) AS BIGINT) AS lnp_micro
        |      FROM dict, tot),
        |dom AS (SELECT lang, CAST(sum(c * lnp_micro) AS BIGINT) AS slp,
        |        CAST(sum(c) AS BIGINT) AS ntok
        |      FROM lc JOIN lnp USING (term) GROUP BY 1),
        |ref AS (SELECT CAST(sum(slp) AS BIGINT) AS tslp,
        |        CAST(sum(ntok) AS BIGINT) AS tn FROM dom),
        |x AS (SELECT lang, ntok, tn,
        |    CAST(floor(-(CAST(slp AS DOUBLE) / CAST(ntok AS DOUBLE)))
        |      AS BIGINT) AS nllm,
        |    CAST(floor(-(CAST(tslp AS DOUBLE) / CAST(tn AS DOUBLE)))
        |      AS BIGINT) AS refm
        |  FROM dom, ref),
        |y AS (SELECT lang, ntok, tn, nllm,
        |    greatest(0, nllm - refm) AS excess,
        |    CAST(floor(1000000000.0
        |      * (CAST(ntok AS DOUBLE) / CAST(tn AS DOUBLE))
        |      * exp(CAST(greatest(0, nllm - refm) AS DOUBLE) / 1000000.0))
        |      AS BIGINT) AS raw
        |  FROM x),
        |z AS (SELECT CAST(sum(raw) AS BIGINT) AS rs FROM y)
        |SELECT lang, ntok AS n_tokens,
        |  round(CAST(nllm AS DOUBLE) / 1000000.0, 6) AS nll_per_token,
        |  CAST(excess AS BIGINT) AS excess_micro,
        |  round(CAST(ntok AS DOUBLE) / CAST(tn AS DOUBLE), 6) AS old_share,
        |  round(CAST(raw AS DOUBLE) / CAST(rs AS DOUBLE), 6) AS new_share
        |FROM y, z ORDER BY lang""".stripMargin,

    "q271_survivorship_shift" ->
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS digest,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |         CAST(floor(1000000.0
        |             * CAST(len(list_distinct(string_split(text, ' ')))
        |                 AS DOUBLE)
        |             / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |           AS BIGINT) AS ttr_micro
        |  FROM documents),
        |post AS (
        |  SELECT min_by(tok, doc_id) AS tok,
        |         min_by(ttr_micro, doc_id) AS ttr_micro
        |  FROM d GROUP BY digest),
        |pre_c AS (
        |  SELECT '1_pre_dedup' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(tok) AS BIGINT) AS st,
        |         CAST(sum(ttr_micro) AS BIGINT) AS sr
        |  FROM d),
        |post_c AS (
        |  SELECT '2_post_dedup', CAST(count(*) AS BIGINT),
        |         CAST(sum(tok) AS BIGINT), CAST(sum(ttr_micro) AS BIGINT)
        |  FROM post),
        |u AS (SELECT * FROM pre_c UNION ALL SELECT * FROM post_c)
        |SELECT stage, n_docs,
        |       round(CAST(st AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |         AS mean_tokens,
        |       round(CAST(sr AS DOUBLE)
        |         / (CAST(n_docs AS DOUBLE) * 1000000.0), 6) AS mean_ttr
        |FROM u ORDER BY stage""".stripMargin,
    "q272_wilson_gate_ci" ->
      """WITH g AS (
        |  SELECT source,
        |         CASE WHEN len(string_split(text, ' ')) >= 50
        |               AND CAST(floor(1000000.0
        |                   * CAST(len(list_distinct(string_split(text, ' ')))
        |                       AS DOUBLE)
        |                   / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |                 AS BIGINT) >= 500000
        |              THEN 1 ELSE 0 END AS pass
        |  FROM documents),
        |c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(pass) AS BIGINT) AS k
        |  FROM g GROUP BY 1),
        |w AS (
        |  SELECT source, n, k,
        |         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |         1.0::DOUBLE + (1.96::DOUBLE * 1.96::DOUBLE)
        |           / CAST(n AS DOUBLE) AS den
        |  FROM c),
        |w2 AS (
        |  SELECT source, n, k, ph,
        |         (ph + (1.96::DOUBLE * 1.96::DOUBLE)
        |             / (2.0::DOUBLE * CAST(n AS DOUBLE))) / den AS ctr,
        |         1.96::DOUBLE * sqrt(ph * (1.0::DOUBLE - ph)
        |             / CAST(n AS DOUBLE)
        |           + (1.96::DOUBLE * 1.96::DOUBLE)
        |             / (4.0::DOUBLE * CAST(n AS DOUBLE)
        |               * CAST(n AS DOUBLE))) / den AS hw
        |  FROM w)
        |SELECT source, n, k AS n_pass,
        |       round(ph, 6) AS pass_rate,
        |       round(ctr - hw, 6) AS wilson_lo,
        |       round(ctr + hw, 6) AS wilson_hi
        |FROM w2 ORDER BY source""".stripMargin,
    "q264_token_yield" ->
      """WITH uniq AS (
        |  SELECT source, md5(text) AS digest,
        |         CAST(count(*) AS BIGINT) AS copies,
        |         CAST(max(len(string_split(text, ' '))) AS BIGINT) AS tok
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_unique_docs,
        |       CAST(sum(tok * copies) AS BIGINT) AS raw_tokens,
        |       CAST(sum(tok) AS BIGINT) AS unique_tokens,
        |       round(CAST(sum(tok) AS DOUBLE)
        |         / CAST(sum(tok * copies) AS DOUBLE), 6) AS token_yield
        |FROM uniq GROUP BY 1 ORDER BY 1""".stripMargin,
    "q262_kn_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t,
        |         doc_id % 2147483647 * 16807 % 2147483647
        |           * 48271 % 2147483647 % 100 < 80 AS is_train
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, source, is_train,
        |         (b).pos AS pos, (b).w1 AS w1, (b).w2 AS w2
        |  FROM (SELECT doc_id, source, is_train,
        |          unnest(list_transform(range(1, len(t)),
        |            i -> struct_pack(pos := i, w1 := t[i], w2 := t[i+1]))) AS b
        |        FROM tok WHERE len(t) >= 2)),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM big WHERE is_train GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |              CAST(count(*) AS BIGINT) AS r1
        |       FROM c12 GROUP BY 1),
        |cl AS (SELECT w2, CAST(count(*) AS BIGINT) AS l2 FROM c12 GROUP BY 1),
        |bt AS (SELECT CAST(count(*) AS BIGINT) AS btypes,
        |              CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END)
        |                AS BIGINT) AS nn1,
        |              CAST(sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END)
        |                AS BIGINT) AS nn2
        |       FROM c12),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |      FROM (SELECT unnest(t) AS w FROM tok WHERE is_train)),
        |lp AS (
        |  SELECT b.doc_id, b.source, b.pos,
        |         CAST(nn1 AS DOUBLE) / CAST(nn1 + 2 * nn2 AS DOUBLE) AS dd,
        |         ln(CASE WHEN c1.c1 IS NULL
        |              THEN coalesce(CAST(l2 AS DOUBLE) / CAST(btypes AS DOUBLE),
        |                     1.0 / CAST(v + 1 AS DOUBLE))
        |              ELSE greatest(CAST(coalesce(c12, 0) AS DOUBLE)
        |                     - CAST(nn1 AS DOUBLE)
        |                       / CAST(nn1 + 2 * nn2 AS DOUBLE), 0.0)
        |                   / CAST(c1.c1 AS DOUBLE)
        |                 + CAST(nn1 AS DOUBLE) / CAST(nn1 + 2 * nn2 AS DOUBLE)
        |                   * CAST(r1 AS DOUBLE) / CAST(c1.c1 AS DOUBLE)
        |                   * coalesce(CAST(l2 AS DOUBLE)
        |                       / CAST(btypes AS DOUBLE),
        |                     1.0 / CAST(v + 1 AS DOUBLE)) END) AS lp,
        |         CASE WHEN coalesce(c12, 0) = 0 THEN 1 ELSE 0 END AS unseen
        |  FROM big b
        |  LEFT JOIN c12 USING (w1, w2)
        |  LEFT JOIN c1 USING (w1)
        |  LEFT JOIN cl USING (w2), bt, v
        |  WHERE NOT b.is_train),
        |d AS (
        |  SELECT doc_id, source, max(dd) AS dd,
        |         CAST(count(*) AS BIGINT) AS nb,
        |         CAST(sum(unseen) AS BIGINT) AS nu,
        |         -list_reduce(list_prepend(0.0::DOUBLE, list(lp ORDER BY pos)),
        |                      (acc, x) -> acc + x) AS s
        |  FROM lp GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |       CAST(sum(nu) AS BIGINT) AS n_unseen,
        |       floor(max(dd) * 1000000 + 0.5) / 1000000 AS d_discount,
        |       floor(CAST(sum(nu) AS DOUBLE) / sum(nb) * 1000000 + 0.5)
        |         / 1000000 AS unseen_rate,
        |       floor(CAST(sum(CAST(floor(s / nb * 1000000000.0) AS BIGINT))
        |           AS DOUBLE) / count(*) / 1000000000.0 * 1000000 + 0.5)
        |         / 1000000 AS mean_nll
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    "q256_ndcg_eval" ->
      """WITH tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |r AS (SELECT doc_id,
        |             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |      FROM p),
        |rel AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS rel FROM tf GROUP BY 1),
        |sysd AS (
        |  SELECT r.rank,
        |         sum(CAST(coalesce(rel.rel, 0) AS DOUBLE)
        |             / (ln(CAST(r.rank AS DOUBLE) + 1.0) / ln(2.0)))
        |           OVER (ORDER BY r.rank
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dcg
        |  FROM r LEFT JOIN rel ON r.doc_id = rel.doc_id
        |  WHERE r.rank <= 20),
        |itop AS (
        |  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rank
        |  FROM rel ORDER BY rel DESC, doc_id LIMIT 20),
        |ideal AS (
        |  SELECT rank,
        |         sum(CAST(rel AS DOUBLE)
        |             / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)))
        |           OVER (ORDER BY rank
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS idcg
        |  FROM itop)
        |SELECT CAST(s2.rank AS BIGINT) AS k, round(s2.dcg, 6) AS dcg,
        |       round(i.idcg, 6) AS idcg,
        |       round(s2.dcg / i.idcg, 6) AS ndcg
        |FROM sysd s2 JOIN ideal i ON s2.rank = i.rank
        |WHERE s2.rank IN (5, 10, 20) ORDER BY k""".stripMargin,
    "q254_good_turing" ->
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(ts)),
        |           i -> concat(ts[i], ' ', ts[i + 1]))) AS t
        |  FROM tok),
        |tf AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS r
        |  FROM bg GROUP BY 1),
        |coc AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n_types
        |  FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(r * n_types) AS BIGINT) AS nn FROM coc),
        |n1 AS (SELECT CAST(n_types AS BIGINT) AS n1 FROM coc WHERE r = 1),
        |nxt AS (SELECT r - 1 AS r, n_types AS n_next FROM coc)
        |SELECT c.r, c.n_types,
        |       CASE WHEN x.n_next IS NULL THEN NULL
        |            ELSE round(CAST((c.r + 1) * x.n_next AS DOUBLE)
        |              / CAST(c.n_types AS DOUBLE), 6) END AS r_star,
        |       round(CAST(c.r * c.n_types AS DOUBLE)
        |         / CAST(nn AS DOUBLE), 6) AS mass_frac,
        |       round(CAST(n1 AS DOUBLE) / CAST(nn AS DOUBLE), 6)
        |         AS p0_unseen
        |FROM coc c LEFT JOIN nxt x ON c.r = x.r, tot, n1
        |WHERE c.r <= 10 ORDER BY c.r""".stripMargin,
    "q247_jackknife_variance" ->
      """WITH b AS (
        |  SELECT CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
        |           1, 7)) AS BIGINT) % 20 AS bucket,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(tok) AS BIGINT) AS sum_tokens
        |  FROM b GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS nn,
        |         CAST(sum(sum_tokens) AS BIGINT) AS tt,
        |         CAST(count(*) AS BIGINT) AS g
        |  FROM c),
        |loo AS (
        |  SELECT bucket, n_docs, sum_tokens, nn, tt, g,
        |         (10000 * (tt - sum_tokens)) // (nn - n_docs) AS loo_s
        |  FROM c, tot),
        |sl AS (SELECT CAST(sum(loo_s) AS BIGINT) AS sum_loo FROM loo),
        |d AS (
        |  SELECT bucket, n_docs, sum_tokens, nn, tt, g, loo_s,
        |         g * loo_s - sum_loo AS dd
        |  FROM loo, sl),
        |sq AS (
        |  SELECT sum(CAST(dd AS HUGEINT) * CAST(dd AS HUGEINT)) AS ssd
        |  FROM d)
        |SELECT bucket, n_docs, sum_tokens,
        |       round(CAST(loo_s AS DOUBLE) / 10000.0, 6) AS loo_mean,
        |       round(CAST(tt AS DOUBLE) / CAST(nn AS DOUBLE), 6)
        |         AS theta_mean,
        |       round(sqrt(CAST(g - 1 AS DOUBLE) * CAST(ssd AS DOUBLE)
        |           / CAST(g * g * g AS DOUBLE)
        |           / (10000.0 * 10000.0)), 6) AS jk_se
        |FROM d, sq ORDER BY bucket""".stripMargin,
    "q241_loo_influence" ->
      """WITH toks AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tc AS (
        |  SELECT t, source, CAST(count(*) AS BIGINT) AS c_ts
        |  FROM toks WHERE doc_id % 23 <> 0 GROUP BY 1, 2),
        |fu AS (SELECT t, CAST(sum(c_ts) AS BIGINT) AS c_t FROM tc GROUP BY 1),
        |srct AS (
        |  SELECT source, CAST(sum(c_ts) AS BIGINT) AS t_s FROM tc GROUP BY 1),
        |gl AS (
        |  SELECT CAST(sum(c_t) AS BIGINT) AS t_full,
        |         CAST(count(*) AS BIGINT) AS v FROM fu),
        |models AS (
        |  SELECT source AS model, t_full - t_s AS t_m, v FROM srct, gl
        |  UNION ALL
        |  SELECT '__full__' AS model, t_full AS t_m, v FROM gl),
        |dict AS (
        |  SELECT f.t, m.model, m.t_m, m.v,
        |         CAST(floor(ln(CAST(f.c_t - coalesce(tc.c_ts, 0) + 1
        |             AS DOUBLE) / (m.t_m + m.v)) * 1000000.0) AS BIGINT)
        |           AS lnp_micro
        |  FROM fu f CROSS JOIN models m
        |  LEFT JOIN tc ON tc.t = f.t AND tc.source = m.model),
        |pt AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS pc
        |  FROM toks WHERE doc_id % 23 = 0 GROUP BY 1),
        |sc AS (
        |  SELECT m.model,
        |         CAST(sum(pt.pc * coalesce(d.lnp_micro,
        |           CAST(floor(ln(1.0 / (m.t_m + m.v)) * 1000000.0)
        |             AS BIGINT))) AS BIGINT) AS sum_lnp,
        |         CAST(sum(pt.pc) AS BIGINT) AS n_tok
        |  FROM pt CROSS JOIN models m
        |  LEFT JOIN dict d ON d.t = pt.t AND d.model = m.model
        |  GROUP BY m.model),
        |nll AS (
        |  SELECT model, (-sum_lnp) // n_tok AS nll_micro, n_tok FROM sc),
        |fr AS (
        |  SELECT nll_micro AS nll_full_micro FROM nll
        |  WHERE model = '__full__')
        |SELECT n.model AS source, s.t_s AS train_tokens,
        |       n.n_tok AS probe_tokens,
        |       round(CAST(n.nll_micro AS DOUBLE) / 1000000.0, 6) AS nll_loo,
        |       round(CAST(f.nll_full_micro AS DOUBLE) / 1000000.0, 6)
        |         AS nll_full,
        |       CAST(n.nll_micro - f.nll_full_micro AS BIGINT)
        |         AS influence_micro
        |FROM nll n CROSS JOIN fr f JOIN srct s ON s.source = n.model
        |WHERE n.model <> '__full__'
        |ORDER BY source""".stripMargin,

    "q235_vocab_coverage" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS ts FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |big AS (
        |  SELECT unnest(list_transform(range(1, len(ts)), i ->
        |    ts[i] || ' ' || ts[i + 1])) AS g
        |  FROM t),
        |counts AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_occ,
        |         CAST(count(*) AS BIGINT) AS n_vocab
        |  FROM counts),
        |ranked AS (
        |  SELECT g, c,
        |         row_number() OVER (ORDER BY c DESC, g ASC) AS rk,
        |         CAST(sum(c) OVER (ORDER BY c DESC, g ASC
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM counts),
        |ks AS (SELECT CAST(unnest([50, 200, 800]) AS BIGINT) AS k_budget)
        |SELECT k_budget, CAST(count(*) AS BIGINT) AS k_eff,
        |       CAST(max(cum) AS BIGINT) AS covered_occ,
        |       max(n_occ) AS n_occ, max(n_vocab) AS n_vocab,
        |       round(CAST(max(cum) AS DOUBLE) / max(n_occ), 6) AS coverage,
        |       round(CAST(max(n_occ) - max(cum) AS DOUBLE) / max(n_occ), 6)
        |         AS oov_rate,
        |       round(CAST(count(*) AS DOUBLE) / max(n_vocab), 6)
        |         AS vocab_spend
        |FROM ranked, ks, tot WHERE rk <= k_budget
        |GROUP BY k_budget ORDER BY k_budget""".stripMargin,

    "q233_packing_sweep" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |         CAST(sum(len(string_split(text, ' '))) OVER
        |           (PARTITION BY lang ORDER BY doc_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents),
        |ls AS (SELECT CAST(unnest([128, 512, 2048]) AS BIGINT) AS ctx_len),
        |frag AS (
        |  SELECT ctx_len, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CASE WHEN (cum - 1) // ctx_len
        |               <> (cum - n) // ctx_len THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_split_docs,
        |         CAST(sum((cum - 1) // ctx_len - (cum - n) // ctx_len)
        |           AS BIGINT) AS n_boundary_cuts
        |  FROM c, ls GROUP BY 1),
        |lt AS (SELECT lang, max(cum) AS t FROM c GROUP BY 1),
        |pad AS (
        |  SELECT ctx_len,
        |         CAST(sum((t + ctx_len - 1) // ctx_len) AS BIGINT) AS n_seqs,
        |         CAST(sum(((t + ctx_len - 1) // ctx_len) * ctx_len - t)
        |           AS BIGINT) AS pad_tokens
        |  FROM lt, ls GROUP BY 1)
        |SELECT f.ctx_len, f.n_docs, f.n_split_docs, f.n_boundary_cuts,
        |       p.n_seqs, p.pad_tokens,
        |       round(CAST(f.n_split_docs AS DOUBLE) / f.n_docs, 6)
        |         AS split_frac,
        |       round(CAST(p.pad_tokens AS DOUBLE) / (p.n_seqs * f.ctx_len), 6)
        |         AS pad_frac
        |FROM frag f JOIN pad p USING (ctx_len) ORDER BY f.ctx_len""".stripMargin,

    "q230_temperature_mixture" ->
      """WITH mass AS (
        |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |           AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS tt FROM mass),
        |alphas AS (SELECT unnest([25, 50, 75, 100]) AS alpha_pct),
        |w AS (
        |  SELECT lang, toks, tt, alpha_pct,
        |         CAST(floor(exp((alpha_pct / 100.0)
        |             * ln(CAST(toks AS DOUBLE) / tt)) * 1000000.0)
        |           AS BIGINT) AS w_micro
        |  FROM mass, tot, alphas),
        |sums AS (
        |  SELECT alpha_pct, CAST(sum(w_micro) AS BIGINT) AS sw,
        |         max(tt) AS tt, max(tt) // 2 AS budget
        |  FROM w GROUP BY 1),
        |quota AS (
        |  SELECT w.lang, w.toks, w.tt, w.alpha_pct, w.w_micro,
        |         s.budget, s.sw,
        |         s.budget * w.w_micro // s.sw AS base,
        |         s.budget * w.w_micro % s.sw AS rem
        |  FROM w JOIN sums s USING (alpha_pct)),
        |leftover AS (
        |  SELECT alpha_pct, max(budget) - sum(base) AS extra
        |  FROM quota GROUP BY 1)
        |SELECT round(q.alpha_pct / 100.0, 2) AS alpha, q.lang,
        |       q.toks AS corpus_tokens,
        |       q.toks * 1000000 // q.tt AS share_micro, q.w_micro,
        |       CAST(q.base + CASE WHEN row_number() OVER
        |           (PARTITION BY q.alpha_pct ORDER BY q.rem DESC, q.lang ASC)
        |           <= l.extra THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens,
        |       round(CAST(q.base + CASE WHEN row_number() OVER
        |           (PARTITION BY q.alpha_pct ORDER BY q.rem DESC, q.lang ASC)
        |           <= l.extra THEN 1 ELSE 0 END AS DOUBLE) / q.toks, 6)
        |         AS boost
        |FROM quota q JOIN leftover l USING (alpha_pct)
        |ORDER BY alpha, lang""".stripMargin,

    "q229_gopher_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, source, text,
        |         len(string_split(text, ' ')) AS n0
        |  FROM documents),
        |waved AS (
        |  SELECT doc_id, source,
        |         (doc_id % 7 = 0 AND n0 >= 8) AS wave_a,
        |         (doc_id % 9 = 0 AND doc_id % 7 <> 0) AS wave_b,
        |         CASE WHEN doc_id % 7 = 0 AND n0 >= 8
        |                THEN text || repeat(' buy now', n0 // 4)
        |              WHEN doc_id % 9 = 0 AND doc_id % 7 <> 0
        |                THEN text || ' ' || text
        |              ELSE text END AS txt
        |  FROM base),
        |tok AS (
        |  SELECT doc_id, source, (wave_a OR wave_b) AS planted,
        |         string_split(txt, ' ') AS ts, len(string_split(txt, ' ')) AS n
        |  FROM waved),
        |g AS (
        |  SELECT doc_id, 2 AS k,
        |         unnest(list_transform(range(1, n), i ->
        |           ts[i] || ' ' || ts[i + 1])) AS gr
        |  FROM tok WHERE n >= 2
        |  UNION ALL
        |  SELECT doc_id, 5 AS k,
        |         unnest(list_transform(range(1, n - 3), i ->
        |           array_to_string(ts[i:i + 4], ' '))) AS gr
        |  FROM tok WHERE n >= 5),
        |pc AS (
        |  SELECT doc_id, k, gr, CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2, 3),
        |per AS (
        |  SELECT doc_id,
        |         max(CASE WHEN k = 2 THEN c END) AS max2,
        |         sum(CASE WHEN k = 2 THEN c END) AS tot2,
        |         sum(CASE WHEN k = 5 THEN c END) AS tot5,
        |         count(CASE WHEN k = 5 THEN 1 END) AS nd5
        |  FROM pc GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.source, t.planted,
        |         coalesce(p.max2 * 1000000 // p.tot2, 0) AS top2_micro,
        |         coalesce((p.tot5 - p.nd5) * 1000000 // p.tot5, 0)
        |           AS dup5_micro
        |  FROM tok t LEFT JOIN per p USING (doc_id)),
        |flagged AS (
        |  SELECT source, planted,
        |         top2_micro >= 100000 AS f2,
        |         dup5_micro >= 300000 AS f5,
        |         (top2_micro >= 100000 OR dup5_micro >= 300000) AS fa,
        |         dup5_micro
        |  FROM scored)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_planted,
        |       CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_flag_top2,
        |       CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_flag_dup5,
        |       CAST(sum(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_flagged,
        |       CAST(sum(CASE WHEN fa AND planted THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_caught,
        |       CASE WHEN sum(CASE WHEN fa THEN 1 ELSE 0 END) > 0 THEN
        |         round(CAST(sum(CASE WHEN fa AND planted THEN 1 ELSE 0 END)
        |             AS DOUBLE)
        |           / sum(CASE WHEN fa THEN 1 ELSE 0 END), 6) END
        |         AS flag_precision,
        |       CASE WHEN sum(CASE WHEN planted THEN 1 ELSE 0 END) > 0 THEN
        |         round(CAST(sum(CASE WHEN fa AND planted THEN 1 ELSE 0 END)
        |             AS DOUBLE)
        |           / sum(CASE WHEN planted THEN 1 ELSE 0 END), 6) END
        |         AS flag_recall,
        |       CAST(sum(dup5_micro) AS BIGINT) AS sum_dup5_micro,
        |       round(CAST(sum(dup5_micro) AS DOUBLE)
        |         / (count(*) * 1000000.0), 6) AS mean_dup5_frac
        |FROM flagged GROUP BY source ORDER BY source""".stripMargin,

    "q228_eval_split" ->
      """WITH d AS (
        |  SELECT lang, source, doc_id,
        |         md5(concat('split:', CAST(doc_id AS VARCHAR))) AS h
        |  FROM documents),
        |strata AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_pool
        |  FROM d GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_pool) AS BIGINT) AS nn FROM strata),
        |quota AS (
        |  SELECT lang, source, n_pool, nn, nn // 20 AS e,
        |         ((nn // 20) * n_pool) // nn AS base,
        |         ((nn // 20) * n_pool) % nn AS rem
        |  FROM strata, tot),
        |alloc AS (
        |  SELECT lang, source, n_pool, e, nn,
        |         base + CASE WHEN row_number() OVER
        |             (ORDER BY rem DESC, lang ASC, source ASC)
        |           <= e - (SELECT sum(base) FROM quota)
        |           THEN 1 ELSE 0 END AS n_alloc
        |  FROM quota),
        |sel AS (
        |  SELECT r.lang, r.source, CAST(count(*) AS BIGINT) AS n_sel,
        |         CAST(sum(r.doc_id) AS BIGINT) AS sum_sel_ids
        |  FROM (SELECT lang, source, doc_id,
        |          row_number() OVER (PARTITION BY lang, source
        |            ORDER BY h ASC, doc_id ASC) AS rn
        |        FROM d) r
        |  JOIN alloc a ON a.lang = r.lang AND a.source = r.source
        |  WHERE r.rn <= a.n_alloc GROUP BY 1, 2)
        |SELECT a.lang, a.source, a.n_pool, CAST(a.n_alloc AS BIGINT)
        |         AS n_alloc,
        |       coalesce(s.n_sel, 0) AS n_sel,
        |       coalesce(s.sum_sel_ids, 0) AS sum_sel_ids,
        |       round(CAST(a.n_pool AS DOUBLE) / a.nn, 6) AS share_pool,
        |       round(CAST(a.n_alloc AS DOUBLE) / a.e, 6) AS share_eval
        |FROM alloc a LEFT JOIN sel s
        |  ON s.lang = a.lang AND s.source = a.source
        |ORDER BY a.lang, a.source""".stripMargin,

    "q227_gate_calibration" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
        |  WHERE len(string_split(text, ' ')) < 30),
        |t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS tokens
        |  FROM corpus),
        |gd AS (
        |  SELECT doc_id, md5(text) AS dg,
        |    (CASE WHEN len(tokens) >= 30 THEN 1 ELSE 0 END) +
        |    (CASE WHEN list_aggregate(list_transform(tokens,
        |            x -> length(x)), 'sum') / len(tokens) >= 3.0::DOUBLE
        |          AND list_aggregate(list_transform(tokens,
        |            x -> length(x)), 'sum') / len(tokens) <= 10.0::DOUBLE
        |          THEN 1 ELSE 0 END) +
        |    (CASE WHEN len(list_filter(tokens,
        |            x -> list_contains(['the','a','data','fast','slow'], x)))
        |            / len(tokens) >= 0.05::DOUBLE THEN 1 ELSE 0 END)
        |      AS n_gates
        |  FROM t),
        |dup AS (
        |  SELECT dg, CAST(1 AS BIGINT) AS is_dup
        |  FROM gd GROUP BY dg HAVING count(*) >= 2),
        |gated AS (
        |  SELECT gd.doc_id, gd.n_gates, coalesce(dup.is_dup, 0) AS is_dup
        |  FROM gd LEFT JOIN dup USING (dg)),
        |dtf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(tokens) AS term FROM t)
        |  GROUP BY 1, 2),
        |dict AS (SELECT term, sum(c) AS ct FROM dtf GROUP BY 1),
        |tot AS (SELECT sum(ct) AS nn FROM dict),
        |lnp AS (
        |  SELECT term, CAST(floor(ln(CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
        |           * 1000000.0) AS BIGINT) AS lnp_micro
        |  FROM dict, tot),
        |nll AS (
        |  SELECT doc_id, sum(c * lnp_micro) AS sum_lnp_micro,
        |         sum(c) AS n_tok
        |  FROM dtf JOIN lnp USING (term) GROUP BY 1)
        |SELECT n_gates, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(is_dup) AS BIGINT) AS n_dup_docs,
        |       round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS dup_rate,
        |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |       round(-CAST(sum(sum_lnp_micro) AS DOUBLE)
        |         / (CAST(sum(n_tok) AS DOUBLE) * 1000000.0), 6)
        |         AS mean_nll_per_token
        |FROM gated JOIN nll USING (doc_id)
        |GROUP BY n_gates ORDER BY n_gates""".stripMargin,

    "q226_dsir_selection" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_concat(ts,
        |           CASE WHEN len(ts) >= 2
        |                THEN list_transform(range(1, len(ts)), i ->
        |                       concat(ts[i], ' ', ts[i+1]))
        |                ELSE [] END)) AS g
        |  FROM d),
        |bk AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substring(md5(g), 1, 7)) AS BIGINT)
        |           % 1024 AS b
        |  FROM g),
        |dbc AS (
        |  SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
        |  FROM bk GROUP BY 1, 2, 3),
        |stats AS (
        |  SELECT b, sum(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS ct,
        |         sum(c) AS cr
        |  FROM dbc GROUP BY 1),
        |tots AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM stats),
        |delta AS (
        |  SELECT b,
        |         CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / (tt + 1024))
        |                - ln(CAST(cr + 1 AS DOUBLE) / (tr + 1024)))
        |              * 1000000.0) AS BIGINT) AS dm
        |  FROM stats, tots),
        |scores AS (
        |  SELECT doc_id, lang, sum(c * dm) AS score_micro
        |  FROM dbc JOIN delta USING (b) GROUP BY 1, 2),
        |cut AS (
        |  SELECT quantile_cont(CAST(score_micro AS DOUBLE), 0.8) AS thr
        |  FROM scores)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN score_micro >= thr THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_sel,
        |       round(CAST(sum(CASE WHEN score_micro >= thr THEN 1 ELSE 0 END)
        |           AS DOUBLE) / count(*), 6) AS sel_rate,
        |       CAST(sum(score_micro) AS BIGINT) AS sum_score_micro
        |FROM scores, cut GROUP BY lang ORDER BY lang""".stripMargin,

    "q207_rrf_fusion" ->
      """WITH tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |rb AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |           AS INTEGER) AS rank_bm
        |  FROM p),
        |tsc AS (
        |  SELECT t.doc_id, t.term, t.tf * ln(n_docs / df) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |tp AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM tsc GROUP BY 1),
        |rt AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |           AS INTEGER) AS rank_tf
        |  FROM tp),
        |u AS (
        |  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
        |         b.rank_bm, t.rank_tf
        |  FROM (SELECT * FROM rb WHERE rank_bm <= 20) b
        |  FULL OUTER JOIN (SELECT * FROM rt WHERE rank_tf <= 20) t
        |    ON b.doc_id = t.doc_id),
        |f AS (
        |  SELECT doc_id, rank_bm, rank_tf,
        |         coalesce(1.0::DOUBLE / (60 + rank_bm), 0.0::DOUBLE)
        |       + coalesce(1.0::DOUBLE / (60 + rank_tf), 0.0::DOUBLE) AS rrf
        |  FROM u),
        |g AS (
        |  SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
        |           AS INTEGER) AS fused_rank,
        |         doc_id, rank_bm, rank_tf, round(rrf, 6) AS rrf_score
        |  FROM f)
        |SELECT * FROM g WHERE fused_rank <= 10 ORDER BY fused_rank""".stripMargin,
    // reuses q83's BM25 chain verbatim for the shortlist, then ranks the
    // same 20 docs by plain TF-IDF and counts pair inversions exactly
    "q194_rank_agreement" ->
      """WITH tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id)
        |        AS rank_bm
        |      FROM p),
        |tsc AS (
        |  SELECT t.doc_id, t.term, t.tf * ln(n_docs / df) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |tp AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM tsc GROUP BY 1),
        |rk AS (
        |  SELECT r.doc_id, r.rank_bm,
        |         row_number() OVER (ORDER BY tp.score DESC, r.doc_id)
        |           AS rank_tf
        |  FROM r JOIN tp USING (doc_id) WHERE r.rank_bm <= 20),
        |pr AS (
        |  SELECT CASE WHEN a.rank_tf < b.rank_tf THEN 1 ELSE 0 END AS conc
        |  FROM rk a JOIN rk b ON a.rank_bm < b.rank_bm)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM rk) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(sum(conc) AS BIGINT) AS concordant,
        |       CAST(count(*) - sum(conc) AS BIGINT) AS discordant,
        |       round(CAST(2 * sum(conc) - count(*) AS DOUBLE)
        |             / CAST(count(*) AS DOUBLE), 6) AS kendall_tau,
        |       (SELECT CAST(sum(abs(rank_bm - rank_tf)) AS BIGINT) FROM rk)
        |         AS footrule
        |FROM pr""".stripMargin,
    "q192_heldout_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t,
        |         doc_id % 2147483647 * 16807 % 2147483647
        |           * 48271 % 2147483647 % 100 < 80 AS is_train
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, source, is_train,
        |         (b).pos AS pos, (b).w1 AS w1, (b).w2 AS w2
        |  FROM (SELECT doc_id, source, is_train,
        |          unnest(list_transform(range(1, len(t)),
        |            i -> struct_pack(pos := i, w1 := t[i], w2 := t[i+1]))) AS b
        |        FROM tok WHERE len(t) >= 2)),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |        FROM big WHERE is_train GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |      FROM (SELECT unnest(t) AS w FROM tok WHERE is_train)),
        |lp AS (
        |  SELECT b.doc_id, b.source, b.pos,
        |         ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
        |            / CAST(coalesce(c1, 0) + v AS DOUBLE)) AS lp,
        |         CASE WHEN coalesce(c12, 0) = 0 THEN 1 ELSE 0 END AS unseen
        |  FROM big b
        |  LEFT JOIN c12 USING (w1, w2)
        |  LEFT JOIN c1 USING (w1), v
        |  WHERE NOT b.is_train),
        |d AS (
        |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS nb,
        |         CAST(sum(unseen) AS BIGINT) AS nu,
        |         -list_reduce(list_prepend(0.0::DOUBLE, list(lp ORDER BY pos)),
        |                      (acc, x) -> acc + x) AS s
        |  FROM lp GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |       CAST(sum(nu) AS BIGINT) AS n_unseen,
        |       floor(CAST(sum(nu) AS DOUBLE) / sum(nb) * 1000000 + 0.5)
        |         / 1000000 AS unseen_rate,
        |       floor(CAST(sum(CAST(floor(s / nb * 1000000000.0) AS BIGINT))
        |           AS DOUBLE) / count(*) / 1000000000.0 * 1000000 + 0.5)
        |         / 1000000 AS mean_nll
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    "q184_pmi_collocations" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |big AS (
        |  SELECT ts[i] AS x, ts[i+1] AS y
        |  FROM tok, unnest(range(1, len(ts))) AS u(i)
        |  WHERE len(ts) >= 2),
        |cxy AS (SELECT x, y, count(*) AS c_xy FROM big GROUP BY 1, 2),
        |cx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cxy GROUP BY 1),
        |cy AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cxy GROUP BY 1),
        |n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS nb FROM cxy),
        |scored AS (
        |  SELECT cxy.x, cxy.y, c_xy, c_x, c_y,
        |         ln(CAST(c_xy * nb AS DOUBLE) / CAST(c_x * c_y AS DOUBLE))
        |           AS pmi_raw
        |  FROM cxy JOIN cx USING (x) JOIN cy USING (y), n
        |  WHERE c_xy >= 5)
        |SELECT x, y, c_xy, c_x, c_y,
        |       CASE WHEN pmi_raw > 0
        |              THEN floor(pmi_raw * 1000000 + 0.5) / 1000000
        |            WHEN pmi_raw < 0
        |              THEN -(floor(0.0 - pmi_raw * 1000000 + 0.5) / 1000000)
        |            ELSE pmi_raw END AS pmi
        |FROM scored
        |ORDER BY pmi_raw DESC, x ASC, y ASC LIMIT 20""".stripMargin,
    "q180_quality_gates" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS tokens
        |  FROM documents),
        |s AS (
        |  SELECT source, len(tokens) AS n,
        |    list_aggregate(list_transform(tokens, x -> length(x)), 'sum')
        |      / len(tokens) AS avg_len,
        |    len(list_filter(tokens,
        |      x -> list_contains(['the','a','data','fast','slow'], x)))
        |      / len(tokens) AS stop_ratio
        |  FROM t),
        |g AS (
        |  SELECT source, n >= 30 AS g_len,
        |         avg_len >= 3.0::DOUBLE AND avg_len <= 10.0::DOUBLE AS g_avg,
        |         stop_ratio >= 0.05::DOUBLE AS g_stop
        |  FROM s)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_fail_len,
        |       CAST(sum(CASE WHEN NOT g_avg THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_fail_avglen,
        |       CAST(sum(CASE WHEN NOT g_stop THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_fail_stop,
        |       CAST(sum(CASE WHEN g_len AND g_avg AND g_stop THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_pass,
        |       round(CAST(sum(CASE WHEN g_len AND g_avg AND g_stop
        |             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE),
        |             6) AS pass_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "q175_dedup_search" ->
      """WITH dup AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 20000 AS doc_id, text FROM documents
        |  WHERE doc_id % 3 = 0),
        |tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM dup),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM dup),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |r AS (
        |  SELECT doc_id, score, CAST(row_number() OVER (ORDER BY score DESC,
        |           doc_id) AS INTEGER) AS rank0
        |  FROM p),
        |t20 AS (SELECT doc_id, score, rank0 FROM r WHERE rank0 <= 20),
        |dg AS (
        |  SELECT t20.doc_id, t20.score, t20.rank0, md5(d.text) AS digest
        |  FROM t20 JOIN dup d ON d.doc_id = t20.doc_id),
        |c AS (
        |  SELECT digest, min(rank0) AS pre_rank,
        |         CAST(count(*) AS BIGINT) AS n_collapsed
        |  FROM dg GROUP BY digest),
        |f AS (
        |  SELECT c.pre_rank, g.doc_id, c.n_collapsed, g.score
        |  FROM c JOIN dg g ON g.rank0 = c.pre_rank)
        |SELECT CAST(row_number() OVER (ORDER BY pre_rank) AS INTEGER) AS rank,
        |       doc_id, pre_rank, n_collapsed, round(score, 6) AS bm25
        |FROM f ORDER BY rank""".stripMargin,
    "q170_tokenizer_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
        |         CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT)
        |           AS sub,
        |         CAST(length(text) AS BIGINT) AS chars
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |       CAST(sum(sub) AS BIGINT) AS subword_tokens,
        |       CAST(sum(chars) AS BIGINT) AS n_chars,
        |       round(CAST(sum(sub) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
        |         AS fertility,
        |       round(CAST(sum(chars) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
        |         AS chars_per_word
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q168_dedup_mixture" ->
      """WITH posted AS (
        |  SELECT source, md5(text) AS digest,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        |  FROM documents
        |  UNION ALL
        |  SELECT 'src' || CAST((CAST(substring(source, 4) AS BIGINT) + 1) % 20
        |           AS VARCHAR) AS source,
        |         md5(text) AS digest,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        |  FROM documents WHERE doc_id % 3 = 0),
        |raw AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_posted,
        |         CAST(sum(tk) AS BIGINT) AS raw_toks
        |  FROM posted GROUP BY source),
        |keep AS (
        |  SELECT digest, min(source) AS source, max(tk) AS tk
        |  FROM posted GROUP BY digest),
        |eff AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |         CAST(sum(tk) AS BIGINT) AS eff_toks
        |  FROM keep GROUP BY source),
        |t AS (
        |  SELECT r.source, r.n_posted, r.raw_toks,
        |         coalesce(e.n_kept, 0) AS n_kept,
        |         CAST(coalesce(e.eff_toks, 0) AS BIGINT) AS eff_toks,
        |         CASE WHEN CAST(substring(r.source, 4) AS BIGINT) % 2 = 1
        |              THEN 9 ELSE 1 END AS w
        |  FROM raw r LEFT JOIN eff e ON e.source = r.source),
        |g AS (SELECT sum(eff_toks) AS total, sum(w) AS sw FROM t)
        |SELECT source, n_posted, raw_toks, CAST(n_kept AS BIGINT) AS n_kept,
        |       eff_toks,
        |       round(CAST(raw_toks - eff_toks AS DOUBLE)
        |             / CAST(raw_toks AS DOUBLE), 6) AS dup_frac,
        |       CAST(least(eff_toks, total * 4 // 5 * w // sw) AS BIGINT)
        |         AS alloc_tokens,
        |       eff_toks < total * 4 // 5 * w // sw AS deficit
        |FROM t, g ORDER BY source""".stripMargin,
    "q166_proximity_rerank" ->
      """WITH tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |top AS (
        |  SELECT doc_id, score FROM (
        |    SELECT doc_id, score,
        |           row_number() OVER (ORDER BY score DESC, doc_id) AS rk
        |    FROM p) WHERE rk <= 20),
        |posn AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE doc_id IN (SELECT doc_id FROM top))),
        |pterm AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS term
        |  FROM posn WHERE toks[i] IN ('join', 'scan', 'merge')),
        |win AS (
        |  SELECT a.doc_id,
        |         CAST(min(greatest(a.pos, b.pos, c.pos)
        |                  - least(a.pos, b.pos, c.pos) + 1) AS INTEGER)
        |           AS min_window
        |  FROM pterm a
        |  JOIN pterm b ON b.doc_id = a.doc_id AND b.term = 'scan'
        |  JOIN pterm c ON c.doc_id = a.doc_id AND c.term = 'merge'
        |  WHERE a.term = 'join'
        |  GROUP BY a.doc_id),
        |f AS (
        |  SELECT t.doc_id, t.score,
        |         w.min_window IS NOT NULL AS has_all,
        |         coalesce(w.min_window, 1000000) AS min_window
        |  FROM top t LEFT JOIN win w USING (doc_id))
        |SELECT CAST(row_number() OVER (ORDER BY has_all DESC, min_window ASC,
        |              score DESC, doc_id ASC) AS INTEGER) AS rank,
        |       doc_id, has_all, min_window, round(score, 6) AS bm25
        |FROM f ORDER BY rank""".stripMargin,
    "q159_zipf_law" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS vocab_size,
        |         CAST(sum(freq) AS BIGINT) AS total_tokens FROM tf),
        |top AS (
        |  SELECT term, freq FROM tf ORDER BY freq DESC, term ASC LIMIT 1000),
        |arr AS (
        |  SELECT CAST(count(*) AS INTEGER) AS n_terms,
        |         list(ln(CAST(freq AS DOUBLE)) ORDER BY freq DESC, term ASC)
        |           AS ys
        |  FROM top),
        |p AS (
        |  SELECT n_terms, ys,
        |         list_transform(range(1, n_terms + 1),
        |           i -> ln(CAST(i AS DOUBLE))) AS xs
        |  FROM arr),
        |ss AS (
        |  SELECT n_terms, CAST(n_terms AS DOUBLE) AS n,
        |         list_reduce(xs, (a, x) -> a + x) AS sx,
        |         list_reduce(ys, (a, x) -> a + x) AS sy,
        |         list_reduce(list_transform(range(1, n_terms + 1),
        |           i -> xs[i] * ys[i]), (a, x) -> a + x) AS sxy,
        |         list_reduce(list_transform(xs, x -> x * x),
        |           (a, x) -> a + x) AS sxx,
        |         list_reduce(list_transform(ys, y -> y * y),
        |           (a, x) -> a + x) AS syy
        |  FROM p)
        |SELECT n_terms, g.vocab_size, g.total_tokens,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |         AS zipf_slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
        |             6) AS intercept,
        |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        |             ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM ss, g""".stripMargin,
    "q138_shingle_census" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |idx AS (
        |  SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos
        |  FROM tok WHERE len(toks) >= 3),
        |win AS (
        |  SELECT doc_id, CAST(pos AS INTEGER) AS pos,
        |         array_to_string(toks[pos:pos+2], ' ') AS shingle
        |  FROM idx)
        |SELECT shingle, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(min(pos) AS INTEGER) AS first_pos
        |FROM win GROUP BY shingle
        |ORDER BY n DESC, shingle LIMIT 20""".stripMargin,
    "q127_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |big AS (
        |  SELECT doc_id, (b).pos AS pos, (b).w1 AS w1, (b).w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |          i -> struct_pack(pos := i, w1 := t[i], w2 := t[i+1]))) AS b
        |        FROM tok WHERE len(t) >= 2)),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
        |      FROM (SELECT unnest(t) AS w FROM tok)),
        |lp AS (
        |  SELECT b.doc_id, b.pos,
        |         ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) AS lp
        |  FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
        |d AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         list(lp ORDER BY pos) AS lps
        |  FROM lp GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |       round(-list_reduce(list_prepend(0.0::DOUBLE, lps),
        |                          (acc, x) -> acc + x)
        |             / CAST(n_bigrams AS DOUBLE), 6) AS nll,
        |       round(exp(-list_reduce(list_prepend(0.0::DOUBLE, lps),
        |                              (acc, x) -> acc + x)
        |                 / CAST(n_bigrams AS DOUBLE)), 4) AS ppl
        |FROM d ORDER BY doc_id""".stripMargin,
    "q129_weighted_sample" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
        |         doc_id % 2147483647 * 16807 % 2147483647
        |           * 48271 % 2147483647 + 1 AS h1
        |  FROM documents),
        |k AS (
        |  SELECT source, doc_id, weight,
        |         ln(CAST(h1 AS DOUBLE) / 2147483647) / weight AS key
        |  FROM s),
        |r AS (
        |  SELECT source, doc_id, weight, key,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY key DESC, doc_id ASC) AS rn
        |  FROM k)
        |SELECT source, doc_id, weight, round(key, 6) AS priority
        |FROM r WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin,
    "q120_hash_split" ->
      """WITH h AS (
        |  SELECT source,
        |         doc_id % 2147483647 * 16807 % 2147483647
        |                * 48271 % 2147483647 AS h2,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |b AS (
        |  SELECT source, toks,
        |         CASE WHEN h2 % 100 < 80 THEN 'train'
        |              WHEN h2 % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM h)
        |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(toks) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    "q121_mixture_reweight" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
        |         CASE WHEN CAST(substring(source, 4) AS BIGINT) % 2 = 1
        |              THEN 9 ELSE 1 END AS w
        |  FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(toks) AS BIGINT) AS total,
        |             CAST(sum(w) AS BIGINT) AS sw FROM t),
        |p1 AS (SELECT source, toks, w,
        |              total * 4 // 5 * w // sw AS share
        |       FROM t, g),
        |caps AS (SELECT CAST(sum(CASE WHEN toks < share
        |                              THEN share - toks ELSE 0 END) AS BIGINT) AS spare,
        |                CAST(sum(CASE WHEN toks >= share
        |                              THEN 1 ELSE 0 END) AS BIGINT) AS nun
        |         FROM p1)
        |SELECT source, toks, CAST(share AS BIGINT) AS base_share,
        |       CAST(CASE WHEN toks < share THEN toks
        |            ELSE least(toks, share + spare // greatest(nun, 1))
        |            END AS BIGINT) AS alloc_tokens,
        |       toks < share AS deficit,
        |       CAST(CASE WHEN toks < share THEN toks
        |            ELSE least(toks, share + spare // greatest(nun, 1))
        |            END * 100 // toks AS BIGINT) AS rate_pct
        |FROM p1, caps ORDER BY source""".stripMargin,
    "q98_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |e AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
        |r AS (
        |  SELECT term, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, term) AS INTEGER) AS rank
        |  FROM e)
        |SELECT rank, term, n, TRUE AS sketch_agrees
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q92_token_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id,
        |         CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_types,
        |         list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |              ORDER BY tok) AS terms
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |       round(ln(CAST(n_tokens AS DOUBLE))
        |             - list_reduce(list_prepend(0.0::DOUBLE, terms),
        |                           (acc, x) -> acc + x)
        |               / CAST(n_tokens AS DOUBLE), 6) AS entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "q83_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        |  FROM tok WHERE term IN ('join', 'scan', 'merge') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |scal AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         avg(len(string_split(text, ' '))) AS avgdl
        |  FROM documents),
        |s AS (
        |  SELECT t.doc_id, t.term,
        |         ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
        |           * ((tf * (1.2::DOUBLE + 1.0::DOUBLE)) /
        |              (tf + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE
        |                + (0.75::DOUBLE * dl) / avgdl))) AS sc
        |  FROM tf t JOIN df USING (term), scal),
        |p AS (
        |  SELECT doc_id,
        |         coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'scan' THEN sc END), 0.0::DOUBLE)
        |       + coalesce(sum(CASE WHEN term = 'merge' THEN sc END), 0.0::DOUBLE)
        |           AS score
        |  FROM s GROUP BY 1),
        |r AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        |             score
        |      FROM p)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, round(score, 6) AS bm25
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q81_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         count(*) OVER (PARTITION BY source) AS n_total,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(max(n_total) AS BIGINT) AS n_total,
        |       CAST(count(*) AS BIGINT) AS n_kept,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |       max(n_total) > count(*) AS capped
        |FROM r WHERE rn <= 15 GROUP BY source ORDER BY source""".stripMargin,
    "q114_bpe_merges" ->
      """WITH vocab AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |p AS (
        |  SELECT f, unnest(list_transform(range(1, len(w)),
        |           i -> substring(w, i, 2))) AS pair
        |  FROM vocab WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(f) AS BIGINT) AS n
        |FROM p GROUP BY pair
        |ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin,
    "q24_text_stats" ->
      """SELECT term, CAST(count(*) AS BIGINT) AS tf,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |GROUP BY term ORDER BY tf DESC, term ASC LIMIT 50""".stripMargin,
    "q40_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents),
        |s AS (
        |  SELECT doc_id, lang, len(tokens) AS n,
        |    len(list_filter(tokens, x -> list_contains(['key','hash','merge','group'], x))) AS s_de,
        |    len(list_filter(tokens, x -> list_contains(['the','a','data','fast','slow'], x))) AS s_en,
        |    len(list_filter(tokens, x -> list_contains(['table','row','value','part'], x))) AS s_es,
        |    len(list_filter(tokens, x -> list_contains(['query','join','filter','sort'], x))) AS s_fr,
        |    len(list_filter(tokens, x -> list_contains(['stream','window','batch','vector'], x))) AS s_zh
        |  FROM t),
        |p AS (
        |  SELECT doc_id, lang AS actual_lang,
        |         greatest(s_de, s_en, s_es, s_fr, s_zh) AS m, n,
        |         CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
        |              WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
        |              WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
        |              WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
        |              ELSE 'zh' END AS predicted_lang
        |  FROM s)
        |SELECT doc_id, actual_lang, predicted_lang,
        |       CAST(m AS INTEGER) AS marker_hits,
        |       round(m / n, 6) AS marker_ratio,
        |       predicted_lang = actual_lang AS correct
        |FROM p ORDER BY doc_id""".stripMargin,
    "q41_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
        |s AS (
        |  SELECT doc_id, len(tokens) AS n,
        |    list_aggregate(list_transform(tokens, x -> length(x)), 'sum') / len(tokens) AS avg_len,
        |    len(list_filter(tokens, x -> list_contains(['the','a','data','fast','slow'], x)))
        |      / len(tokens) AS stop_ratio
        |  FROM t),
        |q AS (
        |  SELECT doc_id, n, avg_len, stop_ratio,
        |    -- literals cast to DOUBLE: DuckDB would otherwise run the
        |    -- integer subchain in exact DECIMAL, diverging from Spark's
        |    -- binary doubles at the last ulp
        |    0.4::DOUBLE * least(n, 100) / 100.0 + 0.4::DOUBLE * stop_ratio
        |      + 0.2::DOUBLE * (1.0::DOUBLE - least(abs(avg_len - 4.5::DOUBLE), 4.5::DOUBLE) / 4.5::DOUBLE) AS score
        |  FROM s)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
        |       round(avg_len, 6) AS avg_token_len,
        |       round(stop_ratio, 6) AS stop_ratio,
        |       round(score, 6) AS quality_score,
        |       CASE WHEN score >= 0.6 THEN 'high'
        |            WHEN score >= 0.4 THEN 'medium' ELSE 'low' END AS quality_bucket
        |FROM q ORDER BY doc_id""".stripMargin,
    "q42_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS subword_tokens,
        |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_tokens,
        |       CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q43_fingerprint" ->
      """WITH h AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '),
        |           t -> CAST(concat('0x', substring(md5(t), 1, 7)) AS BIGINT)) AS hashes
        |  FROM documents)
        |SELECT doc_id,
        |       list_reduce(hashes, (acc, x) -> (acc * 31 + x) % 2147483647) AS fingerprint,
        |       list_reduce(hashes[1:8], (acc, x) -> (acc * 31 + x) % 2147483647) AS prefix_fp
        |FROM h ORDER BY doc_id""".stripMargin,
    "q58_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |x AS (
        |  SELECT t.doc_id, t.term, t.tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
        |  FROM tf t JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, tfidf,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rank
        |  FROM x)
        |SELECT doc_id, rank, term, round(tfidf, 6) AS tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q67_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, toks, unnest(range(0, n, 24)) AS start FROM t),
        |x AS (
        |  SELECT doc_id, CAST(start // 24 AS INTEGER) AS chunk_idx,
        |         CAST(start AS INTEGER) AS start,
        |         toks[start + 1 : start + 32] AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_idx, start,
        |       CAST(len(chunk) AS INTEGER) AS chunk_len,
        |       CAST(concat('0x', substring(md5(array_to_string(chunk, ' ')), 1, 7)) AS BIGINT) AS chunk_hash
        |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,
    "q68_pii_scrub" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         concat(text, ' contact user', doc_id,
        |                '@mail.example.com or https://ex.com/d/', doc_id,
        |                ' ref ', doc_id * 7919 + 1000000) AS dirty
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, dirty,
        |         regexp_replace(
        |           regexp_replace(
        |             regexp_replace(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |             'https?://[^ ]+', '<URL>', 'g'),
        |           '[0-9]{7,}', '<NUM>', 'g') AS cleaned
        |  FROM d)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(dirty, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INTEGER) AS n_emails,
        |       CAST(len(regexp_extract_all(dirty, 'https?://[^ ]+')) AS INTEGER) AS n_urls,
        |       CAST(len(regexp_extract_all(dirty, '[0-9]{7,}')) AS INTEGER) AS n_longnums,
        |       CAST(length(cleaned) AS INTEGER) AS cleaned_len,
        |       CAST(concat('0x', substring(md5(cleaned), 1, 7)) AS BIGINT) AS cleaned_hash
        |FROM c ORDER BY doc_id""".stripMargin,
    "q69_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |b AS (
        |  SELECT doc_id, n,
        |         CAST(CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |                   WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
        |                   WHEN n <= 256 THEN 256 ELSE 512 END AS INTEGER) AS bucket
        |  FROM t),
        |g AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n) AS BIGINT) AS total_tokens,
        |         CAST(sum(least(n, bucket)) AS BIGINT) AS kept_tokens
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n_docs, total_tokens, kept_tokens,
        |       round(1.0::DOUBLE - CAST(kept_tokens AS DOUBLE)
        |             / CAST(n_docs * bucket AS DOUBLE), 6) AS pad_waste
        |FROM g ORDER BY bucket""".stripMargin,
    "q70_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 11 = 0 THEN concat(text, ' ', text)
        |              ELSE text END AS text
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n,
        |         list_transform(string_split(text, ' '),
        |           x -> CAST(concat('0x', substring(md5(x), 1, 7)) AS BIGINT)) AS th
        |  FROM d),
        |s AS (
        |  SELECT doc_id, n,
        |         len(list_distinct(list_transform(range(1, len(th)),
        |           i -> (th[i] * 31 + th[i + 1]) % 2147483647))) AS nd
        |  FROM t),
        |r AS (
        |  SELECT doc_id, n, nd,
        |         1.0::DOUBLE - CAST(nd AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS ratio
        |  FROM s)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
        |       CAST(n - 1 AS INTEGER) AS n_bigrams,
        |       CAST(nd AS INTEGER) AS n_distinct,
        |       round(ratio, 6) AS rep_ratio,
        |       ratio > 0.2 AS repetitive
        |FROM r ORDER BY doc_id""".stripMargin,
    "q71_stratified_sample" ->
      """WITH k AS (
        |  SELECT doc_id, lang,
        |         CAST(concat('0x', substring(md5(concat(lang, ':', doc_id)), 1, 7)) AS BIGINT) % 100
        |           < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 30 ELSE 10 END AS keep
        |  FROM documents),
        |g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         min(CASE WHEN keep THEN doc_id END) AS first_kept,
        |         max(CASE WHEN keep THEN doc_id END) AS last_kept
        |  FROM k GROUP BY lang)
        |SELECT lang, n_total, n_kept, first_kept, last_kept,
        |       round(CAST(n_kept AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS realized_rate
        |FROM g ORDER BY lang""".stripMargin,
    "q79_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n,
        |         sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |p AS (
        |  SELECT lang, CAST(floor((cum - n) / 4096.0) AS INTEGER) AS pack_id,
        |         doc_id, n
        |  FROM c)
        |SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin
  )
}
