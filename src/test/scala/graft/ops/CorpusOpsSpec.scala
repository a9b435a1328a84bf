package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSessionTestWrapper

/** Semantic invariants for the round-4 corpus operators: decontamination
  * (q66), chunking (q67), PII scrubbing (q68), length bucketing (q69),
  * repetition scoring (q70) and stratified sampling (q71).
  */
class CorpusOpsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("q66: leaked eval docs are flagged against their source; reversed controls are clean") {
    import spark.implicits._
    val out = Dedup.queries("q66_decontamination")(spark, dir).cache()
    val leaked = out.filter($"eval_id" < 30000).cache()
    // every leaked doc (source minus one token) must be contaminated and
    // its top contaminator must be the very doc it was derived from
    assert(leaked.filter(!$"contaminated").count() == 0)
    assert(leaked.filter($"train_id" =!= $"eval_id" - 20000).count() == 0)
    // reversed-token controls share vocabulary but no bigrams — none may
    // cross the contamination threshold
    assert(out.filter($"eval_id" >= 30000 && $"contaminated").count() == 0)
    leaked.unpersist(); out.unpersist()
  }

  test("q67: chunks tile each document exactly (stride 24, window 32)") {
    import spark.implicits._
    val out = TextAnalysis.queries("q67_chunking")(spark, dir).cache()
    assert(out.filter($"chunk_len" < 1 || $"chunk_len" > 32).count() == 0)
    assert(out.filter($"start" =!= $"chunk_idx" * 24).count() == 0)
    // the last chunk of every doc must reach exactly the doc's token count
    val cover = out.groupBy($"doc_id")
      .agg(max($"start" + $"chunk_len").as("covered"), min($"start").as("first"))
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).as("n"))
    assert(cover.join(docs, "doc_id")
      .filter($"covered" =!= $"n" || $"first" =!= 0).count() == 0)
    out.unpersist()
  }

  test("q68: every doc has its injected PII found, and scrubbed text stays distinct") {
    import spark.implicits._
    val out = TextAnalysis.queries("q68_pii_scrub")(spark, dir).cache()
    val n = out.count()
    assert(out.filter($"n_emails" < 1 || $"n_urls" < 1 || $"n_longnums" < 1).count() == 0)
    // the scrub replaces doc_id-bearing tokens, so remaining distinctness
    // must come from the document text itself
    val distinct = out.select("cleaned_hash").distinct().count()
    assert(distinct.toDouble / n >= 0.99, s"cleaned hash collisions: ${n - distinct}")
    out.unpersist()
  }

  test("q69: buckets are powers of two, partition the corpus, and waste is a fraction") {
    import spark.implicits._
    val out = TextAnalysis.queries("q69_length_buckets")(spark, dir).cache()
    val valid = Set(16, 32, 64, 128, 256, 512)
    assert(out.filter(!$"bucket".isin(valid.toSeq: _*)).count() == 0)
    val total = out.agg(sum($"n_docs")).first().getLong(0)
    assert(total == graft.Tables.documents(spark, dir).count())
    assert(out.filter($"pad_waste" < 0 || $"pad_waste" >= 1).count() == 0)
    assert(out.filter($"kept_tokens" > $"n_docs" * $"bucket").count() == 0)
    out.unpersist()
  }

  test("q70: doubled docs are flagged repetitive, ratios well-formed") {
    import spark.implicits._
    val out = TextAnalysis.queries("q70_repetition")(spark, dir).cache()
    assert(out.filter($"doc_id" % 11 === 0 && !$"repetitive").count() == 0)
    assert(out.filter($"rep_ratio" < 0 || $"rep_ratio" > 1).count() == 0)
    assert(out.filter($"n_distinct" > $"n_bigrams").count() == 0)
    out.unpersist()
  }

  test("q72: profile covers each column once with consistent counts") {
    import spark.implicits._
    val out = Relational.queries("q72_profile")(spark, dir).cache()
    val n = graft.Tables.lineitem(spark, dir).count()
    assert(out.count() == 5)
    assert(out.filter($"n_rows" =!= n).count() == 0)
    assert(out.filter($"n_distinct" > $"n_rows" - $"n_nulls").count() == 0)
    assert(out.filter($"n_nulls" < 0).count() == 0)
    out.unpersist()
  }

  test("q73: histogram partitions the table and labels buckets correctly") {
    import spark.implicits._
    val out = Relational.queries("q73_histogram")(spark, dir).cache()
    val n = graft.Tables.lineitem(spark, dir).count()
    assert(out.agg(sum($"n_rows")).first().getLong(0) == n)
    assert(out.filter($"lo" =!= $"bucket" * 5000).count() == 0)
    assert(out.filter($"n_rows" <= 0).count() == 0)
    out.unpersist()
  }

  test("q74: resample grid is contiguous hourly and accounts for every event") {
    import spark.implicits._
    val out = Relational.queries("q74_resample")(spark, dir).cache()
    // hours step by exactly 3600s within each user
    val step = out.withColumn("prev",
      lag($"hour_us", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"hour_us")))
    assert(step.filter($"prev".isNotNull && $"hour_us" - $"prev" =!= 3600000000L)
      .count() == 0)
    // every source event lands in some grid hour
    val nEvents = graft.Tables.events(spark, dir)
      .filter($"user_id" < 30).count()
    assert(out.agg(sum($"n_events")).first().getLong(0) == nEvents)
    // forward fill leaves no gaps once a user has observed a value
    assert(out.filter($"filled_value".isNull).count() == 0)
    out.unpersist()
  }

  test("q75: clip bounds are ordered and clipped counts stay within the tails") {
    import spark.implicits._
    val out = Relational.queries("q75_winsorize")(spark, dir).cache()
    assert(out.filter($"p01" > $"p99").count() == 0)
    // at most ~1% of each group can sit strictly outside each bound
    assert(out.filter($"n_low" > $"n" * 0.02 || $"n_high" > $"n" * 0.02).count() == 0)
    assert(out.filter($"n_low" + $"n_high" <= 0).count() == 0,
      "testdata should have at least some clipped rows")
    out.unpersist()
  }

  test("q76: drifted union keeps every order and isolates legacy rows in the NULL group") {
    import spark.implicits._
    val out = Relational.queries("q76_schema_union")(spark, dir).cache()
    val o = graft.Tables.orders(spark, dir)
    assert(out.agg(sum($"n_orders")).first().getLong(0) == o.count())
    val legacy = o.filter($"o_orderdate" <
      lit("1996-01-01").cast("timestamp")).count()
    assert(out.filter($"o_orderstatus".isNull).select("n_orders")
      .first().getLong(0) == legacy)
    out.unpersist()
  }

  test("q78: arrivals match their mutation source; history pairs never form") {
    import spark.implicits._
    val out = Dedup.queries("q78_incremental_dedup")(spark, dir).cache()
    // only arrival-side rows, similarity at/above the threshold
    assert(out.filter($"new_id" < 10000).count() == 0)
    assert(out.filter($"est_jaccard" < 0.5).count() == 0)
    // every arrival is a one-token mutant of (new_id - 10000): that
    // source must be recalled among its matches
    val matched = out.filter($"match_id" === $"new_id" - 10000)
      .select("new_id").distinct().count()
    val arrivals = out.select("new_id").distinct().count()
    assert(matched == arrivals,
      s"only $matched of $arrivals arrivals recalled their source")
    out.unpersist()
  }

  test("q79: packs conserve every token and number contiguously per language") {
    import spark.implicits._
    val out = TextAnalysis.queries("q79_sequence_pack")(spark, dir).cache()
    val perLang = graft.Tables.documents(spark, dir)
      .select($"lang", size(split($"text", " ")).as("n"))
      .groupBy($"lang").agg(sum($"n").as("total"))
    // token conservation: packed totals equal source totals per language
    val packed = out.groupBy($"lang").agg(sum($"pack_tokens").as("packed"))
    assert(packed.join(perLang, "lang").filter($"packed" =!= $"total").count() == 0)
    // pack ids start at 0 and are contiguous within each language
    val ids = out.groupBy($"lang")
      .agg(min($"pack_id").as("lo"), max($"pack_id").as("hi"),
        count(lit(1)).as("k"))
    assert(ids.filter($"lo" =!= 0 || $"hi" =!= $"k" - 1).count() == 0)
    out.unpersist()
  }

  test("q80: every order matches exactly one dimension version") {
    import spark.implicits._
    val out = Relational.queries("q80_scd2_join")(spark, dir).cache()
    // validity ranges partition time, so the two versions together must
    // account for every order exactly once
    val total = out.agg(sum($"n_orders")).first().getLong(0)
    assert(total == graft.Tables.orders(spark, dir).count(),
      "SCD-2 validity ranges dropped or duplicated orders")
    assert(out.count() == 2)
    out.unpersist()
  }

  test("q81: no source exceeds the cap and kept docs are the lowest ids") {
    import spark.implicits._
    val out = TextAnalysis.queries("q81_source_cap")(spark, dir).cache()
    assert(out.filter($"n_kept" > 15).count() == 0)
    assert(out.filter($"n_kept" > $"n_total").count() == 0)
    // capped flag is consistent with the counts
    assert(out.filter($"capped" =!= ($"n_total" > $"n_kept")).count() == 0)
    out.unpersist()
  }

  test("q71: sample is deterministic and bounded by stratum size") {
    import spark.implicits._
    val run1 = TextAnalysis.queries("q71_stratified_sample")(spark, dir).collect()
    val run2 = TextAnalysis.queries("q71_stratified_sample")(spark, dir).collect()
    assert(run1.sameElements(run2), "hash-based sample must be reproducible")
    val out = TextAnalysis.queries("q71_stratified_sample")(spark, dir).cache()
    assert(out.filter($"n_kept" > $"n_total" || $"n_kept" < 0).count() == 0)
    // en is sampled at 50%, others at 10-30% — with ~70-190 docs per
    // stratum the realized rate must land within a generous band
    assert(out.filter($"lang" === "en" &&
      ($"realized_rate" < 0.3 || $"realized_rate" > 0.7)).count() == 0)
    out.unpersist()
  }

  test("q131 PERMISSIVE variant: corrupt-record column preserves the raw line per bad row") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val p = Core.ensureCorruptCsv(spark, dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("_bad", StringType)))
    // cache first: Spark disallows plans referencing ONLY the internal
    // corrupt column of a CSV scan (the documented cache barrier)
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(p).cache()
    val bad = raw.filter($"_bad".isNotNull)
    val expected = graft.Tables.lineitem(spark, dir)
      .filter($"l_orderkey" % 97 === 0).count()
    assert(bad.count() == expected, "every corrupted row must be quarantined")
    // the raw line survives verbatim: it still carries the poison token,
    // and the malformed field parsed as null while good fields kept values
    assert(bad.filter(!$"_bad".contains("NOT_A_NUMBER")).count() == 0)
    assert(bad.filter($"l_quantity".isNotNull).count() == 0)
    assert(bad.filter($"l_orderkey".isNull).count() == 0)
    raw.unpersist()
  }

  test("binaryFile source reads exact bytes (multimodal ingest path)") {
    import spark.implicits._
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dir)
      .select($"path", $"length", $"content")
      .collect()
    assert(rows.nonEmpty, "no files ingested")
    rows.foreach { r =>
      val p = java.nio.file.Paths.get(new java.net.URI(r.getAs[String]("path")))
      val disk = java.nio.file.Files.readAllBytes(p)
      assert(r.getAs[Long]("length") == disk.length.toLong)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("content"), disk),
        s"content mismatch for $p")
    }
  }
}
