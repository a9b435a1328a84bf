package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All reads are plain `spark.read.parquet` so Catalyst's column pruning
  * and predicate pushdown reach the scan (verified via
  * `.explain("formatted")`: `ReadSchema` carries only referenced columns,
  * `PushedFilters` carries the pushed predicates).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive: every oracle-compared query assumes UTC (timestamps cross
    // the compare as epoch integers). Session builders pin it; this guard
    // covers callers that hand us an unpinned session, and only writes the
    // conf when it actually differs.
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** `events.ts` is TIMESTAMP(NANOS) on disk, which Spark's parquet reader
    * rejects outright. Read it as raw nanos (legacy conf) and convert to a
    * proper micros TimestampType with exact integer division — `ts div
    * 1000`, not `/`, because nanosecond epochs (~1.7e18) exceed a double's
    * 2^53 integer range. DuckDB truncates ns->us the same way on read, so
    * both engines see identical timestamps.
    *
    * The nanosAsLong conf is pinned at session build in Bench/Verify and
    * the test wrapper; the guard below only covers foreign sessions and
    * writes the conf at most once (no per-read mutation).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
