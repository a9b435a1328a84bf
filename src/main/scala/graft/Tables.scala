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
  /** Memoized analyzed frames, keyed by (session, path). The testdata
    * tables are immutable inputs, so re-reading them per query only
    * re-pays driver-side file listing + parquet footer decoding —
    * measurable fixed latency (~tens of ms per `spark.read.parquet`)
    * across a 220-query suite of sub-second queries. A resident
    * production session does exactly this once, by registering the
    * table in the catalog; the memo is that registration. Keying on the
    * session keeps test isolation (each spec's session lists its own
    * files); the cached value is an immutable logical plan, so sharing
    * it across queries is free of aliasing hazards. Column pruning /
    * predicate pushdown are unaffected — they act on each query's plan
    * at optimization time, not at read-definition time.
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive: every oracle-compared query assumes UTC (timestamps cross
    // the compare as epoch integers). Session builders pin it; this guard
    // covers callers that hand us an unpinned session, and only writes the
    // conf when it actually differs.
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    val path = s"$dir/$name.parquet"
    memo.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")

  /** `events.ts` has shipped in two physical forms across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * unless read as raw longs via the legacy conf) and plain micros
    * (surfacing as TIMESTAMP_NTZ under Spark 4's NTZ inference). Normalize
    * both to a session-UTC micros TimestampType so every downstream query
    * and oracle compare sees identical values regardless of generation:
    *  - LongType (legacy nanos-as-long): exact integer `div 1000` — not
    *    `/`, because nanosecond epochs (~1.7e18) exceed a double's 2^53
    *    integer range — then `timestamp_micros`. DuckDB truncates ns->us
    *    the same way on read.
    *  - TIMESTAMP_NTZ: cast to TimestampType; bit-identical micros under
    *    the UTC session zone pinned in `table()`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
