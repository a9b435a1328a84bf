package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module inventories; every entry has a
  * DuckDB oracle twin in `oracleSql` unless the operator is inherently
  * non-SQL-expressible (approximate/randomized ops), which the driver
  * downgrades to a rows-only check.
  */
object SparkEntry {

  /** Flagship: the reference pipeline shape (impute -> month -> filter ->
    * group-by-month mean, SURVEY.md §3) re-expressed over the sf0.001
    * lineitem table. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Core.queries("q11_group_agg")(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Core.queries, ops.Core.oracle),
      (ops.Dedup.queries, ops.Dedup.oracle),
      (ops.Similarity.queries, ops.Similarity.oracle),
      (ops.TextAnalysis.queries, ops.TextAnalysis.oracle),
      (ops.Sketching.queries, ops.Sketching.oracle),
      (ops.Relational.queries, ops.Relational.oracle),
      (ops.Multimodal.queries, ops.Multimodal.oracle),
      (ops.Layout.queries, ops.Layout.oracle),
      (table.TableOps.queries, table.TableOps.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
