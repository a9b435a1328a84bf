package graft.etl

import org.apache.spark.sql.DataFrame

/** O15: JDBC sink, full-replace semantics (reference: pandas `to_sql`
  * with `if_exists="replace"`, wallmart_pipeline.py:145-150).
  *
  * Config-gated and off by default, matching the reference's
  * `db_url=None` default (wallmart_pipeline.py:129). The write is plain
  * `DataFrameWriter.jdbc`, which distributes one INSERT batch per
  * partition — for a 100 TB-scale export, repartition to bound
  * per-connection batch size and set `batchsize`/`isolationLevel`.
  * Round-trip tested against an embedded Derby instance (JdbcSinkSpec);
  * q15 additionally covers the disabled-gate parity path.
  */
object JdbcSink {
  def write(df: DataFrame, url: String, table: String,
            properties: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode("overwrite").jdbc(url, table, properties)

  /** The reference's `load` writes only when a db_url is provided. */
  def writeIfEnabled(df: DataFrame, url: Option[String], table: String): Boolean =
    url match {
      case Some(u) => write(df, u, table); true
      case None    => false
    }
}
