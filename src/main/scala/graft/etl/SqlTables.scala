package graft.etl

import org.apache.spark.sql.SparkSession

/** DDL twin of the reference's `create_sql_tables`
  * (wallmart_pipeline.py:17-36): declare the two output tables up front
  * so a load has a typed target, idempotently ("ensures necessary tables
  * exist"). Two surfaces:
  *
  *   - Spark catalog: `CREATE TABLE IF NOT EXISTS ... USING parquet` at
  *     an explicit LOCATION — the warehouse-native half. Spark tables
  *     don't enforce key constraints, so the reference's PRIMARY KEYs
  *     live only in the database DDL.
  *   - JDBC: plain DDL over `java.sql.Connection` with the declared
  *     PRIMARY KEYs (key columns NOT NULL, as Derby/ANSI require).
  *     Idempotence is a catalog-metadata probe — Derby has no
  *     `IF NOT EXISTS`.
  *
  * The reference's Postgres `FLOAT` (= double precision) maps to DOUBLE.
  */
object SqlTables {

  /** (column, SQL type, part-of-primary-key) per table, in reference
    * declaration order.
    */
  val tableDefs: Seq[(String, Seq[(String, String, Boolean)])] = Seq(
    "clean_sales" -> Seq(
      ("Store_ID", "INT", true),
      ("Weekly_Sales", "DOUBLE", false),
      ("IsHoliday", "BOOLEAN", false),
      ("CPI", "DOUBLE", false),
      ("Unemployment", "DOUBLE", false),
      ("Month", "INT", true)),
    "monthly_sales" -> Seq(
      ("Month", "INT", true),
      ("Avg_Sales", "DOUBLE", false)))

  def createSparkTables(spark: SparkSession, baseDir: String): Unit =
    tableDefs.foreach { case (name, cols) =>
      val colDdl = cols.map { case (c, t, _) => s"$c $t" }.mkString(", ")
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $name ($colDdl) USING parquet " +
          s"LOCATION '$baseDir/$name'")
    }

  def createJdbcTables(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData
      tableDefs.foreach { case (name, cols) =>
        val rs = meta.getTables(null, null, name.toUpperCase, null)
        val exists = try rs.next() finally rs.close()
        if (!exists) {
          val colDdl = cols.map { case (c, t, pk) =>
            s"$c $t${if (pk) " NOT NULL" else ""}"
          }.mkString(", ")
          val pkDdl = cols.collect { case (c, _, true) => c }.mkString(", ")
          val st = conn.createStatement()
          try st.executeUpdate(s"CREATE TABLE $name ($colDdl, PRIMARY KEY ($pkDdl))")
          finally st.close()
        }
      }
    } finally conn.close()
  }
}
