package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-first bootstrap: one register() call makes tables and native
  * functions resolvable by name from plain spark.sql.
  */
class CatalogSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val dir = "/root/testdata/sf0.001"

  test("register exposes every table and the native functions to plain SQL") {
    Catalog.register(spark, dir)
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) > 0,
        s"view $t empty or missing")
    }
    // a pure-SQL near-dup check driving two native expressions by name
    val r = spark.sql(
      """SELECT a.doc_id, b.doc_id,
        |       sorted_overlap(shingle_hashes(split(a.text, ' ')),
        |                      shingle_hashes(split(b.text, ' '))) AS ov
        |FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
        |LIMIT 5""".stripMargin).collect()
    assert(r.length == 5 && r.forall(_.getLong(2) >= 0))
    // idempotent re-registration
    Catalog.register(spark, dir)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
  }
}
