package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute and return rows at sf0.001 — the
  * same contract the driver smoke-checks for `SparkEntry.entry`. Keeps a
  * broken query from reaching the oracle round unnoticed by `sbt test`.
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkSessionTestWrapper {
  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle twin or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without a query: ${o -- q}")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name runs and returns rows at sf0.001") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
}
