package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute at sf0.001 and the flagship must
  * return rows (the driver's t1 smoke contract). */
class QuerySmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, SparkTestBase.sfDir)
      assert(df.count() >= 0)
    }
  }
}
