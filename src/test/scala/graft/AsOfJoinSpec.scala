package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin edge semantics the fixture can't exercise: equal-timestamp
  * inclusivity, tie-breaking between simultaneous right rows, and the
  * no-prior-fact null branch. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("inclusive at equality, deterministic tie-break, null when no prior fact") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 5L), (3L, 99L, 50L))
      .toDF("key", "lid", "lt")
    // key 1: facts at t=10 (id 7) and TWO at t=10? -> ids 7,8 at same t=10:
    // greater tiebreak (8) must win; fact at t=11 is after lt=10 for no row.
    // key 2: only fact is at t=6 > lt=5 -> null match.
    // key 3: no facts at all -> null match.
    val right = Seq((1L, 7L, 10L), (1L, 8L, 10L), (1L, 9L, 11L), (2L, 6L, 6L))
      .toDF("key", "rid", "rt")
    val out = AsOfJoin.join(left, right, Seq("key"),
        col("lt"), col("rt"), Seq("rid", "rt"), col("rid"), "m")
      .select(col("lid"), col("m.rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out === Set((100L, Some(8L)), (100L, None), (99L, None)))
  }
}
