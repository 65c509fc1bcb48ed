package graft

import graft.queries.CoreQueries
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality guards: the properties the engine's scale story
  * rests on must be visible in the executed plans, not just intended —
  * filters reach the parquet scan, dimension joins broadcast, the hot
  * path stays inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("p8 price filter pushes down to the parquet scan") {
    val plan = executedPlan("p8_price_filter")
    assert(plan.contains("PushedFilters: [IsNotNull(l_extendedprice), GreaterThan(l_extendedprice,0.01)]"),
      s"filter not pushed:\n$plan")
  }

  test("scans prune columns to the projection") {
    val plan = executedPlan("p8_price_filter")
    // Only the three selected columns should be read.
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>") ||
      plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:bigint,l_extendedprice:double>"),
      s"scan reads more than the projection:\n$plan")
  }

  test("j1 article match broadcasts the dimension side") {
    val plan = executedPlan("j1_article_match")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q1 aggregation runs inside whole-stage codegen (final adaptive plan)") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    df.collect() // finalize the adaptive plan — codegen spans only show post-execution
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen marker in the final adaptive plan
    assert(plan.contains("*("), s"no codegen span:\n$plan")
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side partial aggregation:\n$plan")
  }

  test("p13 anti-filter compiles to a broadcast anti join (no shuffle of part)") {
    val plan = executedPlan("p13_anti_join")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
  }
}
