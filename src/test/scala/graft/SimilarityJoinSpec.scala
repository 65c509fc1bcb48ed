package graft

import graft.plans.{GraftExtensions, SimilarityJoinRule, SimilarityJoinStrategy}
import graft.queries.Fixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole-operator extension path: declarative crossJoin + threshold
  * filter transparently rewritten (Rule) into the custom logical node and
  * planned (Strategy) into the native blocked similarity-join exec. */
class SimilarityJoinSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  private def declarativeQuery() = {
    GraftExtensions.register(spark)
    val cands = Fixture.supplierSide(spark, sfDir)
      .filter(col("article") % 97 === 0)
      .select(col("article"), Fixture.supplierName(col("article")).as("cname"))
    val base = Fixture.baseSide(spark, sfDir)
      .select(col("article").as("base_article"),
        Fixture.baseName(col("article"), col("name")).as("bname"))
    cands.crossJoin(base)
      .where(expr("graft_similarity(cname, bname) >= 0.62"))
      .select("article", "base_article")
  }

  private def withNativeJoin[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SimilarityJoinRule
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ SimilarityJoinStrategy
    try body finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SimilarityJoinRule)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == SimilarityJoinStrategy)
    }
  }

  test("rule + strategy plan the declarative shape into the native exec") {
    withNativeJoin {
      val df = declarativeQuery()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SimilarityJoinExec") || plan.contains("SimilarityJoin"),
        s"native operator not planned:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"cross join survived the rewrite:\n$plan")
    }
  }

  test("native similarity join returns exactly the expression-filtered cross join") {
    val expected = declarativeQuery() // no extras: plain BNL join + expression filter
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "threshold too high — test would be vacuous")
    val native = withNativeJoin {
      declarativeQuery().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(native === expected)
  }

  test("build side over autoBroadcastJoinThreshold falls back to the banded cross join") {
    val expected = declarativeQuery() // plain BNL join + expression filter
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withNativeJoin {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1") // nothing fits
      try {
        val df = declarativeQuery()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("SimilarityJoinExec"),
          s"driver-collect build side must not plan over the broadcast cap:\n$plan")
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows === expected, "fallback plan changed results")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("strict > excludes exact-threshold ties; >= keeps them") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // ratio("abcd","abcf") = 2*3/(4+4) = 0.75 exactly
    val l = Seq("abcd").toDF("cname")
    val r = Seq("abcf").toDF("bname")
    def q(op: String) =
      l.crossJoin(r).where(expr(s"graft_similarity(cname, bname) $op 0.75"))
    withNativeJoin {
      val ge = q(">=")
      assert(ge.queryExecution.executedPlan.toString.contains("SimilarityJoin"))
      assert(ge.count() === 1L, ">= 0.75 must keep the exact-tie pair")
      val gt = q(">")
      assert(gt.queryExecution.executedPlan.toString.contains("SimilarityJoin"),
        "strict > should still plan natively (with the strict flag)")
      assert(gt.count() === 0L, "> 0.75 must exclude the exact-tie pair")
    }
  }

  test("j2's gated fuzzy-probe shape plans the native exec under the engine rules") {
    withNativeJoin {
      val df = graft.queries.MatchQueries.queries("j2_fuzzy_probe")(spark, sfDir)
      // SparkPlan.nodeName strips the Exec suffix, so the physical node
      // renders as "SimilarityJoin" too — assert the cross join is gone.
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SimilarityJoin"),
        s"FuzzyJoin's declarative shape must go native in an engine session:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"cross join survived the rewrite:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("residual conjuncts survive as a filter above the native join") {
    withNativeJoin {
      val cands = Fixture.supplierSide(spark, sfDir)
        .filter(col("article") % 97 === 0)
        .select(col("article"), Fixture.supplierName(col("article")).as("cname"))
      val base = Fixture.baseSide(spark, sfDir)
        .select(col("article").as("base_article"),
          Fixture.baseName(col("article"), col("name")).as("bname"))
      val df = cands.crossJoin(base)
        .where(expr("graft_similarity(cname, bname) >= 0.62 AND base_article % 2 = 0"))
        .select("article", "base_article")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SimilarityJoin"), s"no native join:\n$plan")
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.forall(_._2 % 2 == 0), "residual predicate dropped")
    }
  }
}
