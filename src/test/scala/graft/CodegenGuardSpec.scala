package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dev-loop guard for the SILENT interpreted-eval fallback: when a
  * whole-stage-codegen body grows past janino's 64 KB method limit (or
  * fails to compile outright), `WholeStageCodegenExec.doExecute` logs a
  * warning and quietly runs the interpreted child — correct results,
  * 10–26× the cost. This class has bitten twice (s19 in r11, w2 in
  * r16), found both times only by bench anomaly; this guard makes it a
  * failing test instead. [[CodegenGuard.fallbackFailures]] re-compiles
  * every codegen body in the FINAL adaptive plan (a cache hit — the
  * run already compiled the good ones) and reports any body Spark
  * would have abandoned. */
object CodegenGuard {
  private def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: expand(a.executedPlan)
    case q: QueryStageExec => q +: expand(q.plan)
    case other => other +: other.children.flatMap(expand)
  }

  /** Execute `df` and compile every WholeStageCodegen body in its final
    * adaptive plan; one message per body janino rejects or whose
    * largest method exceeds `spark.sql.codegen.hugeMethodLimit` —
    * exactly the two conditions under which Spark falls back to
    * interpreted eval at runtime. Empty = the plan really ran codegen'd. */
  def fallbackFailures(df: DataFrame): Seq[String] = {
    df.collect()
    val limit = df.sparkSession.sessionState.conf.hugeMethodLimit
    expand(df.queryExecution.executedPlan).collect {
      case w: WholeStageCodegenExec =>
        try {
          val (_, stats) = CodeGenerator.compile(w.doCodeGen()._2)
          if (stats.maxMethodCodeSize > limit)
            Some(s"codegen body over hugeMethodLimit " +
              s"(${stats.maxMethodCodeSize} > $limit bytecode bytes) at:\n" +
              w.nodeName + " " + w.child.nodeName)
          else None
        } catch {
          case e: Exception =>
            Some(s"codegen body failed to compile (${e.getClass.getSimpleName}: " +
              s"${String.valueOf(e.getMessage).take(300)}) at:\n" +
              w.nodeName + " " + w.child.nodeName)
        }
    }.flatten
  }
}

class CodegenGuardSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  test("the guard DETECTS the pre-fix w2 shape (parse chain inlined into aggregates)") {
    // r16's w2 first draft: the staged URL parse NOT cached before the
    // two aggregate branches, so CollapseProject inlines the whole
    // chain into the grouping keys of both aggregates — the measured
    // 10.6 s vs 0.4 s silent-interpreted cliff. The generated code is
    // data-independent, so the small-SF plan reproduces it exactly.
    // Released FIRST: a warm production cache (another suite ran w2
    // earlier in this JVM) plan-matches the canary's subtree and
    // CacheManager substitutes the InMemoryRelation — the chain never
    // inlines and the canary is silently defeated (order-dependent
    // flake seen when PlanSpec precedes this suite).
    graft.queries.Caches.release(spark, sfDir)
    val docs = graft.queries.WebQueries.parsedDocs(spark, sfDir)
      .select(col("doc_id"), col("reg_domain"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("toks"))
    val dupDocs = SparkEntry.queries("d2_minhash_lsh")(spark, sfDir)
      .select(col("doc1").as("doc_id"))
      .unionByName(SparkEntry.queries("d2_minhash_lsh")(spark, sfDir)
        .select(col("doc2").as("doc_id"))).distinct()
    val base = docs.groupBy("reg_domain").agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum("toks").cast("long").as("n_tokens"))
    val dup = docs.join(dupDocs, Seq("doc_id"), "left_semi")
      .groupBy("reg_domain").agg(count(lit(1)).cast("long").as("n_dup_docs"))
    val preFix = base.join(dup, Seq("reg_domain"), "left")
      .select(col("reg_domain"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        expr("coalesce(n_dup_docs, 0) * 10000 div n_docs").as("dup_rate_bp"))
      .orderBy("reg_domain")
    val failures = CodegenGuard.fallbackFailures(preFix)
    assert(failures.nonEmpty,
      "the pre-fix w2 aggregate must trip the guard — if this ever " +
        "starts passing, Spark learned to stage the chain and the " +
        "production cache in w2 can be revisited")
    graft.queries.Caches.release(spark, sfDir)
  }

  test("the guard DETECTS the pre-fix e35 delta-build shape (parse chain + joins into the aggregate)") {
    // r17's e35 first draft: domainStatsOf aggregated the UNCACHED
    // parse chain with the blocklist + history joins still inlined —
    // the hashAgg method crossed 64 KB and the close bench logged
    // ERROR CodeGenerator (the build still wrote correct rows,
    // interpreted). The fix stages the narrow (reg_domain, toks)
    // projection through the cache inside domainStatsOf itself.
    // Released first — see the w2 canary's cache-substitution note.
    graft.queries.Caches.release(spark, sfDir)
    val parsed = graft.queries.WebQueries.parsedDocs(spark, sfDir)
      .filter(col("doc_id") % 20 === 0)
      .join(broadcast(graft.queries.WebQueries.blockedFrame(spark, sfDir)),
        Seq("reg_domain"), "left")
      .filter(col("reg_domain").isNotNull &&
        !coalesce(col("is_blocked"), lit(false)))
    val preFix = parsed
      .select(col("reg_domain"),
        when(col("text").isNull, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("toks"))
      .groupBy("reg_domain")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("toks").cast("long").as("n_tokens"))
    val failures = CodegenGuard.fallbackFailures(preFix)
    assert(failures.nonEmpty,
      "the pre-fix e35 build aggregate must trip the guard — if this " +
        "ever starts passing, Spark learned to stage the chain and " +
        "domainStatsOf's cache can be revisited")
    graft.queries.Caches.release(spark, sfDir)
  }

  test("the widest production plans run fully codegen'd (no interpreted fallback)") {
    Seq("w2_domain_rollup", "t48_crawl_funnel", "t58_lm3_perplexity",
        "w5_domain_refresh", "e35_domain_append").foreach { q =>
      val failures = CodegenGuard.fallbackFailures(
        SparkEntry.queries(q)(spark, sfDir))
      assert(failures.isEmpty,
        s"$q silently fell back to interpreted eval:\n${failures.mkString("\n")}")
    }
    graft.queries.Caches.release(spark, sfDir)
  }
}
