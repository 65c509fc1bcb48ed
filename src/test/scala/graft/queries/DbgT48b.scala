package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object DbgT48b {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"T48DBG $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm full")(TextQueries.queries("t48_crawl_funnel")(s, dir)
      .queryExecution.toRdd.count())
    // now time the stages the steady run repeats
    time("verdicts")(PipelineQueries.langVerdictsAll(s, dir)
      .select("doc_id", "pred_lang").queryExecution.toRdd.count())
    val content = TextQueries.extractionLandingFor(s, dir)
      .select(col("doc_id"), col("source"), col("content").as("c"))
    val q = content.filter(length(col("c")) >= 300)
      .withColumn("toks", size(split(col("c"), " ")).cast("long"))
    time("q scan")(q.queryExecution.toRdd.count())
    val routedRaw = q.join(PipelineQueries.langVerdictsAll(s, dir)
        .select(col("doc_id"), col("pred_lang")), Seq("doc_id"), "left")
      .withColumn("pred_lang", coalesce(col("pred_lang"), lit("und")))
    time("routed join (pre-checkpoint)")(routedRaw.queryExecution.toRdd.count())
    var routed: org.apache.spark.sql.DataFrame = null
    time("checkpoint routed")({ routed = Caches.checkpointed(dir, routedRaw) })
    val w = Window.partitionBy(md5(col("c"))).orderBy("doc_id")
    val canon = routed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    time("canon")(canon.queryExecution.toRdd.count())
    val wd = Window.partitionBy("reg_domain").orderBy(col("toks").desc, col("doc_id"))
    val cappedU = graft.functions.Url.withParsed(
        canon.select(col("doc_id"), col("source"), col("pred_lang"), col("toks"))
          .withColumn("url", graft.functions.Url.urlOf(col("doc_id"), col("source"))))
      .withColumn("rnd", row_number().over(wd))
      .filter(col("rnd") <= lit(WebQueries.DomainCapDocs))
      .select("doc_id", "pred_lang", "toks")
    time("capped (uncached eval)")(cappedU.queryExecution.toRdd.count())
    time("capped again")(cappedU.queryExecution.toRdd.count())
    var capped: org.apache.spark.sql.DataFrame = null
    time("capped cache+materialize")({ capped = Caches.trackCached(dir, cappedU)
      capped.queryExecution.toRdd.count(); () })
    val ordered = graft.operators.GlobalOrder.withRunningTotalWithin(
      capped, "cum", Seq("pred_lang"), col("toks"), col("toks").desc, col("doc_id"))
    time("ordered")(ordered.queryExecution.toRdd.count())
    val budgets = ordered.groupBy("pred_lang")
      .agg(expr("CAST(sum(toks) * 4 div 10 AS BIGINT)").as("budget"),
        count(lit(1)).as("np"))
    time("budgets")(budgets.queryExecution.toRdd.count())
    val kept = ordered.join(broadcast(budgets.select("pred_lang", "budget")),
        Seq("pred_lang")).filter(col("cum") < col("budget"))
    time("kept")(kept.queryExecution.toRdd.count())
    val report = routed.groupBy("pred_lang").agg(count(lit(1)).as("n_routed"))
      .join(canon.groupBy("pred_lang")
        .agg(count(lit(1)).as("n_dedup"), sum("toks").as("dedup_tokens")), Seq("pred_lang"))
      .join(kept.groupBy("pred_lang")
        .agg(max("budget").as("budget"), count(lit(1)).as("n_kept"),
          sum("toks").as("kept_tokens")), Seq("pred_lang"))
      .join(budgets.select("pred_lang", "np"), Seq("pred_lang"))
      .withColumn("n_domain_capped", col("n_dedup") - col("np")).drop("np")
      .orderBy("pred_lang")
    time("report")(report.queryExecution.toRdd.count())
    s.stop()
  }
}
