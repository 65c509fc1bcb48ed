package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (and the training-data pipeline
  * extensions) is exposed as a named query over the TESTDATA.md fixture
  * tables; `oracleSql` carries the DuckDB-equivalent SQL for the
  * hash-compare correctness gate. Queries whose core is a deterministic
  * JVM function DuckDB cannot express (difflib-parity similarity, the
  * multi-pattern code extractor) are declared without an oracle →
  * rows-only check + dedicated ScalaTest parity specs.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, QueryFn], Map[String, String])] = Seq(
    (CoreQueries.queries, CoreQueries.oracle),
    (FunctionQueries.queries, FunctionQueries.oracle),
    (TextQueries.queries, TextQueries.oracle),
    (MatchQueries.queries, MatchQueries.oracle),
    (MutationQueries.queries, MutationQueries.oracle),
    (SourceQueries.queries, SourceQueries.oracle),
    (PreprocessQueries.queries, PreprocessQueries.oracle),
    (DedupQueries.queries, DedupQueries.oracle),
    (AnnQueries.queries, AnnQueries.oracle),
    (MultimodalQueries.queries, MultimodalQueries.oracle),
    (AnalyticsQueries.queries, AnalyticsQueries.oracle),
    (WebQueries.queries, WebQueries.oracle),
    (PipelineQueries.queries, PipelineQueries.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
