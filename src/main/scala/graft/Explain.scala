package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of one SparkEntry query.
  * Usage: runMain graft.Explain <queryName> [sfDir]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // sorted bucket scans: expose sortBy order from one-file-per-bucket
      // tables (s18) so bucketed merge joins need neither Exchange nor Sort
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.contains("GRAFT_EXPLAIN_LOGICAL"))
      // scalastyle:off println
      println(df.queryExecution.optimizedPlan.treeString)
    else df.explain("formatted")
    spark.stop()
  }
}
