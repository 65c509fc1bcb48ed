package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print the final adaptive executed plan of named
  * queries. Not part of the gate. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
          l.contains("HashAggregate") || l.contains("Window") || l.contains("Sort") ||
          l.contains("TakeOrdered") || l.contains("Cartesian"))
        .map(_.take(180)).mkString("\n"))
    }
    spark.stop()
  }
}
