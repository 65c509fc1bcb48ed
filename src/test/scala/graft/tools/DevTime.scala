package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: steady-state timing of one query with pass-by-pass
  * breakdown. Not part of the gate. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val passes = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
