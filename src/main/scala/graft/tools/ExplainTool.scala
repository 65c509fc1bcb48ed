package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of the named queries at
  * sf0.001 (args = query names; default the newest additions). */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq("x7_pq_adc", "e11_anomaly", "t16_lm_familiarity")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString.take(40000))
    }
    spark.stop()
  }
}
