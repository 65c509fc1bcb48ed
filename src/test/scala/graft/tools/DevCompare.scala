package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: compares two registered queries' results on a fixture
  * dir (row-set equality after collect+sort). Used while tuning d14's
  * probe width; not part of the gate. */
object DevCompare {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q1 = args(1)
    val q2 = args(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = graft.SparkEntry.queries(q1)(spark, dir).collect().map(_.toString).sorted
    val b = graft.SparkEntry.queries(q2)(spark, dir).collect().map(_.toString).sorted
    println(s"$q1: ${a.length} rows; $q2: ${b.length} rows")
    val missing = a.toSet -- b.toSet
    val extra = b.toSet -- a.toSet
    println(s"missing from $q2: ${missing.size}; extra in $q2: ${extra.size}")
    missing.take(10).foreach(r => println(s"  missing: $r"))
    extra.take(10).foreach(r => println(s"  extra:   $r"))
    println(if (missing.isEmpty && extra.isEmpty) "EQUAL" else "DIFFER")
    spark.stop()
  }
}
