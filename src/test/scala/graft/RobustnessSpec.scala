package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input contract over the ENTIRE query surface: a production
  * pipeline reads empty date-partitions routinely, so every one of the
  * registered queries must return an (empty or null-stat) result on
  * zero-row tables — never throw. This sweep found 15 crash sites when
  * first run (empty-seed codebook indexing, 0/0 seed moduli, BPE's
  * collect()(0), schema inference over fileless landing dirs, ANSI
  * divide-by-zero in ratio stats); it exists so none of them regress. */
class RobustnessSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("every registered query tolerates zero-row tables") {
    val src = SparkTestBase.sfDir
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_tables").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.take(120)}") }
    }
    assert(failures.isEmpty,
      s"queries crashed on empty tables:\n${failures.mkString("\n")}")
    graft.queries.Caches.release(spark, dir)
  }
}
