package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 — the reference's timestamped-backup-then-mutate pattern
  * (main.py:6958-7005) re-architected for an append-only engine:
  * the base is a VERSIONED dataset (`root/v=N/`), every mutation writes
  * a new version, and "backup" is free because versions are immutable.
  * `restorePoint` is the version to re-read if a mutation needs rolling
  * back — no file copying involved.
  *
  * Scale notes: a version is an ordinary partitioned parquet write —
  * parallel, atomic at the directory level (Spark's commit protocol),
  * no rewrite of history. Version listing is a driver-side metadata
  * operation; at real scale the listing would live in a table catalog,
  * but the layout is identical.
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Existing version numbers, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  /** Write the frame as the next version; returns the version written. */
  def write(df: DataFrame, root: String): Int = {
    val next = latestVersion(df.sparkSession, root).getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$root/v=$next")
    next
  }

  /** Read a specific version, or the latest. */
  def read(spark: SparkSession, root: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no versions under $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** Compaction: rewrite the latest version into ⌈rows / targetRowsPerFile⌉
    * files as a NEW version (history stays immutable — rollback is
    * `read(root, Some(prev))`). The small-files problem is the classic
    * operational failure of long-running 100 TB ingest: thousands of
    * KB-sized parquet files per partition destroy scan parallelism
    * granularity (one task per file) and metadata servers. Sizing by row
    * count here stands in for byte-based sizing; the repartition is a
    * round-robin shuffle, so output files are uniformly sized regardless
    * of input skew. Returns the new version number. */
  def compact(spark: SparkSession, root: String, targetRowsPerFile: Long): Int = {
    val cur = read(spark, root)
    val n = cur.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    write(cur.repartition(files), root)
  }

  /** Retention vacuum: delete all but the newest `keep` versions.
    * The other half of the versioned-store contract — immutable
    * versions make backup free, but an unbounded history eventually
    * stores the table O(versions) times; production stores bound it
    * by retention (time- or count-based — count here). Strictly a
    * metadata-plus-delete operation: surviving versions' files are
    * untouched (SinkSpec pins byte-identity of the kept versions and
    * that reads of current + every kept restore point are unchanged).
    * Refuses keep < 1 — the current version is never vacuumable.
    * Returns the version numbers deleted, ascending. */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"vacuum must keep at least the current version, got keep=$keep")
    val vs = versions(spark, root)
    val doomed = vs.dropRight(keep)
    val f = fs(spark, root)
    doomed.foreach(v => f.delete(new Path(s"$root/v=$v"), true))
    doomed
  }
}
