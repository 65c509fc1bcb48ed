package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Conditional post-scan fan-out for compute-heavy per-document
  * kernels (optimization guide §2.5: "input skew — one huge
  * unsplittable file … repartition immediately after the read").
  *
  * The fixture tables are one parquet file with ONE row group, so every
  * base-table scan plans a single non-empty task no matter how small
  * `spark.sql.files.maxPartitionBytes` is — and everything pipelined
  * into that scan (gram rolling-hash, shingling, n-gram explosion)
  * runs serially regardless of core count. Worse, when the next
  * operator is a per-doc window/groupBy, the exchange that finally
  * spreads the work sits AFTER the explode, so it shuffles every
  * derived row (tens of bytes per corpus position) instead of the
  * narrow source rows.
  *
  * [[byKey]] fixes both at once for pipelines keyed by a document-ish
  * key: when (and only when) the source plans fewer partitions than
  * the session's cores, it hash-repartitions the SOURCE rows by that
  * key before the heavy map work. Spark's `HashPartitioning.satisfies`
  * accepts a subset of a required clustering, so a downstream
  * `Window.partitionBy(key)` or `groupBy(key, …)` re-uses this
  * exchange instead of adding its own — the net exchange count is
  * unchanged while the shuffled bytes drop from (exploded rows) to
  * (source rows) and the per-row compute spreads over all cores.
  *
  * Scale behavior: a production table scan plans at least cores-many
  * splits (many files / row groups), so the guard makes this the
  * identity there — it is a LOCAL-parallelism repair, not a plan-shape
  * change, and it keys on the real scan layout rather than a tuned
  * constant. The partition count comes from `spark.sql.shuffle.partitions`
  * (session-adaptive), never a literal.
  */
object ScanFan {

  /** Hash-repartition `df` by `key` iff its planned scan parallelism is
    * below the session's core count. The key must be (close to) unique
    * per row group — doc_id everywhere in this repo — so the fan-out
    * cannot itself introduce skew. */
  def byKey(df: DataFrame, key: Column): DataFrame = {
    // a streaming frame cannot be planned ahead of execution (no .rdd)
    // and micro-batches are already executor-sized — identity there, so
    // batch/stream shared kernels can call this unconditionally
    if (df.isStreaming) return df
    val sc = df.sparkSession.sparkContext
    // plan-time partition count of the frame as it stands (for a bare
    // table read: the file-split count, 1 for the one-row-group
    // fixtures; for an already-shuffled/cached frame: its partitioning)
    val planned = df.rdd.getNumPartitions
    if (planned >= sc.defaultParallelism) df else df.repartition(key)
  }
}
