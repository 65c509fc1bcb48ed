package graft.sources

import graft.operators.GlobalOrder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-balanced training-shard sink — the OUTPUT side of a curation
  * pipeline: write the corpus as `nShards` parquet partitions whose
  * per-shard total weight (tokens, bytes) is near-equal, with a
  * deterministic, order-preserving doc→shard assignment.
  *
  * `repartition(nShards)` balances ROW COUNTS, which skews token totals
  * whenever document lengths skew (the usual case) — downstream
  * trainers then stall on the heaviest shard. Balancing by weight needs
  * each document's global running total, which is [[GlobalOrder
  * .withRunningTotal]]'s sharded prefix sum (no single-partition
  * exchange; BASELINE.md records its measured near-linear growth), so
  * the whole sink is: one bounded scalar aggregate (the corpus total),
  * one prefix-sum pass, one partitioned write. Shards are CONTIGUOUS
  * weight ranges, so any shard's token total deviates from the ideal
  * `total/nShards` by less than the single heaviest document — and the
  * assignment is a pure function of the input, byte-stable across
  * reruns (the property SinkSpec pins).
  */
object TrainingShards {

  /** Write `docs` into `root` as `shard=N` parquet partitions balanced
    * by `weight` in `sortCol` order. Returns the per-shard weight
    * target (ceil of total/nShards). */
  def write(docs: DataFrame, weight: Column, sortCol: Column, nShards: Int,
      root: String): Long = {
    require(nShards > 0, "nShards must be positive")
    val tot = docs.agg(coalesce(sum(weight.cast("long")), lit(0L))).first().getLong(0)
    val per = math.max(1L, (tot + nShards - 1) / nShards)
    GlobalOrder.withRunningTotal(docs, "_ts_off", weight, sortCol)
      .withColumn("shard", least(expr(s"_ts_off div $per"), lit(nShards - 1)))
      .drop("_ts_off")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    per
  }
}
