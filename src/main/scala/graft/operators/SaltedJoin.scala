package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (big) side's key with a
  * deterministic shard in [0, saltFactor) and replicate the small side
  * across every shard, so one hot key spreads over `saltFactor`
  * reducers instead of one straggler task.
  *
  * This is the manual fallback for when AQE's skew-join split cannot
  * help (e.g. the skew is in a single key of a shuffle-hash join, or
  * AQE is disabled). Result equality with the plain join is exact —
  * salting only refines the partitioning key, never the join
  * predicate. Use when key-frequency stats show a hot key; prefer AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) first.
  *
  * The salt is derived from stable row content (a hash of the big
  * side's whole row), NOT from rand(): deterministic across retries, so
  * task re-execution cannot duplicate or lose rows.
  *
  * Supported join types: inner, left/left_outer, left_semi, left_anti
  * (big side on the left). Right/full-outer are rejected: the small
  * side is replicated once per salt shard, so an UNMATCHED small-side
  * row would surface `saltFactor` duplicate rows.
  */
object SaltedJoin {

  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi",
      "leftanti", "left_anti")

  def join(
      big: DataFrame, small: DataFrame,
      key: String, saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(SupportedJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"SaltedJoin supports inner/left/left_semi/left_anti, not '$joinType': " +
        "replicating the small side breaks right/full-outer semantics")
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
