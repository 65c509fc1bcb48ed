package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The vocabulary-broadcast cap (r15 verdict's one capacity cliff):
  * every serve join against a vocabulary-cardinality table (BPE apply
  * vocab, TF-IDF document frequencies, LM count tables) rides
  * [[graft.operators.CapGate]] — a forced broadcast under the 2²² row
  * cap, a planner-chosen shuffle equi-join past it. Both physical
  * shapes compute the identical join; this spec drives BOTH and pins
  * (a) the plan shape on each side of the cap and (b) result equality
  * on a BloomSpec-scale build side (4.3M distinct words — past the
  * default cap for real, not via an artificial override). */
class CapGateSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import graft.operators.CapGate

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("under the cap the gate broadcasts and the serve join is map-side") {
    val vocab = spark.range(1, 1001)
      .select(concat(lit("w"), col("id")).as("w"), (col("id") % 7 + 1).as("n_tok"))
    val gated = CapGate.gate(vocab)
    assert(gated.broadcasted && gated.rows == 1000L)
    val probe = spark.range(0, 5000)
      .select(concat(lit("w"), col("id") % 1500 + 1).as("w"))
    val plan = planOf(probe.join(gated.frame, Seq("w"), "left"))
    assert(plan.contains("BroadcastHashJoin"),
      s"under-cap gate must plan a broadcast join:\n$plan")
  }

  test("past the cap the gate omits the hint and the join degrades to a shuffle, not a death") {
    // small capRows override drives the FALLBACK SHAPE cheaply; the
    // result-equality drive below exercises the default cap for real
    val vocab = spark.range(1, 1001)
      .select(concat(lit("w"), col("id")).as("w"), (col("id") % 7 + 1).as("n_tok"))
    val gated = CapGate.gate(vocab, capRows = 100L)
    assert(!gated.broadcasted && gated.rows == 1000L)
    val probe = spark.range(0, 5000)
      .select(concat(lit("w"), col("id") % 1500 + 1).as("w"))
    // disable size-estimate auto-broadcast so the pin is about the
    // HINT being absent, not about this toy table being tiny
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planOf(probe.join(gated.frame, Seq("w"), "left"))
      assert(!plan.contains("BroadcastHashJoin"),
        s"past-cap gate must not force a broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"past-cap join must be a shuffle equi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  /** The r15 verdict's "done" bar: a synthetic vocabulary of 4.3M
    * DISTINCT words — genuinely past [[CapGate.BroadcastCapRows]] —
    * served through the t52 encode formula on both physical shapes,
    * with per-row and aggregate equality. Probe words alternate
    * in-vocab / out-of-vocab so the LEFT join's OOV fallback branch is
    * exercised on the shuffle path too. */
  test("4.3M-distinct-word vocabulary: shuffle fallback ≡ forced broadcast, row for row") {
    val n = CapGate.BroadcastCapRows + 100000L // 4.29M + 0.1M distinct words
    val vocab = spark.range(1, n + 1)
      .select(concat(lit("w"), col("id")).as("w"),
        (col("id") % 13 + 1).cast("long").as("n_tok"))
    val gated = CapGate.gate(vocab)
    assert(!gated.broadcasted, "4.3M rows must be past the default cap")
    assert(gated.rows == n)
    // 1M probe words over 2n ids: ids in (n, 2n] miss the vocab (OOV)
    val probe = spark.range(0, 1000000L)
      .select(col("id").as("doc_id"),
        concat(lit("w"), col("id") * 131L % (2L * n) + 1L).as("w"))
    def encode(v: DataFrame): Array[Long] = {
      val r = probe.join(v, Seq("w"), "left")
        .agg(count(lit(1)).cast("long"),
          sum(when(col("n_tok").isNull, 1L).otherwise(0L)).cast("long"),
          sum(coalesce(col("n_tok"), length(col("w")).cast("long"))).cast("long"),
          sum(col("doc_id") * coalesce(col("n_tok"), lit(0L))).cast("long"))
        .collect().head
      Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val viaShuffle = encode(gated.frame)
    val viaBroadcast = encode(CapGate.gate(vocab, capRows = n).frame)
    assert(viaShuffle.toSeq === viaBroadcast.toSeq,
      "the two physical shapes must compute the identical join")
    assert(viaShuffle(1) > 0L, "probe must exercise the OOV branch")
    assert(viaShuffle(1) < viaShuffle(0), "probe must also hit the vocab")
  }
}
