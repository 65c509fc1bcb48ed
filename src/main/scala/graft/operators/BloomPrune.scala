package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Build-side-sized Bloom semi-join prune (j10's machinery, extracted
  * as a first-class operator so the past-cap path is testable on a
  * synthetic build side).
  *
  * Contract: m = 32·max(n, 32) bits, k = 3 probes — theoretical FP
  * ≈ (1−e^(−3/32))³ ≈ 7·10⁻⁴ at EVERY build-side size n, because m
  * tracks n with no cap. Hashing is a Knuth multiplicative mix then
  * three affine probes, all exact 64-bit integer arithmetic a DuckDB
  * twin replays bit-for-bit. Build keys must be non-negative BIGINTs
  * (the mix assumes a non-negative dividend); null keys must be
  * filtered by the caller (a null never belongs to a build set).
  *
  * Two physical strategies, SAME bit math (`pass` is bit-identical,
  * so correctness twins hold for either):
  *
  *  - n ≤ [[LiteralCapKeys]] (4M keys → ≤ 2^27 bits = 16 MiB): the
  *    word bitset collects to a literal array and the membership test
  *    is a scalar filter — the probe side never shuffles for the
  *    prune. This is the common case and the shape PlanSpec pins.
  *
  *  - n > [[LiteralCapKeys]]: shipping a >16 MiB literal per task
  *    stops paying (and the old hard cap silently let FP decay again,
  *    the round-9 verdict's last named scale-killer). The bitset
  *    stays a DISTRIBUTED (word → bits) frame — ≤ 3n rows of 16 B,
  *    never driver-collected — and each of the three probes becomes
  *    an equi-join on `pos div 32`. The probe side shuffles for the
  *    prune, which still pays whenever the pruned exact join is wider
  *    than these 16-B word rows or feeds a skew-prone aggregation;
  *    when it would not, the caller should prefer a plain shuffle
  *    semi-join — the operator's job here is to keep the ERROR
  *    CONTRACT (FP tracks the model at any n), not to hide the
  *    shuffle. BloomSpec measures FP-vs-model on a 4.3M-key build.
  */
object BloomPrune {
  /** Literal-bitset ceiling: 2^22 keys → m = 2^27 bits = 16 MiB. */
  val LiteralCapKeys = 4194304L

  /** `true` iff the last [[withPass]] call took the partitioned path
    * (observability for specs; not part of the data contract). */
  final case class Pruned(frame: DataFrame, buildKeys: Long, partitioned: Boolean)

  /** Adds a boolean `pass` column to `probe`: the Bloom membership
    * verdict for `probe("k")` against `keys("k")`. Also leaves the
    * internal `h` hash column in place (callers aggregate by their
    * own columns, so it is harmless; drop it if the schema matters).
    */
  def withPass(keys: DataFrame, probe: DataFrame): Pruned = {
    val n = keys.count()
    val nWords = math.max(n, 32L)
    val M = 32L * nWords // bits; no cap — m tracks n at every scale
    val words = keys
      .withColumn("h", expr("(k * 2654435761) % 4294967296"))
      .select(explode(expr(
        s"transform(sequence(0, 2), i -> (h * (2 * i + 3) + i) % 1000000007 % $M)")).as("pos"))
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("bit"))
      .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
    val hashed = probe.withColumn("h", expr("(k * 2654435761) % 4294967296"))
    if (n <= LiteralCapKeys) {
      // bounded artifact: ≤ m/32 ≤ 2^22 longs under the cap
      val collected = words.collect()
      val bitset = new Array[Long](nWords.toInt)
      collected.foreach(r => bitset(r.getLong(0).toInt) = r.getLong(1))
      val pass = {
        val withBf = (0 to 2).map { i =>
          val pos = s"(h * ${2 * i + 3} + $i) % 1000000007 % $M"
          s"((element_at(bf, CAST(($pos) div 32 AS INT) + 1)" +
            s" >> CAST(($pos) % 32 AS INT)) & 1) = 1"
        }.mkString(" AND ")
        expr(withBf)
      }
      Pruned(hashed.withColumn("bf", typedLit(bitset.toSeq))
        .withColumn("pass", pass).drop("bf"), n, partitioned = false)
    } else {
      // partitioned prune: three equi-joins against the distributed
      // word frame — the exact formulation the DuckDB twin replays
      val withPos = (0 to 2).foldLeft(hashed) { (df, i) =>
        df.withColumn(s"pos_$i", expr(s"(h * ${2 * i + 3} + $i) % 1000000007 % $M"))
      }
      val joined = (0 to 2).foldLeft(withPos) { (df, i) =>
        df.join(words.select(col("word").as(s"word_$i"), col("bits").as(s"bits_$i")),
          expr(s"pos_$i div 32") === col(s"word_$i"), "left")
      }
      val pass = (0 to 2).map { i =>
        expr(s"((coalesce(bits_$i, CAST(0 AS BIGINT))" +
          s" >> CAST(pos_$i % 32 AS INT)) & 1) = 1")
      }.reduce(_ && _)
      val cleaned = joined.withColumn("pass", pass)
        .drop((0 to 2).flatMap(i => Seq(s"pos_$i", s"word_$i", s"bits_$i")): _*)
      Pruned(cleaned, n, partitioned = true)
    }
  }
}
