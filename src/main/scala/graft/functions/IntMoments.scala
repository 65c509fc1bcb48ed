package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated integer moments: count, Σx, Σx² — all exact longs. */
case class Moments(n: Long, sum: Long, sumSq: Long)

/** Custom typed Aggregator (the §2.10 user-defined AGGREGATE surface,
  * complementing the scalar GraftSimilarity expression): integer moment
  * sums for exact distributional statistics. Variance in floating point
  * is engine-dependent (Welford vs naive accumulate differ in rounding);
  * over integer inputs the moment sums are EXACT, so
  * var = (n·Σx² − (Σx)²) / n² reduces to one final double division both
  * engines perform identically — which is what lets `t12_moments` carry
  * a hash-compared DuckDB oracle. Merge is associative/commutative
  * (partial aggregation friendly: map-side combine then one reduce). */
object IntMomentsAggregator extends Aggregator[Long, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L)
  override def reduce(b: Moments, x: Long): Moments =
    Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
  override def finish(r: Moments): Moments = r
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
