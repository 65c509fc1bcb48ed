package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the payload of the LATEST right row
  * with `rightTime` ≤ `leftTime` in the same key partition (the
  * time-series "most recent fact as of this moment" lookup).
  *
  * Scale design — deliberately NOT a range join: a join on
  * `r.t <= l.t` explodes to every qualifying pair before an argmax
  * prunes it (quadratic in events-per-key). Instead both sides union
  * into one frame, sort once per key on (time, side, tiebreak), and a
  * running `last(payload, ignoreNulls)` carries the most recent right
  * payload forward into each left row: ONE hash shuffle + ONE sort,
  * linear in the data, independent of match distances — the standard
  * distributed as-of formulation. Right rows order before left rows at
  * equal timestamps, so a right fact AT the left row's time matches
  * (inclusive as-of, DuckDB `ASOF JOIN`'s `>=` semantics — the gated
  * twin `e7_asof_join` hash-checks against exactly that).
  *
  * `rightTiebreak` makes the winner deterministic when two right rows
  * share (key, time) — the greater tiebreak wins.
  */
object AsOfJoin {

  def join(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: Column, rightTime: Column,
      payload: Seq[String], rightTiebreak: Column,
      outCol: String = "asof"): DataFrame = {
    val payStruct = struct(payload.map(right(_)): _*)
    val payType = right.select(payStruct.as("_pay")).schema("_pay").dataType
    val carried = left.columns.filterNot(on.contains)
    val l = left.select(
      on.map(col) ++ carried.map(col) ++ Seq(
        leftTime.as("_t"), lit(1).as("_side"), lit(0L).as("_tb"),
        lit(null).cast(payType).as("_pay")): _*)
    val r = right.select(
      on.map(col) ++ carried.map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        rightTime.as("_t"), lit(0).as("_side"), rightTiebreak.cast("long").as("_tb"),
        payStruct.as("_pay")): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last("_pay", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_t", "_side", "_tb", "_pay")
  }
}
