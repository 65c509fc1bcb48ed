package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-form identities for the TPC-H plan-class family: each query's
  * result must satisfy an algebraic relationship to an INDEPENDENTLY
  * computed aggregate of the base tables (different formulation, not a
  * replay of the query plan) — the class of check that catches a wrong
  * join type or a filter on the wrong side even when the DuckDB twin
  * has the same bug, because these identities come from the SEMANTICS,
  * not from any implementation. */
class AnalyticsInvariantSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q13: the count histogram conserves both customers and qualifying orders") {
    val rows = q("q13_customer_distribution").collect()
    val nCustomers = Tables.customer(spark, sfDir).count()
    val nQualOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      // only orders whose customer exists can be counted by the join
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(rows.map(_.getLong(1)).sum === nCustomers,
      "sum(custdist) must equal the customer count (outer join preserved everyone)")
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nQualOrders,
      "sum(c_count * custdist) must equal the non-urgent order count")
  }

  test("q4: counted orders are a subset of the quarter's orders") {
    val counted = q("q4_order_priority").collect().map(_.getLong(1)).sum
    val quarter = Tables.orders(spark, sfDir)
      .filter(to_date(col("o_orderdate")) >= to_date(lit("1997-01-01")) &&
        to_date(col("o_orderdate")) < to_date(lit("1997-04-01"))).count()
    assert(counted > 0, "the quarter must contain late orders on the fixture")
    assert(counted <= quarter, "EXISTS can keep at most every order once " +
      "(a duplicate here means the semi-join degenerated to inner)")
  }

  test("q11: every kept part clears 1.3x the independently computed mean part value") {
    val perPart = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_quantity")).cast("long")).as("v"))
    val Array(total, n) = perPart.agg(sum("v"), count(lit(1)))
      .collect()(0).toSeq.map(_.toString.toDouble).toArray
    val kept = q("q11_important_parts").collect()
    assert(kept.nonEmpty, "threshold must keep a non-trivial set on the fixture")
    val cutoff = 1.3 * total / n / 100.0 // display units
    kept.foreach { r =>
      assert(r.getDouble(1) > cutoff - 0.01,
        s"part ${r.getLong(0)} value ${r.getDouble(1)} below the 1.3x-mean cutoff $cutoff")
    }
  }

  test("q15: the winners' revenue equals the max of an independent per-supplier rollup") {
    val winners = q("q15_top_supplier").collect()
    assert(winners.nonEmpty)
    val indep = Tables.lineitem(spark, sfDir)
      .filter(to_date(col("l_shipdate")) >= to_date(lit("1997-10-01")) &&
        to_date(col("l_shipdate")) < to_date(lit("1998-01-01")))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        round((lit(1) - col("l_discount")) * 100).cast("long")).as("r"))
      .agg(max("r")).collect()(0).getLong(0)
    winners.foreach { r =>
      assert(math.abs(r.getDouble(2) - indep / 10000.0) < 0.005,
        s"winner ${r.getLong(0)} revenue ${r.getDouble(2)} != global max ${indep / 10000.0}")
    }
  }

  test("q16: no group can count more suppliers than exist outside the exclusion set") {
    val nEligible = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    val rows = q("q16_supplier_counts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= nEligible,
        s"group counts ${r.getLong(3)} suppliers but only $nEligible are eligible")
    }
  }

  test("q20: qualifying suppliers all sit in EUROPE") {
    val euro = Tables.load(spark, sfDir, "supplier")
      .join(Tables.load(spark, sfDir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val out = q("q20_excess_suppliers").collect().map(_.getLong(0))
    assert(out.forall(euro.contains), "a non-EUROPE supplier leaked through the semi-join")
  }

  test("q7 emits only the two nation-pair directions; q8 shares stay in [0, 100]") {
    val pairs = q("q7_volume_shipping").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))),
      s"unexpected nation pair in $pairs")
    val shares = q("q8_market_share").collect().map(_.getDouble(1))
    assert(shares.nonEmpty)
    assert(shares.forall(s => s >= 0.0 && s <= 100.0),
      s"market share out of range: ${shares.mkString(",")}")
  }

  test("s21: shards are balanced to within one document and partition the corpus") {
    val rows = q("s21_shuffled_shards").collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length === nDocs, "every document must land in exactly one shard")
    val sizes = rows.groupBy(_.getLong(1)).map(_._2.length)
    assert(sizes.max - sizes.min <= 1,
      s"round-robin shard sizes must differ by at most 1, got ${sizes.toSeq.sorted}")
    // positions within a shard are dense 0..size-1
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.sameElements(pos.indices.map(_.toLong)),
        s"shard $shard positions not dense: ${pos.take(5).mkString(",")}...")
    }
  }
}
