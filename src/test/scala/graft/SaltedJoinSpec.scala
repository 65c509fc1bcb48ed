package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join ≡ plain join, with the salt actually spreading. */
class SaltedJoinSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sfDir}

  test("salted join equals the plain join on a skewed key distribution") {
    // Skew: fold most lineitem rows onto one hot part key.
    val big = Tables.lineitem(spark, sfDir)
      .select(
        when(col("l_orderkey") % 10 =!= 0, lit(42L)).otherwise(col("l_partkey"))
          .as("k"),
        col("l_extendedprice").as("v"))
    val small = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = big.join(small, Seq("k"), "inner")
      .agg(count(lit(1)), round(sum("v"), 2)).collect().head.toSeq
    val salted = SaltedJoin.join(big, small, "k", saltFactor = 8)
      .agg(count(lit(1)), round(sum("v"), 2)).collect().head.toSeq
    assert(salted === plain)
  }

  test("the hot key spreads across salt shards") {
    val big = Tables.lineitem(spark, sfDir)
      .select(lit(42L).as("k"), col("l_extendedprice").as("v"))
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
    val shards = salted.groupBy("_salt").count().collect()
    assert(shards.length > 4, "expected the hot key to use most of the 8 shards")
  }

  test("right/full-outer join types are rejected (salt would duplicate unmatched small rows)") {
    val big = Tables.lineitem(spark, sfDir).limit(10)
      .select(col("l_partkey").as("k"))
    val small = Tables.part(spark, sfDir).limit(10)
      .select(col("p_partkey").as("k"))
    Seq("right", "right_outer", "full", "full_outer", "outer").foreach { jt =>
      val e = intercept[IllegalArgumentException](SaltedJoin.join(big, small, "k", 4, jt))
      assert(e.getMessage.contains("SaltedJoin"), s"wrong error for $jt")
    }
  }

  test("left join keeps unmatched big-side rows exactly once") {
    val big = Tables.lineitem(spark, sfDir).limit(500)
      .select(col("l_partkey").as("k"), col("l_extendedprice").as("v"))
    val small = Tables.part(spark, sfDir).filter(col("p_partkey") % 2 === 0)
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = big.join(small, Seq("k"), "left").count()
    val salted = SaltedJoin.join(big, small, "k", 4, "left").count()
    assert(salted === plain)
  }
}
