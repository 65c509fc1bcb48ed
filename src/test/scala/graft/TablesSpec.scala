package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.events]]' ts-encoding dispatch: the fixture generator
  * has shipped events.parquet as TIMESTAMP(NANOS)-read-as-BIGINT in one
  * round and timestamp[us] the next, and a real deployment sees
  * pandas/pyarrow (micros), Hive (micros LTZ), and raw epoch-nanos
  * BIGINT columns — all three must load to the same instants. */
class TablesSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val micros = Seq(
    (1L, 1700000000000000L, 7L, "click", 1.5),
    (2L, 1700000123456789L, 8L, "view", 2.5))

  private def writeAndLoad(dir: String, tsCol: org.apache.spark.sql.Column,
      cast: DataType): Seq[(Long, java.sql.Timestamp)] = {
    micros.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), tsCol.cast(cast).as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toSeq.sortBy(_._1)
  }

  test("events ts dispatch: BIGINT nanos, timestamp_ntz, and timestamp load identically") {
    val base = java.nio.file.Files.createTempDirectory("graft_events_enc").toString
    val fromNanos = writeAndLoad(s"$base/nanos", col("us") * 1000L, LongType)
    val fromNtz = writeAndLoad(s"$base/ntz", timestamp_micros(col("us")), TimestampNTZType)
    val fromLtz = writeAndLoad(s"$base/ltz", timestamp_micros(col("us")), TimestampType)
    val expected = micros.map { case (id, us, _, _, _) =>
      (id, java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(us,
        java.time.temporal.ChronoUnit.MICROS)))
    }
    assert(fromNanos === expected)
    assert(fromNtz === expected)
    assert(fromLtz === expected)
    // all three branches surface the same engine-facing type
    for (d <- Seq("nanos", "ntz", "ltz"))
      assert(Tables.events(spark, s"$base/$d").schema("ts").dataType === TimestampType)
  }

  test("events ts dispatch rejects an unreadable encoding loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft_events_bad").toString
    micros.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), col("us").cast(StringType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, base))
    assert(e.getMessage.contains("events.ts"))
  }
}
