package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema-drift armor for the events table: the driver's testdata
  * generator has written `events.ts` with a different parquet encoding
  * in different rounds (TIMESTAMP(NANOS) → read as long under
  * nanosAsLong; timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ;
  * plain UTC-adjusted micros → TimestampType). Tables.events must
  * normalize all three to the same TimestampType instants so a testdata
  * regeneration can never silently break every ts-consuming query again
  * (the round-10 regression). */
class TablesSpec extends SparkSpecBase {
  import spark.implicits._

  // known instants, micro precision
  private val micros = Seq(1700000000000000L, 1700000123456789L, 1700009999000001L)

  private def writeEvents(dir: String)(build: => org.apache.spark.sql.DataFrame): String = {
    build.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_events_$tag").toString

  test("Tables.events normalizes all observed ts encodings to identical TimestampType instants") {
    val base = micros.toDF("us")

    // (a) nanos-as-long: TIMESTAMP(NANOS) parquet surfaces in Spark as a
    // long column under spark.sql.legacy.parquet.nanosAsLong — writing a
    // long ts reproduces exactly what Tables.events sees on read
    val nanosDir = writeEvents(tmp("nanos")) {
      base.select((col("us") * 1000L).as("ts"), col("us").as("event_id"))
    }
    // (b) timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ on read
    val ntzDir = writeEvents(tmp("ntz")) {
      base.select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("us").as("event_id"))
    }
    // (c) UTC-adjusted micros → TimestampType on read (pass-through)
    val ltzDir = writeEvents(tmp("ltz")) {
      base.select(timestamp_micros(col("us")).as("ts"), col("us").as("event_id"))
    }

    for (dir <- Seq(nanosDir, ntzDir, ltzDir)) {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
      val got = df.select(unix_micros(col("ts"))).as[Long].collect().sorted
      assert(got.toSeq == micros.sorted,
        s"$dir: unix_micros mismatch: ${got.toSeq} vs ${micros.sorted}")
    }
  }

  test("driver testdata events loads as TimestampType") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(max(unix_micros(col("ts")))).as[Long].head() > 0L)
  }
}
