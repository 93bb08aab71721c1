package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType,
  LongType, TimestampNTZType, TimestampType}

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
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").exists(),
      "driver testdata not present on this machine")
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(max(unix_micros(col("ts")))).as[Long].head() > 0L)
  }

  test("Tables.embeddings normalizes a list<double>/int32 regeneration to array<float>/long") {
    val dir = tmp("emb")
    // the drifted encoding: double vector elements, int ids/labels
    Seq((0, Seq(1.25d, -2.5d, 0.5d), 1), (1, Seq(0.0d, 3.5d, -1.75d), 2))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id").cast(IntegerType).as("vec_id"),
        col("embedding"), col("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType == LongType)
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType)
    // the values above are float-exact, so the cast loses nothing and the
    // vector kernels resolve and compute on the normalized column
    val dot = df.filter(col("vec_id") === 0L)
      .select(graft.expr.VectorExprs.dot(col("embedding"), col("embedding")))
      .as[Double].head()
    assert(math.abs(dot - (1.25 * 1.25 + 2.5 * 2.5 + 0.5 * 0.5)) < 1e-9)
  }

  test("Tables.documents normalizes int32 id/length columns to long") {
    val dir = tmp("docs")
    Seq((7, "hello world", "en", "web", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast(IntegerType).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast(IntegerType).as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.select(col("n_chars")).as[Long].head() == 11L)
  }

  test("canonical encodings load with no extra cast projection (normalize is identity)") {
    assume(new java.io.File("/root/testdata/sf0.001/embeddings.parquet").exists(),
      "driver testdata not present on this machine")
    for (t <- Seq("documents", "embeddings")) {
      val armored = t match {
        case "documents" => Tables.documents(spark, "/root/testdata/sf0.001")
        case _           => Tables.embeddings(spark, "/root/testdata/sf0.001")
      }
      // identity means the loader returns the bare relation — any cast
      // would surface as a Project above the scan
      assert(!armored.queryExecution.analyzed.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Project],
        s"$t: canonical load must not gain a projection node:\n" +
          armored.queryExecution.analyzed)
    }
  }
}
