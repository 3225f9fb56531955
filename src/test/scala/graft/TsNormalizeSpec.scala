package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.normalizeTs` must absorb every physical `ts` type the
  * driver's generator has emitted across data generations — epoch-nanos
  * long (parquet TIMESTAMP(NANOS) read under nanosAsLong, rounds ≤6)
  * and timestamp[us] with isAdjustedToUTC=false (read as
  * TIMESTAMP_NTZ, rounds ≥7) — and yield the identical session-zone
  * microsecond TimestampType either way. Round 7's driver artifact
  * recorded 21 analysis errors ("(ts div 1000)" on a timestamp) plus 10
  * streaming row mismatches (timestamps compressed 1000×, collapsing
  * thousands of windows into ~10) precisely because the loader assumed
  * one fixed generation; this spec pins the adaptive contract.
  */
class TsNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one instant, three physical encodings
  private val micros = 1700000123456789L // 2023-11-14T22:15:23.456789Z

  test("long nanos input → TimestampType at the same instant") {
    val df = Seq(micros * 1000L).toDF("ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("TIMESTAMP_NTZ input → TimestampType at the same micros (UTC session)") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("TimestampType input passes through unchanged") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("unsupported ts type is rejected loudly, not silently mis-scaled") {
    val df = Seq("2023-01-01").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("unsupported"))
  }

  test("Tables.events loads TimestampType with a non-degenerate time spread") {
    val batch = Tables(spark, "/root/testdata/sf0.001").events
    assert(batch.schema("ts").dataType == TimestampType)
    // the current on-disk generation must load with non-degenerate time
    // spread: the round-7 failure mode (micros read as millis) collapsed
    // the whole table into a handful of hour windows
    val hours = batch
      .select(countDistinct(date_trunc("hour", col("ts")))).head.getLong(0)
    assert(hours > 100, s"suspiciously few distinct event hours: $hours")
  }

  test("legacy TIMESTAMP(NANOS) parquet loads end-to-end through nanosAsLong + normalizeTs") {
    // a REAL nanos-physical file (committed fixture, written by
    // pyarrow — Spark cannot write this type), pinning the rounds-≤6
    // data generation's full load path: legacy conf reads nanos as
    // long, normalizeTs divides to micros. Without this fixture the
    // legacy branch would only ever be unit-tested on synthetic longs.
    val path = getClass.getResource("/events_nanos_legacy.parquet").getPath
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    assert(raw.schema("ts").dataType == LongType,
      "nanosAsLong must surface TIMESTAMP(NANOS) as long")
    val out = Tables.normalizeTs(raw).orderBy("event_id")
    assert(out.schema("ts").dataType == TimestampType)
    val got = out.select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1700000123456789L, 1500000000000001L,
      1800000999999999L))
  }

  test("normalizeTs round-trips a Spark-written parquet copy (staging path)") {
    // ScaleProbe stages replicated events by re-writing with Spark; the
    // staged files must re-load as plain TimestampType with no drift
    val dir = Files.createTempDirectory("graft-tsnorm").toFile.getAbsolutePath
    val src = Tables(spark, "/root/testdata/sf0.001").events
      .select("event_id", "ts").limit(100)
    src.write.mode("overwrite").parquet(dir)
    val back = Tables.normalizeTs(spark.read.parquet(dir))
    assert(back.schema("ts").dataType == TimestampType)
    val a = src.select(sum(unix_micros(col("ts")))).head.getLong(0)
    val b = back.select(sum(unix_micros(col("ts")))).head.getLong(0)
    assert(a == b)
  }
}
