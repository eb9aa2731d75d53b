package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Tables.events' ts-normalization contract (the r10 testdata
  * drift: `events.ts` physical type changed generations and 22
  * queries died at analysis): whatever the parquet stores, operators
  * see ts as a RAW ns-since-epoch LONG — and an unknown dtype fails
  * LOUDLY at load, never as per-query analysis errors.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def writeAndLoad(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("tables_events").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("timestamp[us] ts normalizes to the exact ns long") {
    // 2026-08-13T18:18:00.123456 UTC as a µs timestamp
    val micros = 1786731480123456L
    val loaded = writeAndLoad(
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    assert(loaded.schema("ts").dataType == org.apache.spark.sql.types.LongType,
      "operators must see ts as LONG regardless of the physical type")
    assert(loaded.select("ts").head.getLong(0) == micros * 1000L,
      "µs → ns widening must be exact")
  }

  test("long ts passes through untouched; ts-less frames load as-is") {
    val ns = 1786731480123456789L
    val loaded = writeAndLoad(Seq((1L, ns)).toDF("event_id", "ts"))
    assert(loaded.select("ts").head.getLong(0) == ns)
    val noTs = writeAndLoad(Seq((1L, "x")).toDF("event_id", "props"))
    assert(noTs.columns.toSeq == Seq("event_id", "props"))
  }

  test("an unsupported ts dtype fails loudly at load, not per-query") {
    val e = intercept[IllegalStateException] {
      writeAndLoad(Seq((1L, "2026-08-13")).toDF("event_id", "ts"))
    }
    assert(e.getMessage.contains("unsupported type"),
      s"the guard must name the drift: ${e.getMessage}")
  }
}
