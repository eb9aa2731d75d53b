package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

/** Pins Incremental.embedNew — the composed steady-state loop the
  * reference runs nightly (encode only messages lacking embeddings,
  * append to the store, re-derive affected sessions):
  *  - result ≡ encoding EVERYTHING from scratch (same ids, same
  *    vectors — the stub encoder is deterministic, so equality is
  *    exact);
  *  - ONLY the delta passes through the encoder (row count via
  *    accumulator — the reference's whole point: model cost tracks
  *    new data, not the corpus);
  *  - stored rows pass through byte-identical, never re-encoded;
  *  - composes with Sessions.resessionizeDirty: after an append,
  *    dirty-only resessionization equals the full recompute.
  */
class EmbedNewSpec extends AnyFunSuite {
  import TestSpark._
  import operators.{Incremental, Sessions, TextEncoder}
  import spark.implicits._

  private def docs = Tables.documents(spark, dir).select("doc_id", "text")

  test("embedNew == full encode; only the delta is encoded") {
    // store = encodings of the first 60% of docs
    val old = docs.filter(col("doc_id") % 5 < 3)
    val store = TextEncoder.encode(spark, old.as[TextEncoder.TextRow])
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val encodedRows: LongAccumulator = spark.sparkContext.longAccumulator("rows")
    val out = Incremental.embedNew(spark, docs, store, onBatch = encodedRows.add(_)).cache()
    val full = TextEncoder.encode(spark, docs.as[TextEncoder.TextRow])
      .select(col("doc_id").as("vec_id"), col("embedding"))
    assert(out.count() == full.count())
    // exact equality of (id, vector): deterministic stub ⇒ anti-joins
    // empty both ways
    assert(out.exceptAll(full).count() == 0 && full.exceptAll(out).count() == 0,
      "incremental union must equal the from-scratch encode exactly")
    val expectedDelta = docs.count() - old.count()
    assert(encodedRows.value == expectedDelta,
      s"encoder saw ${encodedRows.value} rows, delta is $expectedDelta — old rows must not re-encode")
    out.unpersist()
  }

  test("append + resessionizeDirty == full recompute (the session-side leg)") {
    val ev = Tables.events(spark, dir)
    // split: everything except user 7's last-arriving half is "stored"
    val newEvents = ev.filter(col("user_id") === 7 && col("event_id") % 2 === 0)
    val oldEvents = ev.exceptAll(newEvents)
    val stored = Sessions.sessionizedOn(oldEvents)
      .select("event_id", "user_id", "session_id")
    val dirty = newEvents.select("user_id").distinct()
    val incremental = Sessions.resessionizeDirty(ev, stored, dirty)
      .select("event_id", "user_id", "session_id")
    val full = Sessions.temporalSessions(spark, dir)
      .select("event_id", "user_id", "session_id")
    assert(incremental.exceptAll(full).count() == 0 && full.exceptAll(incremental).count() == 0,
      "dirty-only resessionization after the append must equal the full recompute")
  }
}
