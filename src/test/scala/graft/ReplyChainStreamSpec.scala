package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming thread resolution must, across micro-batch boundaries,
  * equal the BATCH pointer-jumping operator on the union — a reply
  * arriving in batch 3 to a root from batch 1 resolves through state.
  */
class ReplyChainStreamSpec extends AnyFunSuite {
  import TestSpark._
  import streaming.ReplyChainStream._

  test("cross-batch chains == batch threads on the union; dangling parents root") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Msg]
    val q = resolve(spark, stream.toDS())
      .writeStream.format("memory").queryName("chains_out").outputMode("append").start()
    // batch 1: root + first reply (chat 1); unrelated root in chat 2
    stream.addData(Msg(1, 10, None), Msg(1, 11, Some(10)), Msg(2, 11, None))
    q.processAllAvailable()
    // batch 2: deepens chat 1's thread; chat 2 replies to chat 1's id
    // (must stay per-chat); a dangling reply
    stream.addData(Msg(1, 12, Some(11)), Msg(2, 12, Some(11)), Msg(1, 31, Some(30)))
    q.processAllAvailable()
    // batch 3: a late deep reply to the batch-1/2 chain
    stream.addData(Msg(1, 13, Some(12)))
    q.processAllAvailable()
    val got = spark.table("chains_out").as[ThreadOut].collect()
      .map(t => (t.chat_id, t.message_id) -> (t.root_id, t.depth)).toMap
    q.stop()
    assert(got((1L, 10L)) == (10L, 0L))
    assert(got((1L, 11L)) == (10L, 1L))
    assert(got((1L, 12L)) == (10L, 2L))
    assert(got((1L, 13L)) == (10L, 3L), "a batch-3 reply must resolve through batch-1/2 state")
    assert(got((2L, 12L)) == (11L, 1L), "chat 2's id-11 is its own root — no cross-chat leakage")
    assert(got((1L, 31L)) == (30L, 1L), "dangling parent roots at the missing id")
    // equivalence with the batch operator on the union (in-order arrivals)
    val union = Seq(
      (1L, 10L, Option.empty[Long]), (1L, 11L, Some(10L)), (2L, 11L, Option.empty[Long]),
      (1L, 12L, Some(11L)), (2L, 12L, Some(11L)), (1L, 31L, Some(30L)), (1L, 13L, Some(12L)))
      .toDF("chat_id", "message_id", "reply_to_message_id")
    val batch = operators.ReplyChains.threads(union)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == batch, "stream state across batches must equal batch pointer jumping")
  }

  test("root-compressed state plateaus on a single-thread firehose and keeps roots resolvable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Msg]
    val q = resolve(spark, stream.toDS(), maxRecent = 8)
      .writeStream.format("memory").queryName("chains_rc").outputMode("append").start()
    // one long-lived chat: message i replies to i-1 (a single thread)
    (0L until 60L).grouped(20).foreach { ids =>
      stream.addData(ids.map(i => Msg(1, i, if (i == 0) None else Some(i - 1))): _*)
      q.processAllAvailable()
    }
    // a late reply to the ROOT (always kept) resolves exactly; a late
    // reply to an evicted mid-chain message degrades to dangling-root
    stream.addData(Msg(1, 100, Some(0)), Msg(1, 101, Some(30)))
    q.processAllAvailable()
    val got = spark.table("chains_rc").as[ThreadOut].collect()
      .map(t => t.message_id -> (t.root_id, t.depth)).toMap
    q.stop()
    assert(got(59L) == (0L, 59L), "the chronological chain resolves exactly under compression")
    assert(got(100L) == (0L, 1L), "roots survive compression forever")
    assert(got(101L) == (30L, 1L), "a reply to an evicted mid-chain id roots at the dangling parent")

    // the plateau law, asserted directly on the compression kernel:
    // a 10k-message single-thread state keeps 1 root + maxRecent
    val big = (0L until 10000L).map(i => i -> (0L, i)).toMap + (0L -> (0L, 0L))
    val c = compress(big, maxRecent = 8)
    assert(c.size == 9, s"state must plateau at roots + maxRecent, got ${c.size}")
    assert(c.contains(0L) && (9992L until 10000L).forall(c.contains))
  }
}
