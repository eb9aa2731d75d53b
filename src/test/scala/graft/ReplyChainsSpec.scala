package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins operators.ReplyChains: pointer-jumping thread resolution
  * (planted 3-deep thread), dangling-reply and cycle behavior,
  * per-thread rollup, and the forwarded_from top-N consumer.
  */
class ReplyChainsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // chat 1: a 3-deep thread 10←11←12←13, a lone root 20, a reply 31
  //         to the unexported message 30 (dangling), and 40↔41 (cycle)
  // chat 2: same ids as chat 1's thread — resolution must stay
  //         per-chat (no cross-chat id collisions)
  private lazy val messages = Seq(
    (1L, 10L, Option.empty[Long], 100L, Option.empty[String], "2024-01-01 10:00:00"),
    (1L, 11L, Some(10L), 101L, None, "2024-01-01 10:01:00"),
    (1L, 12L, Some(11L), 102L, None, "2024-01-01 10:02:00"),
    (1L, 13L, Some(12L), 100L, None, "2024-01-01 10:03:00"),
    (1L, 20L, None, 103L, Some("chanA"), "2024-01-01 11:00:00"),
    (1L, 31L, Some(30L), 104L, Some("chanA"), "2024-01-01 12:00:00"),
    (1L, 40L, Some(41L), 105L, Some("chanB"), "2024-01-01 13:00:00"),
    (1L, 41L, Some(40L), 105L, None, "2024-01-01 13:01:00"),
    (2L, 11L, None, 200L, None, "2024-01-02 10:00:00"),
    (2L, 12L, Some(11L), 201L, None, "2024-01-02 10:01:00")
  ).toDF("chat_id", "message_id", "reply_to_message_id", "from_id", "forwarded_from", "d")
    .withColumn("date", to_timestamp(col("d"))).drop("d")

  test("planted 3-deep thread resolves to its root with exact depths") {
    val t = operators.ReplyChains.threads(messages)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(t((1L, 10L)) == (10L, 0L))
    assert(t((1L, 11L)) == (10L, 1L))
    assert(t((1L, 12L)) == (10L, 2L))
    assert(t((1L, 13L)) == (10L, 3L), "the planted 3-deep leaf must resolve root=10, depth=3")
    assert(t((1L, 20L)) == (20L, 0L))
    // chat 2 reuses ids 11/12 — per-chat resolution
    assert(t((2L, 11L)) == (11L, 0L) && t((2L, 12L)) == (11L, 1L))
  }

  test("dangling replies root at the missing id; cycles terminate bounded") {
    val t = operators.ReplyChains.threads(messages)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(t((1L, 31L)) == (30L, 1L), "a reply to a deleted message roots at the dangling id")
    // the 40<->41 cycle must terminate with bounded depth (no hang,
    // no overflow); exact values are arbitrary but deterministic
    val (r40, d40) = t((1L, 40L)); val (r41, d41) = t((1L, 41L))
    assert(Set(r40, r41).subsetOf(Set(40L, 41L)) && d40 <= 16 && d41 <= 16)
    val t2 = operators.ReplyChains.threads(messages)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(t2((1L, 40L)) == (r40, d40) && t2((1L, 41L)) == (r41, d41), "cycle resolution is deterministic")
  }

  test("thread rollup: size, max depth, participants, span") {
    val s = operators.ReplyChains.threadStats(messages)
      .filter(col("chat_id") === 1 && col("root_id") === 10)
      .collect()
    assert(s.length == 1)
    val r = s.head
    assert(r.getLong(2) == 4, "thread_size: 10,11,12,13")
    assert(r.getLong(3) == 3, "max_depth")
    assert(r.getLong(4) == 3, "participants 100,101,102 (100 posts twice)")
  }

  test("topForwardSources counts and ranks per chat") {
    val f = operators.ReplyChains.topForwardSources(messages)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(f.toSeq == Seq((1L, "chanA", 2L, 1), (1L, "chanB", 1L, 2)))
  }

  // --- eventThreadCache bounds + freshness (VERDICT/ADVICE r07) ---

  private def writeEvents(dir: String, ks: Seq[Int]): Unit =
    ks.zipWithIndex.map { case (k, i) => (i.toLong + 1L, s"""{"k":$k}""") }
      .toDF("event_id", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("resolving a second dir unpersists and drops the first dir's frame") {
    val a = java.nio.file.Files.createTempDirectory("rc_cache_a").toString
    val b = java.nio.file.Files.createTempDirectory("rc_cache_b").toString
    try {
      writeEvents(a, Seq(0, 1, 2, 3, 0, 5))
      writeEvents(b, Seq(0, 0, 1, 1, 2, 2))
      operators.ReplyChains.eventThreads(spark, a).collect()
      val rddA = operators.ReplyChains.cachedEventRdd(spark, a)
      assert(rddA.isDefined)
      assert(rddA.get.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "the converged state must be persisted while live")
      operators.ReplyChains.eventThreads(spark, b).collect()
      assert(operators.ReplyChains.cachedEventRdd(spark, a).isEmpty,
        "one live frame per session: dir A's entry must be evicted")
      assert(rddA.get.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "dir A's state must be UNPERSISTED after dir B's resolution")
      operators.ReplyChains.clearEventThreadCache(spark)
      assert(operators.ReplyChains.cachedEventRdd(spark, b).isEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(a)).deleteRecursively()
      new Directory(new java.io.File(b)).deleteRecursively()
      operators.ReplyChains.clearEventThreadCache(spark)
    }
  }

  test("re-registering the events source busts the cache (no stale resolutions)") {
    val d = java.nio.file.Files.createTempDirectory("rc_cache_fresh").toString
    try {
      // k % 4 != 0 => event replies to (event_id - 1 - k % 8), so k=1
      // chains each event to event_id - 2 (two interleaved chains);
      // k=0 makes every event a root
      writeEvents(d, Seq(0, 1, 1, 1))
      val before = operators.ReplyChains.eventThreads(spark, d).collect()
      assert(before.count(r => r.getLong(0) != r.getLong(1)) == 2,
        "events 3 and 4 chain to roots 1 and 2")
      val stale = operators.ReplyChains.cachedEventRdd(spark, d).get
      val roots = Seq((1L, """{"k":0}"""), (2L, """{"k":0}"""), (3L, """{"k":0}"""), (4L, """{"k":0}"""))
        .toDF("event_id", "props")
      Tables.registerOverride(spark, d, "events", roots)
      val after = operators.ReplyChains.eventThreads(spark, d).collect()
      assert(after.forall(r => r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L),
        "after the override every event is its own root — a stale cache would still chain them")
      assert(stale.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "the stale state must be unpersisted on invalidation")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(d)).deleteRecursively()
      operators.ReplyChains.clearEventThreadCache(spark)
    }
  }
}
