package graft

import graft.sources.SessionStore
import graft.sources.SessionStore.Session
import org.scalatest.funsuite.AnyFunSuite

/** Pins SessionStore to the reference SessionManager's row lifecycle
  * (session_manager.py:47-160): save is INSERT OR REPLACE (created_at
  * resets with the row), get+touch mirror the read/update halves of
  * get_session, list orders by last_used DESC, and persistence
  * survives the crash windows of the two-rename swap.
  */
class SessionStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private def byPhone(s: org.apache.spark.sql.Dataset[Session]) =
    s.collect().map(x => x.phone -> x).toMap

  test("save inserts; re-save REPLACES the whole row, resetting created_at") {
    val s0 = SessionStore.empty(spark)
    val s1 = SessionStore.save(s0, "+111", "blobA", nowMs = 1000L)
    val s2 = SessionStore.save(s1, "+222", "blobB", nowMs = 2000L)
    assert(byPhone(s2) == Map(
      "+111" -> Session("+111", "blobA", 1000L, 1000L),
      "+222" -> Session("+222", "blobB", 2000L, 2000L)))
    // the reference's INSERT OR REPLACE is delete+insert: created_at
    // re-acquires its CURRENT_TIMESTAMP default on replace
    val s3 = SessionStore.save(s2, "+111", "blobA2", nowMs = 5000L)
    assert(byPhone(s3)("+111") == Session("+111", "blobA2", 5000L, 5000L))
    assert(byPhone(s3)("+222") == Session("+222", "blobB", 2000L, 2000L))
  }

  test("get returns the stored string; touch bumps last_used only; miss is a no-op") {
    val s = SessionStore.save(
      SessionStore.save(SessionStore.empty(spark), "+111", "blobA", 1000L),
      "+222", "blobB", 2000L)
    assert(SessionStore.get(s, "+111").contains("blobA"))
    assert(SessionStore.get(s, "+999").isEmpty)
    val bumped = SessionStore.touch(s, "+111", nowMs = 9000L)
    assert(byPhone(bumped)("+111") == Session("+111", "blobA", 1000L, 9000L),
      "touch must preserve created_at and the data")
    assert(byPhone(bumped)("+222") == Session("+222", "blobB", 2000L, 2000L))
    assert(byPhone(SessionStore.touch(s, "+999", 9000L)) == byPhone(s),
      "touching a missing phone matches the reference's zero-row UPDATE")
  }

  test("delete removes exactly the keyed row; list orders by last_used DESC") {
    val s = SessionStore.touch(
      SessionStore.save(
        SessionStore.save(
          SessionStore.save(SessionStore.empty(spark), "+111", "a", 1000L),
          "+222", "b", 2000L),
        "+333", "c", 3000L),
      "+111", 8000L)
    assert(byPhone(SessionStore.delete(s, "+222")).keySet == Set("+111", "+333"))
    val listed = SessionStore.list(s).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(listed.toSeq == Seq(
      ("+111", 1000L, 8000L), ("+333", 3000L, 3000L), ("+222", 2000L, 2000L)),
      s"list must be last_used DESC: ${listed.toSeq}")
  }

  test("expire drops sessions idle past the cutoff") {
    val s = SessionStore.save(
      SessionStore.save(SessionStore.empty(spark), "+111", "a", 1000L),
      "+222", "b", 5000L)
    assert(byPhone(SessionStore.expire(s, cutoffMs = 2000L)).keySet == Set("+222"))
  }

  test("persist/load round-trips; a crash between renames heals on the next load") {
    val root = java.nio.file.Files.createTempDirectory("graft_sessions").toString
    try {
      val s = SessionStore.save(
        SessionStore.save(SessionStore.empty(spark), "+111", "a", 1000L),
        "+222", "b", 2000L)
      SessionStore.persist(s, root)
      assert(byPhone(SessionStore.load(spark, root)) == byPhone(s))
      // second persist over a live store (the parking path)
      val s2 = SessionStore.save(s, "+333", "c", 3000L)
      SessionStore.persist(s2, root)
      assert(byPhone(SessionStore.load(spark, root)) == byPhone(s2))
      // simulate the between-renames crash: live gone, __old parked
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.rename(new org.apache.hadoop.fs.Path(s"$root/sessions"),
        new org.apache.hadoop.fs.Path(s"$root/sessions__old")))
      assert(byPhone(SessionStore.load(spark, root)) == byPhone(s2),
        "load must heal a parked store")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
