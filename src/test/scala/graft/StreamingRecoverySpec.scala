package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart recovery for the ENGINE-MANAGED session state
  * (VERDICT r15 item 5): GraftSpec pins recovery for the hand-rolled
  * flatMapGroupsWithState sessionizer; this spec pins the same
  * contract for q80d's native `session_window` path, whose state
  * lives in SessionWindowStateStore exec nodes the engine manages.
  * The query is killed on a committed checkpoint with a session OPEN
  * across the restart, arrivals land while it is down, and the
  * restarted incarnation must merge them into the recovered session —
  * output ≡ the batch session_window over the full feed. Run on both
  * the default state backend and RocksDB (the production provider the
  * q80c/q83b/q85b driver rows certify).
  */
class StreamingRecoverySpec extends AnyFunSuite {
  import TestSpark._
  import streaming.SessionizeStream.{closedSessionsNative, Ev}

  private def runScenario(provider: Option[String], tag: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 1000L
    val out = java.nio.file.Files.createTempDirectory(s"native_rec_out_$tag").toString
    val ckpt = java.nio.file.Files.createTempDirectory(s"native_rec_ckpt_$tag").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    try {
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      def start() = closedSessionsNative(spark, stream.toDS(), gap, "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      // first incarnation: sessions left OPEN in the engine's
      // session-window state store, then the query dies
      val batch1 = Seq(Ev(1, 0, 1), Ev(1, 500, 2), Ev(2, 0, 3))
      val q1 = start()
      stream.addData(batch1: _*); q1.processAllAvailable(); q1.stop()
      // arrivals land while the query is down: event 4 must MERGE
      // into user 1's recovered open session (within gap of its
      // frontier 500), event 5 opens a new one, event 6 merges into
      // user 2's; the sentinel pushes the watermark past every
      // session end so append mode emits them all
      val batch2 = Seq(Ev(1, 600, 4), Ev(1, 5000, 5), Ev(2, 800, 6),
        Ev(-1L, 1000000L, -1L))
      stream.addData(batch2: _*)
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(out)
        .filter(col("user_id") >= 0)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      // batch reference: the SAME operator over the full feed in one
      // batch query (session_window works unchanged on batch frames)
      val want = closedSessionsNative(spark, (batch1 ++ batch2).toDS(), gap, "0 seconds")
        .filter(col("user_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got == want,
        s"recovered session_window state must continue the batch sessions: stream=$got batch=$want")
      // the load-bearing row: user 1's first session SPANS the restart
      assert(got.contains((1L, 0L, 600L, 3L)),
        s"session open across the restart must absorb the post-restart event: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      Seq(out, ckpt).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  test("native session_window state recovers across a checkpoint restart (default backend)") {
    runScenario(None, "hdfs")
  }

  test("native session_window state recovers across a checkpoint restart (RocksDB)") {
    runScenario(Some(streaming.StateBackend.RocksDBProvider), "rocks")
  }
}
