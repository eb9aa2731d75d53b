package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the incremental counterpart of the
  * batch operator (operators/Sessions.scala, from the reference's
  * create_clusters at TextPreprocessor.py:162-214; its DB mode
  * processes "messages arriving later" incrementally, which is
  * exactly a stateful stream).
  *
  * Semantics match the batch operator: per user, a gap > gapMs opens
  * a new session; session ids are a per-user running count. State is
  * one (lastMs, sessionId) pair per user — O(users) state, no
  * unbounded buffers; with event-time watermarking upstream, late
  * data past the watermark is dropped before reaching the state
  * function.
  */
object SessionizeStream {

  case class Ev(user_id: Long, ts_ms: Long, event_id: Long)
  case class SessState(lastMs: Long, sessionId: Long)
  case class SessOut(user_id: Long, event_id: Long, session_id: Long)

  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Production-shaped variant: emits a session only when it CLOSES —
    * i.e. the event-time watermark passes lastEvent + gap, proven by
    * an EventTimeTimeout firing. State is one OpenSession per user;
    * the watermark both bounds state and drops late events.
    * Input needs an eventtime `ts` column (TimestampType) with
    * `withWatermark` already applied by the caller's read pipeline —
    * this operator applies it itself from `watermark`.
    */
  def closedSessions(spark: SparkSession, events: Dataset[Ev], gapMs: Long,
                     watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"ts_ms"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startMs, s.lastMs, s.n))
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts_ms, e.event_id))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            evs.foreach { e =>
              cur match {
                // cross-batch disorder rule (state is ONE open session
                // per user): an event within the open session's REACH
                // [start-gap, last+gap] merges, extending the span in
                // BOTH directions — a late event must never inflate n
                // while leaving start_ms untouched. Within a batch the
                // sort above handles ordering; these branches only see
                // cross-batch stragglers the watermark let through.
                case Some(s) if e.ts_ms >= s.startMs - gapMs && e.ts_ms - s.lastMs <= gapMs =>
                  cur = Some(OpenSession(math.min(s.startMs, e.ts_ms),
                    math.max(s.lastMs, e.ts_ms), s.n + 1))
                case Some(s) if e.ts_ms < s.startMs - gapMs =>
                  // a straggler beyond the open session's reach can
                  // never rejoin it (events only extend the span
                  // forward from here) — emit it as its own closed
                  // session NOW instead of silently merging it.
                  // Bounded-state tradeoff vs the engine-native twin:
                  // two such stragglers within gap of each other emit
                  // as singletons where session_window would merge
                  // them; closedSessionsNative is the full-merge
                  // spelling when that matters.
                  closed ::= ClosedSession(uid, e.ts_ms, e.ts_ms, 1)
                case Some(s) =>
                  closed ::= ClosedSession(uid, s.startMs, s.lastMs, s.n)
                  cur = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
                case None =>
                  cur = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** The ENGINE-NATIVE spelling of `closedSessions`: Spark's
    * `session_window` + watermark (append mode emits a session once
    * the watermark passes its end — the engine manages the state the
    * flatMapGroupsWithState twin manages by hand). The gap is
    * gapMs + 1 for the same break-at-diff-> law as the batch q01c
    * twin (Sessions.sessionStatsNative); output schema matches
    * `closedSessions` so consumers can swap freely.
    */
  def closedSessionsNative(spark: SparkSession, events: Dataset[Ev], gapMs: Long,
                           watermark: String = "10 minutes")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    events
      .withColumn("ts", timestamp_millis($"ts_ms"))
      // parameterized like closedSessions (same default) — a
      // hardcoded 0-second watermark silently DROPPED any cross-batch
      // late event the hand-rolled twin would have merged, breaking
      // the swap-freely contract under disorder
      .withWatermark("ts", watermark)
      .groupBy($"user_id", session_window($"ts", s"${gapMs + 1} milliseconds"))
      .agg(min($"ts_ms").as("start_ms"), max($"ts_ms").as("end_ms"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"start_ms", $"end_ms", $"n_events")
  }

  /** Works on both streaming and batch Datasets (state spans
    * micro-batches in streaming; within a micro-batch events are
    * ordered by (ts_ms, event_id) before assignment).
    */
  def assign(spark: SparkSession, events: Dataset[Ev], gapMs: Long): Dataset[SessOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val evs = it.toSeq.sortBy(e => (e.ts_ms, e.event_id))
          var last = state.getOption.map(_.lastMs).getOrElse(Long.MinValue)
          var sid = state.getOption.map(_.sessionId).getOrElse(0L)
          val out = evs.map { e =>
            if (last == Long.MinValue || e.ts_ms - last > gapMs) sid += 1
            // max, not assignment: a cross-batch late event must not
            // REGRESS the frontier — a regressed `last` makes the next
            // on-time event look like a gap and splits the session,
            // shifting every later session_id for the user
            last = math.max(last, e.ts_ms)
            SessOut(uid, e.event_id, sid)
          }
          if (evs.nonEmpty) state.update(SessState(last, sid))
          out.iterator
      }
  }
}
