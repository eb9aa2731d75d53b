package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming thread resolution — the incremental counterpart of
  * operators.ReplyChains.threads (reply_to_message_id ingested at
  * sources/TelegramJson.scala:99; the reference's client mode appends
  * messages incrementally, so thread membership is naturally a
  * stateful stream).
  *
  * State per chat: message_id → (root_id, depth) for every message
  * seen so far. An arriving message resolves against its parent's
  * already-resolved entry — O(1) per message, no joins, no
  * re-iteration — which equals the batch pointer-jumping result
  * whenever parents arrive no later than their replies (Telegram
  * exports and live appends are chronological, so replies follow
  * their parents; a reply whose parent never arrived roots at the
  * dangling id exactly like the batch operator).
  *
  * State is O(messages per chat) by default — threads reference
  * arbitrarily old roots, so entries cannot expire on a watermark
  * without breaking late replies. Two production bounds compose:
  *
  *   - idleTtlMs > 0 evicts a chat's whole map after that much
  *     processing-time silence (a revived chat's replies to
  *     pre-eviction messages then root at the dangling parent id —
  *     degraded exactly to the batch operator's deleted-parent
  *     behavior, never wrong structure). Default NO timeout:
  *     ProcessingTimeTimeout makes the engine fire timer
  *     micro-batches on every trigger, which livelocks
  *     processAllAvailable-style draining — opt in only under a real
  *     trigger interval.
  *   - maxRecent > 0 ROOT-COMPRESSES a live chat's map after every
  *     batch: keep every THREAD-ROOT entry (replies resolve against
  *     their thread's root forever — roots are what threads
  *     reference) plus the maxRecent highest message ids (the
  *     frontier a chronological reply actually targets). State is
  *     then O(threads + maxRecent) instead of O(messages): a
  *     single-thread firehose chat plateaus at 1 + maxRecent entries
  *     (spec-asserted). A late reply to an evicted MID-CHAIN message
  *     roots at the dangling parent id — again the deleted-parent
  *     degradation, never wrong structure.
  */
object ReplyChainStream {

  case class Msg(chat_id: Long, message_id: Long, reply_to: Option[Long])
  case class ThreadOut(chat_id: Long, message_id: Long, root_id: Long, depth: Long)
  case class ChainState(roots: Map[Long, (Long, Long)])

  /** Root-compression law: every root entry (root_id == message_id)
    * survives; non-root entries keep only the maxRecent newest ids.
    * The cutoff comes from sorting the non-root ids — O(s log s) on
    * the PRE-compression state size s, which compression itself keeps
    * at O(threads + maxRecent + batch), so the sort input stays small
    * in steady state (a quickselect would shave the log factor; not
    * worth the code while state is bounded).
    */
  private[graft] def compress(roots: Map[Long, (Long, Long)],
                                  maxRecent: Int): Map[Long, (Long, Long)] =
    if (maxRecent <= 0) roots
    else {
      val nonRoots = roots.iterator.filter { case (id, (r, _)) => r != id }.map(_._1).toArray
      if (nonRoots.length <= maxRecent) roots
      else {
        java.util.Arrays.sort(nonRoots)
        val cutoff = nonRoots(nonRoots.length - maxRecent) // keep ids >= cutoff
        roots.filter { case (id, (r, _)) => r == id || id >= cutoff }
      }
    }

  def resolve(spark: SparkSession, messages: Dataset[Msg],
              idleTtlMs: Long = 0L, maxRecent: Int = 0): Dataset[ThreadOut] = {
    import spark.implicits._
    val timeout =
      if (idleTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    messages
      .groupByKey(_.chat_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (chat: Long, it: Iterator[Msg], state: GroupState[ChainState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var roots = state.getOption.map(_.roots).getOrElse(Map.empty[Long, (Long, Long)])
            // deterministic within-batch order: ids are append-ordered
            // in exports; parents sort before their replies
            val out = it.toSeq.sortBy(_.message_id).map { m =>
              val (root, depth) = m.reply_to match {
                case None => (m.message_id, 0L)
                case Some(p) => roots.get(p) match {
                  case Some((r, d)) => (r, d + 1)     // parent resolved
                  case None => (p, 1L)                // dangling parent = root
                }
              }
              roots += m.message_id -> (root, depth)
              ThreadOut(chat, m.message_id, root, depth)
            }
            state.update(ChainState(compress(roots, maxRecent)))
            if (idleTtlMs > 0) state.setTimeoutDuration(idleTtlMs)
            out.iterator
          }
      }
  }
}
