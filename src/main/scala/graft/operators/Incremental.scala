package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-update semantics — the reference's "avoid
  * re-processing existing messages" logic re-expressed as anti-join
  * set algebra (TelegramPreprocessor.py:1167-1196: skip messages
  * whose ids already have embeddings; telegram_database.py:865-948
  * `add_messages`' INSERT OR IGNORE upsert).
  *
  * At scale both are one shuffle on the key columns; with both sides
  * bucketed on the key (plans.CoLocate) they are shuffle-free.
  */
object Incremental {

  /** Rows of `incoming` whose key is not yet in `existing`
    * (the reference's `missing_message_ids` filter).
    */
  def newRowsOnly(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** INSERT OR IGNORE: existing rows win, new keys append. */
  def upsertByKey(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(newRowsOnly(incoming, existing, keys))

  /** Resume position per group — the reference's `get_max_message_id`
    * (telegram_database.py:1088-1133), used to fetch only messages
    * newer than what's stored.
    */
  def maxKeyPerGroup(df: DataFrame, group: String, key: String): DataFrame =
    df.groupBy(group).agg(max(key).as(s"max_$key")).orderBy(group)
}
