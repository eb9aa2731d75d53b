package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** SCD name-mapping upsert — the reference's chat/user name history
    * (telegram_database.py:780-860 `_upsert_name_mappings`: per
    * (id, name) pair, first_seen = min(date), last_seen = max(date)).
    * The reference INSERT OR REPLACEs the incoming batch's min/max
    * over the stored row (clobbering an older stored first_seen);
    * this implements the documented first/last-seen intent — an exact
    * min/max MERGE across stored + incoming, idempotent and
    * batch-order-independent. One shuffle on the key columns;
    * shuffle-free with both sides bucketed on them (plans.CoLocate).
    */
  def upsertNameMappings(existing: DataFrame, incoming: DataFrame,
                         idCol: String, nameCol: String): DataFrame =
    existing.unionByName(incoming)
      .groupBy(idCol, nameCol)
      .agg(min("first_seen").as("first_seen"), max("last_seen").as("last_seen"))

  /** Composed incremental embedding update — the reference's
    * steady-state loop (TextPreprocessor.py:389-427
    * `calculate_embeddings` applied ONLY to messages lacking
    * embeddings, appended to the store; TelegramPreprocessor.py:
    * 1167-1196 `missing_message_ids`): anti-join the incoming docs
    * against the stored vector ids, run only the missing rows through
    * the batched encoder, append. Existing store rows pass through
    * byte-identical — they are never re-encoded (the whole point of
    * the loop: encoder cost tracks the DELTA, not the corpus).
    *
    * Scale shape: one anti-join shuffle on the id (shuffle-free with
    * docs and store bucketed on it), encoder runs
    * partition-parallel over the delta only, union is a no-shuffle
    * concat. The session-side twin of this loop is
    * `Sessions.resessionizeDirty` (re-derive only dirty users'
    * sessions after the append); EmbedNewSpec composes both.
    */
  def embedNew(spark: SparkSession, docs: DataFrame, store: DataFrame,
               dim: Int = 64, onBatch: Int => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    val missing = newRowsOnly(
      docs.select(col("doc_id"), col("text")),
      store.select(col("vec_id").as("doc_id")), Seq("doc_id"))
      // a batch can carry the same doc_id twice (overlapping export
      // files) — the anti-join only screens against the STORE, so
      // without this each copy would encode and append a duplicate
      // vec_id row that double-counts in every later join, forever
      .dropDuplicates("doc_id")
    val encoded = TextEncoder.encode(spark, missing.as[TextEncoder.TextRow], dim, onBatch)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    store.select(col("vec_id"), col("embedding")).unionByName(encoded)
  }

  /** Dictionary-encoding upsert — the reference's media-type /
    * forwarded-source id mappings (telegram_database.py:684-778
    * `_upsert_media_types` / `_upsert_forwarded_sources`): existing
    * (name → id) rows keep their ids; unseen names get consecutive
    * ids starting after the current max, assigned in name order so
    * the result is deterministic under any partitioning.
    *
    * Scale shape: one anti-join (shuffle on name) + the two-pass
    * range-partitioned numbering (plans.Ordinals) over the NEW names
    * only (the dictionary delta, not the corpus) — no single-task
    * global sort. The max-id lookup is a 1-row aggregate, broadcast
    * back.
    */
  def upsertDictionary(existing: DataFrame, names: DataFrame, nameCol: String): DataFrame = {
    val newNames = names.select(col(nameCol).as("name")).filter(col("name").isNotNull)
      .distinct()
      .join(existing.select(col("name")), Seq("name"), "left_anti")
    val base = existing.select(coalesce(max(col("id")), lit(0L)).as("base"))
    val assigned = graft.plans.Ordinals
      .withOrdinal(newNames.crossJoin(base), Seq(col("name")), "ord", offset = 1L)
      .select(col("name"), (col("base") + col("ord")).as("id"))
    existing.select(col("name"), col("id")).unionByName(assigned)
  }
}
