package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Telegram Desktop export ingestion — the reference's front door
  * (terrorblade/data/preprocessing/TelegramPreprocessor.py:444-522
  * `load_json`: chats.list[].messages[] flattened, text_entities
  * joined into text, per-chat minimum size filter; :1031-1081
  * `prepare_data`: from_id prefix strip + typing; :706-1004
  * `handle_*`: media/service/contact marker rewriting and filters).
  *
  * Spark-first: one multiLine JSON read with an EXPLICIT schema (no
  * inference pass over 100TB of exports), two explodes, and a fully
  * declarative normalization cascade. The reference loads the whole
  * archive into driver memory (json.load) — here a directory of
  * exports parallelizes per file, and nothing leaves the executors.
  */
object TelegramJson {

  /** Explicit export schema (subset the reference's
    * telegram_import_schema_short cares about, dtypes.py). `text` is
    * declared STRING: when an export carries `text` as an entity
    * array (any rich message), Spark's JSON reader STRINGIFIES the
    * array into the raw JSON blob under the declared StringType — so
    * `text` alone is unusable for rich messages and the joined
    * `text_entities` must take precedence (the reference's load_json
    * order).
    */
  val exportSchema: StructType = {
    val entity = StructType(Seq(
      StructField("type", StringType), StructField("text", StringType)))
    val message = StructType(Seq(
      StructField("id", LongType),
      StructField("type", StringType),
      StructField("date", StringType),
      StructField("from", StringType),
      StructField("from_id", StringType),
      StructField("actor", StringType),
      StructField("actor_id", StringType),
      StructField("text", StringType),
      StructField("text_entities", ArrayType(entity)),
      StructField("reply_to_message_id", LongType),
      StructField("forwarded_from", StringType),
      StructField("media_type", StringType),
      StructField("sticker_emoji", StringType),
      StructField("file", StringType),
      StructField("file_name", StringType),
      StructField("photo", StringType),
      StructField("title", StringType),
      StructField("performer", StringType),
      StructField("discard_reason", StringType),
      StructField("reactions", ArrayType(StructType(Seq(
        StructField("emoji", StringType), StructField("count", LongType))))),
      StructField("members", ArrayType(StringType)),
      StructField("location_information", StructType(Seq(
        StructField("latitude", DoubleType), StructField("longitude", DoubleType)))),
      StructField("contact_information", StructType(Seq(
        StructField("first_name", StringType), StructField("last_name", StringType),
        StructField("phone_number", StringType))))))
    val chat = StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("id", LongType),
      StructField("messages", ArrayType(message))))
    StructType(Seq(StructField("chats",
      StructType(Seq(StructField("list", ArrayType(chat)))))))
  }

  /** Flatten an export (file or directory of exports) into one
    * message row per line, reference column names.
    */
  def readExport(spark: SparkSession, path: String, minMessages: Int = 3): DataFrame = {
    val m = col("m")
    val flat = spark.read.schema(exportSchema).option("multiLine", true).json(path)
      .select(explode(col("chats.list")).as("chat"))
      .filter(size(col("chat.messages")) >= minMessages) // load_json's min_messages
      .select(col("chat.name").as("chat_name"), col("chat.id").as("chat_id"),
        col("chat.type").as("chat_type"), explode(col("chat.messages")).as("m"))
    flat.select(
      col("chat_name"), col("chat_id"), col("chat_type"),
      m.getField("id").as("message_id"),
      m.getField("type").as("type"),
      to_timestamp(m.getField("date")).as("date"),
      // service rows carry actor/actor_id instead (handle_service_messages)
      coalesce(m.getField("from"), m.getField("actor")).as("from_name"),
      regexp_replace(coalesce(m.getField("from_id"), m.getField("actor_id")), "^(user|channel)", "")
        .cast(LongType).as("from_id"),
      // text precedence: joined entity texts first (load_json) — for
      // rich messages the raw `text` field is an array the JSON
      // reader stringifies into a blob, never null, so coalesce on
      // `text` would keep the blob
      when(size(m.getField("text_entities")) > 0,
        array_join(transform(m.getField("text_entities"), e => e.getField("text")), " "))
        .otherwise(m.getField("text"))
        .as("text"),
      m.getField("reply_to_message_id").as("reply_to_message_id"),
      m.getField("forwarded_from").as("forwarded_from"),
      m.getField("media_type").as("media_type"),
      m.getField("sticker_emoji").as("sticker_emoji"),
      m.getField("file").as("file"),
      m.getField("file_name").as("file_name"),
      m.getField("photo").as("photo"),
      m.getField("title").as("title"),
      m.getField("performer").as("performer"),
      m.getField("discard_reason").as("discard_reason"),
      // parse_reactions (TelegramPreprocessor.py:592-623): first emoji
      // only; try_element_at — ANSI element_at throws on reactions:[]
      try_element_at(m.getField("reactions"), lit(1)).getField("emoji").as("reaction"),
      // parse_members (:557-590): unique member set, sorted for determinism
      array_sort(array_distinct(m.getField("members"))).as("members"),
      m.getField("location_information").getField("longitude").as("loc_lon"),
      m.getField("location_information").getField("latitude").as("loc_lat"),
      m.getField("contact_information").getField("first_name").as("contact_first"),
      m.getField("contact_information").getField("last_name").as("contact_last"),
      m.getField("contact_information").getField("phone_number").as("contact_phone"))
  }

  /** The reference's media-marker cascade (handle_media /
    * handle_files / handle_photos / handle_service_messages,
    * TelegramPreprocessor.py:706-980) as one declarative projection.
    */
  def withMediaMarkers(df: DataFrame): Column = {
    // NULL semantics replay polars exactly: pl.format NULL-PROPAGATES
    // (any null argument nullifies the whole text, and
    // delete_empty_messages then drops the row), where Spark's
    // format_string would render the literal string "null" —
    // "[file](null)" garbage feeding shingles and embeddings. So
    // every branch builds with null-propagating concat, and ONLY the
    // arguments the reference fill_null("")s are coalesced. `text`
    // itself is never null in the reference after load_json
    // (str(message.get("text", ""))), so prefixed branches coalesce
    // it to "" rather than nulling the marker.
    val t = coalesce(col("text"), lit(""))
    when(col("media_type") === "sticker", col("sticker_emoji"))
      .when(col("media_type") === "video_file",
        concat(t, lit(" [video]("), col("file_name"), lit(")")))
      .when(col("media_type") === "voice_message",
        concat(lit("[voice_message]("), col("file"), lit(")")))
      .when(col("media_type") === "audio_file",
        concat(lit("[audio]("), col("title"), lit("-"),
          coalesce(col("performer"), lit("")), lit(")")))
      .when(col("media_type") === "animation",
        concat(t, lit(" [animation]("), col("file_name"), lit(")")))
      .when(col("media_type") === "video_message",
        concat(lit("[video_message]("), col("file_name"), lit(")")))
      .when(col("media_type").isNull && col("file").isNotNull,
        concat(lit("[file]("), col("file_name"), lit(")")))
      .when(col("photo").isNotNull,
        concat(t, lit(" [photo]("), coalesce(col("file_name"), lit("")), lit(")")))
      .when(col("type") === "service" && col("discard_reason").isNotNull,
        concat(lit("[phone_call]("), col("discard_reason"), lit(")")))
      // handle_location (TelegramPreprocessor.py:778-812): [location](lon, lat)
      .when(col("loc_lon").isNotNull && col("loc_lat").isNotNull,
        format_string("[location](%s, %s)", col("loc_lon"), col("loc_lat")))
      // handle_contacts (:845-896): [contact](first last : phone) —
      // first/last fill_null, phone does NOT (a null phone nullifies)
      .when(col("contact_first").isNotNull || col("contact_last").isNotNull,
        concat(lit("[contact]("), coalesce(col("contact_first"), lit("")), lit(" "),
          coalesce(col("contact_last"), lit("")), lit(" : "), col("contact_phone"), lit(")")))
      .otherwise(col("text"))
  }

  /** Full normalization: marker rewrite, service-row removal,
    * empty-text removal (prepare_data's pipeline).
    */
  def normalized(spark: SparkSession, path: String, minMessages: Int = 3): DataFrame = {
    val df = readExport(spark, path, minMessages)
    df.withColumn("text", withMediaMarkers(df))
      // delete_service_messages (:984-1004) filters the CHAT type,
      // not the message type: service MESSAGES survive the marker
      // pass — phone calls become "[phone_call](reason)" precisely so
      // they stay in the conversation (the earlier message-type
      // filter here made that marker branch dead code and silently
      // deleted every call from the corpus). Null-safe — an
      // INTENTIONAL DIVERGENCE from the reference: polars'
      // `chat_type != 'service'` (TelegramPreprocessor.py:1004) drops
      // rows whose chat has NO type (null predicate is not true in a
      // polars filter), i.e. an export missing chat.type loses the
      // whole chat as collateral of the service filter. Here a chat
      // with no type is not a service chat and is KEPT; exports with
      // chat.type present (every real Telegram export) are identical
      // under both rules, and TelegramJsonSpec pins this choice.
      .filter(!(col("chat_type") <=> lit("service")))
      .filter(col("text").isNotNull && length(col("text")) > 0) // delete_empty_messages
      .drop("type", "discard_reason",
        "loc_lon", "loc_lat", "contact_first", "contact_last", "contact_phone")
  }

  /** Per-chat message counts — the summary the reference logs after
    * load (process_file's summary table).
    */
  def chatSummary(df: DataFrame): DataFrame =
    df.groupBy("chat_id", "chat_name")
      .agg(count(lit(1)).as("n_messages"),
        countDistinct("from_id").as("n_authors"),
        min("date").as("first_message"),
        max("date").as("last_message"))
      .orderBy("chat_id")
}
