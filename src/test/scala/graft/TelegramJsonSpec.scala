package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the Telegram export source on a synthetic export covering
  * the reference's edge cases: entity-array text, stickers, voice,
  * service calls, files, small-chat filtering.
  */
class TelegramJsonSpec extends AnyFunSuite {
  import TestSpark._

  private def writeExport(): String = {
    val json =
      """{"chats": {"list": [
        |  {"name": "alpha", "type": "personal_chat", "id": 100, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-01-01T10:00:00",
        |     "from": "Ann", "from_id": "user7", "text": "hello there",
        |     "reactions": [{"emoji": "Y", "count": 2}, {"emoji": "N", "count": 1}],
        |     "members": ["bob", "ann", "bob"]},
        |    {"id": 2, "type": "message", "date": "2024-01-01T10:01:00",
        |     "from": "Bob", "from_id": "user8", "reactions": [],
        |     "text_entities": [{"type": "plain", "text": "see"}, {"type": "link", "text": "http://x"}]},
        |    {"id": 3, "type": "message", "date": "2024-01-01T10:02:00",
        |     "from": "Ann", "from_id": "user7", "media_type": "sticker", "sticker_emoji": "Y"},
        |    {"id": 4, "type": "message", "date": "2024-01-01T10:03:00",
        |     "from": "Bob", "from_id": "user8", "media_type": "voice_message", "file": "v.ogg"},
        |    {"id": 5, "type": "service", "date": "2024-01-01T10:04:00",
        |     "actor": "Ann", "actor_id": "user7", "discard_reason": "missed"},
        |    {"id": 6, "type": "message", "date": "2024-01-01T10:05:00",
        |     "from": "Ann", "from_id": "user7", "file": "doc.pdf", "file_name": "doc.pdf"},
        |    {"id": 7, "type": "message", "date": "2024-01-01T10:06:00",
        |     "from": "Bob", "from_id": "user8",
        |     "text": ["plain part ", {"type": "link", "text": "http://y"}],
        |     "text_entities": [{"type": "plain", "text": "plain part"}, {"type": "link", "text": "http://y"}]}
        |  ]},
        |  {"name": "tiny", "type": "personal_chat", "id": 200, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-01-02T10:00:00",
        |     "from": "Cat", "from_id": "user9", "text": "lonely"}
        |  ]},
        |  {"name": "gamma", "type": "personal_chat", "id": 400, "messages": [
        |    {"id": 401, "type": "message", "date": "2024-01-03T10:00:00",
        |     "from": "Dan", "from_id": "user10",
        |     "location_information": {"latitude": 50.4, "longitude": 30.5}},
        |    {"id": 402, "type": "message", "date": "2024-01-03T10:01:00",
        |     "from": "Dan", "from_id": "user10",
        |     "contact_information": {"first_name": "Ann", "last_name": "Lee", "phone_number": "+1 234"}},
        |    {"id": 403, "type": "message", "date": "2024-01-03T10:02:00",
        |     "from": "Dan", "from_id": "user10", "text": "plain tail"}
        |  ]}
        |]}}""".stripMargin
    val f = Files.createTempFile("tg_export", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("export flattens, joins entities, strips id prefixes, filters small chats") {
    val df = sources.TelegramJson.readExport(spark, writeExport()).cache()
    assert(df.select("chat_id").distinct().collect().map(_.getLong(0)).toSet == Set(100L, 400L),
      "chat 'tiny' (1 msg < min_messages=3) must be dropped")
    assert(df.count() == 10)
    val byId = df.collect().map(r => r.getAs[Long]("message_id") -> r).toMap
    assert(byId(1).getAs[String]("text") == "hello there")
    assert(byId(2).getAs[String]("text") == "see http://x", "entity texts join with spaces")
    // rich message: `text` is an entity ARRAY in the export — the JSON
    // reader stringifies it into a blob under StringType, so the
    // joined text_entities must win (reference load_json precedence)
    assert(byId(7).getAs[String]("text") == "plain part http://y",
      s"entity join must beat the stringified blob, got: ${byId(7).getAs[String]("text")}")
    assert(byId(1).getAs[Long]("from_id") == 7L, "user prefix stripped")
    assert(byId(5).getAs[Long]("from_id") == 7L, "service rows map actor_id to from_id")
    assert(byId(1).getAs[String]("reaction") == "Y", "first reaction emoji only")
    assert(byId(1).getAs[scala.collection.Seq[String]]("members").toSeq == Seq("ann", "bob"),
      "unique sorted members")
    assert(byId(2).getAs[String]("reaction") == null, "empty reactions list -> null (ANSI-safe)")
    assert(byId(3).getAs[String]("reaction") == null, "missing reactions -> null")
  }

  test("pipeline: sessionize + author-run concat over a normalized export") {
    // alpha chat: normalized keeps 1,2,3,4 (10:00..10:03), the
    // surviving phone-call row 5 (10:04, Ann via actor_id), 6 (10:05),
    // 7 (10:06) — one message per minute, no gaps
    val runs = sources.TelegramPipeline.prepare(spark, writeExport(), windowMs = 150 * 1000L)
      .filter(org.apache.spark.sql.functions.col("chat_id") === 100L)
      .collect()
    assert(runs.forall(_.getAs[Long]("session_id") == 1L), "150s window: one session")
    val authors = runs.map(r => (r.getAs[Long]("run_id"), r.getAs[Long]("from_id"))).toSeq.sortBy(_._1)
    assert(authors.map(_._2) == Seq(7L, 8L, 7L, 8L, 7L, 8L),
      s"author runs must alternate per the fixture, got $authors")
    // run 5 is Ann's phone call (10:04) + her file message (10:05) —
    // the surviving service row concatenates into her run, exactly
    // the reference's conversation shape
    val byRun = runs.map(r => r.getAs[Long]("run_id") -> r).toMap
    assert(byRun(5L).getAs[Long]("n_messages") == 2L &&
      byRun(5L).getAs[String]("text").startsWith("[phone_call](missed)"),
      s"the phone call must ride Ann's run: ${byRun(5L).getAs[String]("text")}")
    assert(runs.filter(_.getAs[Long]("run_id") != 5L).forall(_.getAs[Long]("n_messages") == 1L))
    val split = sources.TelegramPipeline.prepare(spark, writeExport(), windowMs = 90 * 1000L)
      .filter(org.apache.spark.sql.functions.col("chat_id") === 100L)
      .collect()
    assert(split.map(_.getAs[Long]("session_id")).max == 1,
      "90s window: with the phone call surviving there is no 2-minute gap — one session " +
        "(the pre-fix pipeline dropped the call and split here)")
  }

  test("a directory of exports reads as one corpus, one task per file") {
    val d = Files.createTempDirectory("tg_dir")
    val json2 =
      """{"chats": {"list": [
        |  {"name": "beta", "type": "personal_chat", "id": 300, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-02-01T09:00:00",
        |     "from": "Eve", "from_id": "user11", "text": "first"},
        |    {"id": 2, "type": "message", "date": "2024-02-01T09:01:00",
        |     "from": "Eve", "from_id": "user11", "text": "second"},
        |    {"id": 3, "type": "message", "date": "2024-02-01T09:02:00",
        |     "from": "Eve", "from_id": "user11", "text": "third"}
        |  ]}
        |]}}""".stripMargin
    Files.copy(java.nio.file.Path.of(writeExport()), d.resolve("a.json"))
    Files.writeString(d.resolve("b.json"), json2)
    val df = sources.TelegramJson.readExport(spark, d.toString)
    val chats = df.select("chat_id").distinct().collect().map(_.getLong(0)).toSet
    assert(chats == Set(100L, 300L, 400L), s"both exports' big-enough chats load: $chats")
    assert(df.count() == 13, "7 alpha + 3 gamma + 3 beta messages")
  }

  test("normalization applies the reference's media-marker cascade and filters") {
    val df = sources.TelegramJson.normalized(spark, writeExport()).cache()
    val texts = df.collect().map(r => r.getAs[Long]("message_id") -> r.getAs[String]("text")).toMap
    assert(texts(3) == "Y", "sticker text becomes the emoji")
    assert(texts(4) == "[voice_message](v.ogg)")
    assert(texts(6) == "[file](doc.pdf)")
    assert(texts(5) == "[phone_call](missed)",
      "phone calls SURVIVE: the reference deletes service CHATS (chat_type), not service messages")
    val byId2 = df.collect().map(r => r.getAs[Long]("message_id") -> r).toMap
    assert(byId2(401).getAs[String]("text") == "[location](30.5, 50.4)",
      s"handle_location marker: ${byId2(401).getAs[String]("text")}")
    assert(byId2(402).getAs[String]("text") == "[contact](Ann Lee : +1 234)",
      s"handle_contacts marker: ${byId2(402).getAs[String]("text")}")
    val summary = sources.TelegramJson.chatSummary(df).collect()
      .map(r => r.getAs[Long]("chat_id") -> r).toMap
    assert(summary.size == 2 && summary(100L).getAs[Long]("n_messages") == 7
      && summary(100L).getAs[Long]("n_authors") == 2
      && summary(400L).getAs[Long]("n_messages") == 3)
    // polars null-propagation parity: a marker arg the reference does
    // NOT fill_null nullifies the text and the row drops (format_string
    // would have emitted "[file](null)" garbage instead)
    val d2 = Files.createTempFile("tg_nullfile", ".json")
    Files.writeString(d2,
      """{"chats": {"list": [
        |  {"name": "nf", "type": "personal_chat", "id": 500, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-01-01T10:00:00",
        |     "from": "Eve", "from_id": "user11", "file": "blob_no_name"},
        |    {"id": 2, "type": "message", "date": "2024-01-01T10:01:00",
        |     "from": "Eve", "from_id": "user11", "text": "a"},
        |    {"id": 3, "type": "message", "date": "2024-01-01T10:02:00",
        |     "from": "Eve", "from_id": "user11", "text": "b"}
        |  ]}
        |]}}""".stripMargin)
    val nf = sources.TelegramJson.normalized(spark, d2.toString).collect()
    assert(nf.map(_.getAs[Long]("message_id")).toSet == Set(2L, 3L),
      "a bare file with no file_name must DROP (null marker), never read '[file](null)'")
  }

  test("service-chat filter is null-safe: a chat with NO type survives (intentional divergence)") {
    // the reference's polars `chat_type != 'service'`
    // (TelegramPreprocessor.py:1004) silently drops rows whose chat
    // has no type at all — collateral, not intent. The graft keeps
    // them (documented divergence in TelegramJson.normalized); this
    // pins the choice so a future "parity" edit can't flip it blind.
    val f = Files.createTempFile("tg_notype", ".json")
    Files.writeString(f,
      """{"chats": {"list": [
        |  {"name": "untyped", "id": 600, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-01-01T10:00:00",
        |     "from": "Eve", "from_id": "user11", "text": "kept one"},
        |    {"id": 2, "type": "message", "date": "2024-01-01T10:01:00",
        |     "from": "Eve", "from_id": "user11", "text": "kept two"},
        |    {"id": 3, "type": "message", "date": "2024-01-01T10:02:00",
        |     "from": "Eve", "from_id": "user11", "text": "kept three"}
        |  ]},
        |  {"name": "svc", "type": "service", "id": 700, "messages": [
        |    {"id": 1, "type": "message", "date": "2024-01-01T11:00:00",
        |     "from": "Bot", "from_id": "user12", "text": "svc a"},
        |    {"id": 2, "type": "message", "date": "2024-01-01T11:01:00",
        |     "from": "Bot", "from_id": "user12", "text": "svc b"},
        |    {"id": 3, "type": "message", "date": "2024-01-01T11:02:00",
        |     "from": "Bot", "from_id": "user12", "text": "svc c"}
        |  ]}
        |]}}""".stripMargin)
    val out = sources.TelegramJson.normalized(spark, f.toString).collect()
    assert(out.map(_.getAs[Long]("chat_id")).toSet == Set(600L),
      "untyped chat KEPT (null-safe filter), service chat dropped")
    assert(out.length == 3)
  }
}
