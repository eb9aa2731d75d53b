package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Telegram Desktop HTML export ingestion — Spark-native analogue of
  * the reference's BeautifulSoup script
  * (terrorblade/data/loaders/telegram/parse_telegram_html.py: per
  * `div.body` block extract date title, from_name, text or media
  * href + kind). Same field semantics and "Unknown" defaults.
  *
  * Scale shape: one wholetext row per messagesNN.html file (exports
  * shard at ~1000 messages/file, so rows stay modest), message
  * blocks exploded executor-side via regexp — a directory of shards
  * parallelizes per file with no driver-side parsing.
  */
object TelegramHtml {

  private def extract(c: Column, pattern: String): Column = {
    val e = regexp_extract(c, pattern, 1)
    when(e === "", lit("Unknown")).otherwise(e)
  }

  def readExport(spark: SparkSession, path: String): DataFrame = {
    val blocks = spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("src_file"),
        explode(expr(
          """regexp_extract_all(value, '(?s)<div class="body">(.*?)(?=<div class="body">|$)', 1)"""))
          .as("block"))
    val b = col("block")
    // ONE text-div predicate for both cascades: the text column
    // previously tested the unclosed prefix `<div class="text` (which
    // a text_* variant class also matches) while message_type tested
    // the closed form — the two classifiers could disagree on the
    // same block
    val textDiv = """<div class="text">"""
    blocks.select(
      col("src_file"),
      extract(b, """(?s)<div class="pull_right date details"[^>]*title="([^"]+)"""".stripMargin)
        .as("timestamp"),
      extract(b, """(?s)<div class="from_name">\s*(.*?)\s*</div>""").as("author"),
      when(b.contains(textDiv),
        extract(b, """(?s)<div class="text">\s*(.*?)\s*</div>"""))
        .when(b.contains("video_file_wrap"), extract(b, """<a class="video_file_wrap[^"]*"\s+href="([^"]+)""""))
        .when(b.contains("photo_wrap"), extract(b, """<a class="photo_wrap[^"]*"\s+href="([^"]+)""""))
        .when(b.contains("media_voice_message"), extract(b, """<a class="media_voice_message[^"]*"\s+href="([^"]+)""""))
        .when(b.contains("media_audio_file"), extract(b, """<a class="media_audio_file[^"]*"\s+href="([^"]+)""""))
        .when(b.contains("sticker_wrap"), extract(b, """<a class="sticker_wrap[^"]*"\s+href="([^"]+)""""))
        .when(b.contains("media_wrap"), lit("Unknown media"))
        .otherwise(lit("Unknown")).as("text"),
      when(b.contains(textDiv), "text")
        .when(b.contains("video_file_wrap"), "video")
        .when(b.contains("photo_wrap"), "photo")
        .when(b.contains("media_voice_message"), "voice_message")
        .when(b.contains("media_audio_file"), "audio")
        .when(b.contains("sticker_wrap"), "sticker")
        .when(b.contains("media_wrap"), "media")
        .otherwise(lit("unknown")).as("message_type"))
  }
}
