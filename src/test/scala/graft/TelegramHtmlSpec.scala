package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class TelegramHtmlSpec extends AnyFunSuite {
  import TestSpark._

  test("html export parses date/author/text/media with Unknown defaults") {
    val html =
      """<html><body>
        |<div class="message"><div class="body">
        |  <div class="pull_right date details" title="01.02.2024 10:00:00">10:00</div>
        |  <div class="from_name"> Ann </div>
        |  <div class="text"> hello html </div>
        |</div></div>
        |<div class="message"><div class="body">
        |  <div class="pull_right date details" title="01.02.2024 10:01:00">10:01</div>
        |  <div class="from_name">Bob</div>
        |  <div class="media_wrap"><a class="photo_wrap" href="photos/p1.jpg">img</a></div>
        |</div></div>
        |<div class="message"><div class="body">
        |  <div class="media_wrap"><a class="media_voice_message" href="voice/v1.ogg">v</a></div>
        |</div></div>
        |</body></html>""".stripMargin
    val f = Files.createTempFile("tg_export", ".html")
    Files.writeString(f, html)
    val rows = sources.TelegramHtml.readExport(spark, f.toString)
      .collect().map(r => (r.getAs[String]("timestamp"), r.getAs[String]("author"),
        r.getAs[String]("message_type"), r.getAs[String]("text")))
    assert(rows.length == 3)
    assert(rows(0) == ("01.02.2024 10:00:00", "Ann", "text", "hello html"))
    assert(rows(1) == ("01.02.2024 10:01:00", "Bob", "photo", "photos/p1.jpg"))
    assert(rows(2)._1 == "Unknown" && rows(2)._2 == "Unknown"
      && rows(2)._3 == "voice_message" && rows(2)._4 == "voice/v1.ogg")
  }
}
