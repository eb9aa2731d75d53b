package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 F).
  *
  * Models the reference's media handling (TelegramPreprocessor.py:
  * 706-980 `handle_media`/`handle_photos`/... — media as references
  * carried beside text) the way a 100TB training pipeline does:
  * media as opaque BINARY columns + typed metadata, decoded
  * partition-parallel with a batch-shaped API.
  *
  * The decode step is a STUB — image/audio codecs are not in this
  * environment — replaced by a deterministic fake that derives
  * "dimensions" from byte statistics. Everything around it is real:
  * schema (binary payload + typed meta), encoder-backed typed
  * Dataset, partition-parallel mapPartitions (the Scala analogue of
  * mapInPandas batches), and the downstream relational agg.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, source: String, payload: Array[Byte],
                      meta_lang: String, meta_chars: Long)
  case class Decoded(doc_id: Long, source: String, width: Int, height: Int, n_bytes: Int)

  /** q34: binary ingest → stubbed decode → feature aggregation. */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"),
        col("lang").as("meta_lang"), col("n_chars").as("meta_chars"))
      .as[MediaRow]
    val decoded = media.mapPartitions { it =>
      it.map { m =>
        // STUB decode: a real pipeline calls the image/audio codec on
        // m.payload here. Deterministic fake keeps the op testable.
        val b = m.payload
        var s = 0L; var i = 0
        while (i < b.length) { s += (b(i) & 0xff); i += 1 }
        Decoded(m.doc_id, m.source, (s % 640).toInt + 1, (s % 480).toInt + 1, b.length)
      }
    }
    decoded.groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        (sum("width").cast("double") / count(lit(1))).as("avg_width"),
        (sum("height").cast("double") / count(lit(1))).as("avg_height"))
      .orderBy("source")
  }
}
