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
  case class Resized(doc_id: Long, source: String, width: Int, height: Int,
                     out_w: Int, out_h: Int, n_frames: Int, n_bytes: Int)

  /** Batch size mirroring Arrow record-batch shape: a real decode
    * amortizes codec/model setup per BATCH, not per row — the Scala
    * twin of mapInPandas' iterator-of-batches contract.
    */
  val decodeBatchSize = 64

  /** Binary rows → decoded dimensions. The decode itself is a STUB
    * (deterministic byte-statistics fake); the iterator-of-batches
    * shape, schema, and partition parallelism are the real contract.
    */
  def decode(spark: SparkSession, media: org.apache.spark.sql.Dataset[MediaRow]):
      org.apache.spark.sql.Dataset[Decoded] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // per-BATCH setup would happen here (codec handles, model
        // weights); the stub derives dimensions from byte statistics
        batch.map { m =>
          // a null payload (nullable source column) decodes like an
          // EMPTY one — the row survives with n_bytes 0 instead of
          // NPEing the whole task after retries
          val b = if (m.payload == null) Array.emptyByteArray else m.payload
          var s = 0L; var i = 0
          while (i < b.length) { s += (b(i) & 0xff); i += 1 }
          Decoded(m.doc_id, m.source, (s % 640).toInt + 1, (s % 480).toInt + 1, b.length)
        }
      }
    }
  }

  /** Columnar twin of `decode` — the mapInArrow-shaped contract
    * (PySpark's `DataFrame.mapInArrow` has no Scala surface, so this
    * is the honest Scala analogue): each batch of payloads is packed
    * into an Arrow `VarBinaryVector` (one contiguous buffer + offsets,
    * exactly the layout a mapInArrow UDF receives), the decode kernel
    * reads FROM the vector, and the per-batch allocator is closed
    * deterministically. A real codec that consumes Arrow buffers
    * (pillow-simd, dali, ffmpeg bindings) drops in where the stub
    * kernel reads `vec.get(i)` and nothing else moves. Result is
    * row-identical to `decode` (spec-pinned), so q34 can switch
    * freely between the row and columnar paths.
    */
  def decodeArrowBatched(spark: SparkSession, media: org.apache.spark.sql.Dataset[MediaRow],
                         onBatch: Int => Unit = _ => ()):
      org.apache.spark.sql.Dataset[Decoded] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        onBatch(batch.size)
        val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
        val vec = new org.apache.arrow.vector.VarBinaryVector("payload", alloc)
        try {
          vec.allocateNew(batch.size)
          batch.zipWithIndex.foreach { case (m, i) =>
            vec.setSafe(i, if (m.payload == null) Array.emptyByteArray else m.payload)
          }
          vec.setValueCount(batch.size)
          // kernel reads the COLUMNAR buffer — materialize before the
          // vector closes (flatMap consumes lazily otherwise)
          val out = batch.indices.map { i =>
            val b = vec.get(i)
            var s = 0L; var j = 0
            while (j < b.length) { s += (b(j) & 0xff); j += 1 }
            val m = batch(i)
            Decoded(m.doc_id, m.source, (s % 640).toInt + 1, (s % 480).toInt + 1, b.length)
          }.toVector
          out
        } finally { vec.close(); alloc.close() }
      }
    }
  }

  /** Decoded media → fit-into-maxDim resize (integer aspect-preserving
    * math, deterministic) + frame sampling (1 frame per strideBytes of
    * payload, min 1 — the video-keyframe analog).
    */
  def resizeAndSample(spark: SparkSession, decoded: org.apache.spark.sql.Dataset[Decoded],
                      maxDim: Int = 256, strideBytes: Int = 100):
      org.apache.spark.sql.Dataset[Resized] = {
    import spark.implicits._
    decoded.map { d =>
      val scaleNum = maxDim
      val scaleDen = math.max(d.width, d.height)
      val (ow, oh) =
        if (scaleDen <= maxDim) (d.width, d.height)
        else (math.max(1, d.width * scaleNum / scaleDen), math.max(1, d.height * scaleNum / scaleDen))
      Resized(d.doc_id, d.source, d.width, d.height, ow, oh,
        math.max(1, d.n_bytes / strideBytes), d.n_bytes)
    }
  }

  /** q34: binary ingest → batched stub decode → resize/frame-sample →
    * feature aggregation.
    */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"),
        col("lang").as("meta_lang"), col("n_chars").as("meta_chars"))
      .as[MediaRow]
    resizeAndSample(spark, decode(spark, media))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        (sum("width").cast("double") / count(lit(1))).as("avg_width"),
        (sum("height").cast("double") / count(lit(1))).as("avg_height"),
        (sum("out_w").cast("double") / count(lit(1))).as("avg_out_w"),
        (sum("out_h").cast("double") / count(lit(1))).as("avg_out_h"),
        sum("n_frames").as("total_frames"))
      .orderBy("source")
  }
}
