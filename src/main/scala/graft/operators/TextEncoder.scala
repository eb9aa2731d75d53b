package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batched embedding-computation plumbing — the Spark twin of the
  * reference's encoder pipeline (TextPreprocessor.py:304-427
  * `calculate_embeddings` / `process_message_groups`: texts are
  * encoded in fixed-size batches on the accelerator, normalized, and
  * rejoined to their rows).
  *
  * The MODEL CALL is a stub — there is no sentence-transformer (or
  * egress to fetch one) in this environment — but everything a
  * cluster deployment needs is real and spec-pinned: the typed
  * (id, text) → (id, unit vector) contract, the iterator-of-batches
  * partition shape (ONE model invocation per batch, so per-batch
  * setup cost amortizes exactly like mapInPandas/Arrow batches), row
  * preservation, and determinism. A real encoder replaces
  * `encodeBatch`'s body and nothing else moves — the same drop-in
  * seam as Multimodal.decode (q34).
  */
object TextEncoder {

  case class TextRow(doc_id: Long, text: String)
  case class Encoded(doc_id: Long, embedding: Array[Float])

  /** Mirrors the reference's encode batch size; at cluster scale this
    * is the accelerator micro-batch, NOT the Spark partition size.
    */
  val encodeBatchSize = 64

  /** STUB model: deterministic hash-derived pseudo-gaussian
    * components, L2-normalized — stands in for
    * `model.encode(batch, normalize_embeddings=True)`. Takes the
    * whole batch so a real model's batched forward pass fits the
    * seam; callCounter (tests) observes the per-batch invariant.
    */
  private[graft] def encodeBatch(texts: Seq[String], dim: Int): Seq[Array[Float]] =
    texts.map { t0 =>
      // null text encodes like "" (nothing upstream forbids a null
      // document text, and one null row must not kill the stage)
      val t = if (t0 == null) "" else t0
      val seed = graft.functions.Hashing.mix64(t.hashCode.toLong ^ 0x7ea7L)
      val raw = Array.tabulate(dim) { i =>
        val h = graft.functions.Hashing.mix64(seed ^ i.toLong)
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
      val norm = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)).toFloat
      raw.map(x => if (norm == 0f) 0f else x / norm)
    }

  /** Encode a typed text stream partition-parallel, one model call
    * per `encodeBatchSize` rows.
    */
  def encode(spark: SparkSession, texts: Dataset[TextRow], dim: Int = 64,
             onBatch: Int => Unit = _ => ()): Dataset[Encoded] = {
    import spark.implicits._
    texts.mapPartitions { it =>
      it.grouped(encodeBatchSize).flatMap { batch =>
        onBatch(batch.size)
        val vecs = encodeBatch(batch.map(_.text), dim)
        batch.lazyZip(vecs).map((r, v) => Encoded(r.doc_id, v))
      }
    }
  }

  /** q49: the encode pipeline as a driver entry — documents → batched
    * encode → per-vector health row (id, dim, 6dp L2 norm — ≈1 by the
    * normalize contract) plus two PROBE columns that expose the
    * vector content itself: `v0` (first component, exact float→double
    * widening) and `comp_sum` (index-ordered double fold of all
    * components). GRADUATED to ORACLE-EXACT in r15: the stub encoder
    * is integer-hash-derived (String.hashCode → splitmix64 per
    * component) with float normalize, and every step replays in
    * DuckDB — the wrapping-integer chain via the q28 umulSql
    * machinery, the binary32 ops as DOUBLE-compute-then-REAL-cast
    * (exact by the 2p+2≤53 double-rounding theorem for +,-,*,/,sqrt
    * on binary32 inputs). A real model replaces encodeBatch and the
    * entry reverts to rows-only; until then the whole seam —
    * batching, row preservation, NORMALIZATION ARITHMETIC — is
    * cross-engine certified, not just spec-pinned.
    * TextEncoderSpec additionally pins batch shape and determinism.
    */
  def encodePipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[TextRow]
    encode(spark, texts)
      .select(col("doc_id"), size(col("embedding")).as("dim"),
        round(sqrt(aggregate(transform(col("embedding"), v => v.cast("double") * v),
          lit(0.0), (a, x) => a + x)), 6).as("l2_norm"),
        element_at(col("embedding"), 1).cast("double").as("v0"),
        aggregate(transform(col("embedding"), v => v.cast("double")),
          lit(0.0), (a, x) => a + x).as("comp_sum"))
      .orderBy("doc_id")
  }
}
