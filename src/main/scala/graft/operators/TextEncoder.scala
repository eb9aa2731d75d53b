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

  /** q49b encoder: the FEATURE-HASHING (hashing-trick) n-gram
    * encoder — deterministic AND content-dependent per token, unlike
    * the q49 stub whose components derive from one whole-string seed
    * (VERDICT r17 item 5: "the stub encoder's arithmetic is
    * trivial"). Each whitespace token hashes (String.hashCode →
    * splitmix64, the q49 chain with its own salt) to a component
    * index (bits 1.. of the hash, mod dim) and a sign (bit 0);
    * SIGNED COUNTS accumulate per component — exact integer
    * arithmetic, order-insensitive — and the count vector
    * L2-normalizes in the stub's float arithmetic. Texts sharing
    * tokens get provably correlated vectors (fastText-bag style), so
    * the downstream consumers (q90's delta encode, ANN over encoded
    * vectors) are exercised on semantics-bearing content, and every
    * step still replays in DuckDB: per-token hashCode fold, the
    * splitmix64 wrapping-integer chain, integer count sums, and the
    * double-compute-then-REAL-cast normalization.
    */
  private[graft] def encodeBatchHashed(texts: Seq[String], dim: Int): Seq[Array[Float]] =
    texts.map { t0 =>
      val t = if (t0 == null) "" else t0
      val counts = new Array[Int](dim)
      t.split(" ").foreach { tok =>
        if (tok.nonEmpty) {
          val h = graft.functions.Hashing.mix64(tok.hashCode.toLong ^ 0x5eedL)
          val idx = ((h >>> 1) % dim).toInt // h >>> 1 is non-negative
          if ((h & 1L) == 0L) counts(idx) += 1 else counts(idx) -= 1
        }
      }
      val norm = math.sqrt(counts.foldLeft(0.0)((a, c) => a + c.toDouble * c.toDouble)).toFloat
      counts.map(c => if (norm == 0f) 0f else c.toFloat / norm)
    }

  /** Encode a typed text stream partition-parallel, one model call
    * per `encodeBatchSize` rows.
    */
  def encode(spark: SparkSession, texts: Dataset[TextRow], dim: Int = 64,
             onBatch: Int => Unit = _ => ()): Dataset[Encoded] =
    encodeWith(spark, texts, dim, onBatch, encodeBatch)

  /** encode with the content-dependent hashing encoder (q49b). */
  def encodeHashed(spark: SparkSession, texts: Dataset[TextRow], dim: Int = 64,
                   onBatch: Int => Unit = _ => ()): Dataset[Encoded] =
    encodeWith(spark, texts, dim, onBatch, encodeBatchHashed)

  private def encodeWith(spark: SparkSession, texts: Dataset[TextRow], dim: Int,
                         onBatch: Int => Unit,
                         enc: (Seq[String], Int) => Seq[Array[Float]]): Dataset[Encoded] = {
    import spark.implicits._
    texts.mapPartitions { it =>
      it.grouped(encodeBatchSize).flatMap { batch =>
        onBatch(batch.size)
        val vecs = enc(batch.map(_.text), dim)
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
  def encodePipeline(spark: SparkSession, dir: String): DataFrame =
    healthRows(encode(spark, textsOf(spark, dir)))

  /** q49b: the hashing-trick encoder under the same health-row +
    * content-probe projection and the same replay-oracle discipline
    * as q49 — but v0/comp_sum now expose PER-TOKEN content (signed
    * token counts through the normalize), so the certification bites
    * on the token multiset, not just one seed integer.
    */
  def encodePipelineHashed(spark: SparkSession, dir: String): DataFrame =
    healthRows(encodeHashed(spark, textsOf(spark, dir)))

  private def textsOf(spark: SparkSession, dir: String): Dataset[TextRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[TextRow]
  }

  private def healthRows(encoded: Dataset[Encoded]): DataFrame =
    encoded
      .select(col("doc_id"), size(col("embedding")).as("dim"),
        round(sqrt(aggregate(transform(col("embedding"), v => v.cast("double") * v),
          lit(0.0), (a, x) => a + x)), 6).as("l2_norm"),
        element_at(col("embedding"), 1).cast("double").as("v0"),
        aggregate(transform(col("embedding"), v => v.cast("double")),
          lit(0.0), (a, x) => a + x).as("comp_sum"))
      .orderBy("doc_id")
}
