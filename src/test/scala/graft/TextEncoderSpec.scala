package graft

import org.apache.spark.util.LongAccumulator
import org.scalatest.funsuite.AnyFunSuite

/** Pins the batched-encoder CONTRACT (operators.TextEncoder): a real
  * model drops into encodeBatch and these invariants keep holding.
  */
class TextEncoderSpec extends AnyFunSuite {
  import TestSpark._
  import operators.TextEncoder
  import spark.implicits._

  private def texts = Tables.documents(spark, dir)
    .selectExpr("doc_id", "text").as[TextEncoder.TextRow]

  test("row preservation: every doc encoded exactly once") {
    val out = TextEncoder.encode(spark, texts).cache()
    val n = Tables.documents(spark, dir).count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
  }

  test("batch shape: one model call per <=batchSize rows, batches full except per-partition tails") {
    val calls: LongAccumulator = spark.sparkContext.longAccumulator("calls")
    val maxSeen: LongAccumulator = spark.sparkContext.longAccumulator("max")
    TextEncoder.encode(spark, texts, onBatch = b => { calls.add(1); maxSeen.add(0); if (b > TextEncoder.encodeBatchSize) maxSeen.add(1) })
      .write.format("noop").mode("overwrite").save()
    val parts = texts.rdd.getNumPartitions
    val n = texts.count()
    assert(maxSeen.value == 0, "no batch may exceed encodeBatchSize")
    // ceil(rows/batch) per partition; with unknown row spread the call
    // count is bounded by [ceil(n/batch), parts + n/batch]
    val lo = (n + TextEncoder.encodeBatchSize - 1) / TextEncoder.encodeBatchSize
    val hi = parts + n / TextEncoder.encodeBatchSize
    assert(calls.value >= lo && calls.value <= hi,
      s"calls=${calls.value} outside [$lo, $hi] for n=$n parts=$parts")
  }

  test("deterministic and normalized: two runs identical, unit L2 norms") {
    val a = TextEncoder.encodePipeline(spark, dir).collect()
    val b = TextEncoder.encodePipeline(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "stub encoder must be deterministic")
    assert(a.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-5),
      "normalize_embeddings contract: unit norms")
    assert(a.forall(_.getInt(1) == 64))
  }
}
