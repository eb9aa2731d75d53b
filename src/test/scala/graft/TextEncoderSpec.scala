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

  test("probe columns pin the stub arithmetic (cross-engine bit-model values)") {
    // Expected values computed by an INDEPENDENT bit-model of the stub
    // (integer hashCode fold → splitmix64 → binary32 normalize, in
    // Python) and triple-checked against the DuckDB replay oracle at
    // sf0.001/0.01/0.1 when q49 graduated (r15). If the stub's seed,
    // mix, or float order ever drifts, this fails HERE, not at the
    // round's correctness gate.
    val df = TextEncoder.encodePipeline(spark, dir)
    // the DuckDB compare sorts columns BY NAME before hashing — a
    // rename breaks the oracle even with identical values
    assert(df.columns.toSeq == Seq("doc_id", "dim", "l2_norm", "v0", "comp_sum"))
    val rows = df.filter("doc_id IN (0, 1)").collect().sortBy(_.getLong(0))
    assert(rows.length == 2)
    assert(rows(0).getDouble(3) == 0.07842801511287689, "doc 0 v0")
    assert(rows(0).getDouble(4) == -0.35320352017879486, "doc 0 comp_sum")
    assert(rows(1).getDouble(3) == 0.14974389970302582, "doc 1 v0")
    assert(rows(1).getDouble(4) == -2.068898485507816, "doc 1 comp_sum")
    assert(rows.forall(_.getDouble(2) == 1.0), "6dp norms on these docs")
  }

  test("deterministic and normalized: two runs identical, unit L2 norms") {
    val a = TextEncoder.encodePipeline(spark, dir).collect()
    val b = TextEncoder.encodePipeline(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "stub encoder must be deterministic")
    assert(a.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-5),
      "normalize_embeddings contract: unit norms")
    assert(a.forall(_.getInt(1) == 64))
  }

  test("hashed encoder (q49b): content-dependent, order-insensitive, batch-invariant") {
    def enc(ts: String*): Seq[Array[Float]] =
      TextEncoder.encodeBatchHashed(ts, 64)
    // determinism + content dependence: change ONE token, vector moves
    val Seq(a1, a2, b) = enc("the quick brown fox", "the quick brown fox", "the quick brown cat")
    assert(a1.toSeq == a2.toSeq, "deterministic")
    assert(a1.toSeq != b.toSeq, "a one-token change must move the vector")
    // bag semantics: signed counts ignore token order but see multiset
    val Seq(p, q, dup) = enc("alpha beta gamma", "gamma alpha beta", "alpha alpha beta gamma")
    assert(p.toSeq == q.toSeq, "token permutation must not change the vector")
    assert(p.toSeq != dup.toSeq, "a repeated token must change the vector")
    // shared tokens => correlated vectors (the fastText-bag property
    // the whole-string stub cannot have)
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.lazyZip(y).map((u, v) => u.toDouble * v.toDouble).sum
    val Seq(s1, s2, far) = enc(
      "shared words dominate this sentence entirely here",
      "shared words dominate this sentence entirely there",
      "completely different content with other tokens altogether")
    assert(cos(s1, s2) > 0.5, s"near-identical texts must correlate: ${cos(s1, s2)}")
    assert(math.abs(cos(s1, far)) < cos(s1, s2), "unrelated text correlates less")
    // unit norms; empty and null texts encode to the zero vector
    assert(math.abs(a1.map(x => x.toDouble * x.toDouble).sum - 1.0) < 1e-5)
    val Seq(e1, e2) = TextEncoder.encodeBatchHashed(Seq("", null), 64)
    assert(e1.forall(_ == 0f) && e2.forall(_ == 0f))
    // batch-size invariance through the pipeline seam: encodeHashed
    // over the corpus equals per-text encodeBatchHashed row-for-row
    import spark.implicits._
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").as[TextEncoder.TextRow].collect()
    val viaPipeline = TextEncoder.encodeHashed(spark,
        spark.createDataset(texts.toSeq)).collect().map(e => e.doc_id -> e.embedding.toSeq).toMap
    texts.foreach { tr =>
      assert(viaPipeline(tr.doc_id) == TextEncoder.encodeBatchHashed(Seq(tr.text), 64).head.toSeq,
        s"doc ${tr.doc_id} must encode identically at any batch shape")
    }
  }
}
