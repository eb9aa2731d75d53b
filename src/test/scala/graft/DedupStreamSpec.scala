package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup detection must find, across micro-batch
  * boundaries, exactly the pairs the BATCH minhash operator finds on
  * the union of all batches — state carries prior docs' bucket
  * membership, so a doc arriving in batch 2 pairs with its near-dup
  * from batch 1.
  */
class DedupStreamSpec extends AnyFunSuite {
  import TestSpark._
  import streaming.DedupStream._

  test("stream pairs across batches == batch minhash pairs on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      DocIn(1, "the quick brown fox jumps over the lazy dog every single morning"),
      DocIn(2, "completely unrelated text about spark query planning and shuffles"),
      DocIn(3, "one"))
    val batch2 = Seq(
      DocIn(4, "the quick brown fox jumps over the lazy dog every single morning"), // dup of 1
      DocIn(5, "totally different content on vector search and cosine similarity"),
      DocIn(6, "completely unrelated text about spark query planning and shuffles")) // dup of 2
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = pairs(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    stream.addData(batch1: _*); q.processAllAvailable()
    val afterB1 = spark.table("dedup_out").as[DupPair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSet
    stream.addData(batch2: _*); q.processAllAvailable()
    val got = spark.table("dedup_out").as[DupPair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSet
    q.stop()
    assert(afterB1.isEmpty, s"batch 1 has no dup pairs, got $afterB1")
    assert(got == Set((1L, 4L), (2L, 6L)),
      s"cross-batch dups must surface exactly once per pair set, got $got")
  }

  test("signatures-only stream: exact dups estimate 1.0 across batches, constant-size state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = pairsBySignature(spark, stream.toDS())
      .writeStream.format("memory").queryName("sig_out").outputMode("append").start()
    stream.addData(
      DocIn(1, "the quick brown fox jumps over the lazy dog every single morning"),
      DocIn(2, "completely unrelated text about spark query planning and shuffles"))
    q.processAllAvailable()
    stream.addData(
      DocIn(4, "the quick brown fox jumps over the lazy dog every single morning"), // dup of 1
      DocIn(6, "completely unrelated text about spark query planning and shuffles")) // dup of 2
    q.processAllAvailable()
    val got = spark.table("sig_out").as[EstPair].collect()
      .map(p => ((p.doc_a, p.doc_b), p.est_jac)).toMap
    q.stop()
    // identical shingle sets ⇒ identical signatures ⇒ estimator exactly 1
    assert(got.keySet == Set((1L, 4L), (2L, 6L)), s"got $got")
    assert(got.values.forall(_ == 1.0), s"exact dups must estimate 1.0: $got")
  }

  test("q83c composed screen+verify == batch minhash on the planted corpus (multi-slice)") {
    // the driver row's law at spec scale: signature screen (constant-
    // bytes state) + downstream exact verify reproduces the BATCH
    // dedupMinHashPlanted pair set exactly — q27b's oracle in spec
    // form, here with a 4-slice feed so cross-batch signature state
    // is on the asserted path (the driver row runs one slice)
    val streamed = streaming.StreamHarness.streamDedupSignature(spark, dir, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = operators.Dedup.dedupMinHashPlanted(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch,
      s"stream screen+verify must equal batch pairs: stream=${streamed.size} batch=${batch.size}")
  }

  test("q83d streamed corpus gate == batch min-id-per-hash over the quality-filtered planted corpus") {
    import org.apache.spark.sql.functions._
    val streamed = streaming.StreamHarness.streamCorpusGate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val batch = operators.Dedup.plantedDocs(spark, dir, every = 20, idOffset = 1000000L)
      .withColumn("t", trim(col("text")))
      .withColumn("wc", when(col("t") === "", 0)
        .otherwise(length(col("t")) - length(regexp_replace(col("t"), " ", "")) + 1).cast("int"))
      .filter(col("wc") > 0 &&
        least(lit(1.0), length(col("text")).cast("double") / 500.0) >= 0.1)
      .withColumn("text_hash", md5(col("text")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash").orderBy("doc_id")))
      .filter(col("rk") === 1)
      .select("doc_id", "wc", "text_hash").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(streamed == batch,
      s"gate stream must equal batch min-id rule: stream=${streamed.size} batch=${batch.size}")
  }

  test("signature estimator tracks exact jaccard within sampling error (k=32)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val near1 = "the quick brown fox jumps over the lazy dog every single morning in the park"
    val near2 = "the quick brown fox jumps over the lazy dog every single morning in the rain"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = pairsBySignature(spark, stream.toDS(), threshold = 0.2)
      .writeStream.format("memory").queryName("sig_est_out").outputMode("append").start()
    stream.addData(DocIn(1, near1)); q.processAllAvailable()
    stream.addData(DocIn(2, near2)); q.processAllAvailable()
    // one emission per colliding band, like `pairs` — distinct downstream
    val got = spark.table("sig_est_out").as[EstPair].collect().distinct
    q.stop()
    assert(got.length == 1, s"near-dup pair must collide in some band: ${got.toSeq}")
    // exact jaccard of the two shingle sets: 13 common of 15+15 ⇒ 13/17
    val exact = 13.0 / 17
    // k=32 estimator: sigma = sqrt(j(1-j)/32) ~ 0.076; allow 3 sigma
    assert(math.abs(got.head.est_jac - exact) <= 0.25,
      s"estimator ${got.head.est_jac} too far from exact $exact")
  }

  test("corpus gate: first writer wins across batches, quality filter drops short docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val longText = ("lorem ipsum " * 10).trim // 120 chars: len_score 0.24
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = corpusGate(spark, stream.toDS(), minQuality = 0.1)
      .writeStream.format("memory").queryName("gate_out").outputMode("append").start()
    stream.addData(DocIn(1, longText), DocIn(2, "tiny"), DocIn(3, longText))
    q.processAllAvailable()
    stream.addData(DocIn(4, longText), DocIn(5, longText + " unique tail of words"))
    q.processAllAvailable()
    val got = spark.table("gate_out").as[GateOut].collect().map(_.doc_id).toSet
    q.stop()
    assert(got == Set(1L, 5L),
      s"doc 1 wins its hash (3 and 4 are dups, 2 fails quality), 5 is new content: $got")
  }

  test("re-delivered doc_id is a no-op: no duplicate state members, no repeated pair emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = pairs(spark, stream.toDS(), threshold = 0.9)
      .writeStream.format("memory").queryName("redeliver_out").outputMode("append").start()
    stream.addData(DocIn(1, tA), DocIn(1, tA)); q.processAllAvailable() // dup rows in one batch
    stream.addData(DocIn(1, tA)); q.processAllAvailable()              // replayed in a later batch
    stream.addData(DocIn(2, tA)); q.processAllAvailable()              // true twin arrives
    val got = spark.table("redeliver_out").as[DupPair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSeq
    q.stop()
    // identical docs collide in all 8 bands -> exactly 8 emissions of
    // the one pair (the documented once-per-colliding-band contract);
    // every extra stored copy of doc 1 would add 8 more
    assert(got.toSet == Set((1L, 2L)) && got.size == 8,
      s"doc 1 must be stored ONCE however often it is re-delivered: $got")
  }

  test("within-batch pairs are found too and degenerate docs survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = pairs(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_out2").outputMode("append").start()
    stream.addData(
      DocIn(10, "alpha beta gamma delta epsilon zeta eta theta"),
      DocIn(11, "alpha beta gamma delta epsilon zeta eta theta"),
      DocIn(12, "solo"))
    q.processAllAvailable()
    val got = spark.table("dedup_out2").as[DupPair].collect().map(p => (p.doc_a, p.doc_b)).toSet
    q.stop()
    assert(got == Set((10L, 11L)), s"same-batch dup must pair once as a set, got $got")
  }
}
