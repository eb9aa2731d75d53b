package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination gate (streaming.DecontamStream): the
  * ingest-time twin of batch q54/q54b. Laws pinned:
  *
  *  - stream across micro-batches == batch q54 on the same documents
  *    (the gate is a pure function of its input; the Bloom screen +
  *    exact verify change the plan, never the answer);
  *  - a deliberately terrible fpp (0.5) still yields the exact
  *    output: false positives die in the verify join, and the
  *    screen's no-false-negative law means nothing contaminated can
  *    slip regardless of fpp.
  */
class DecontamStreamSpec extends AnyFunSuite {
  import TestSpark._
  import streaming.DecontamStream
  import streaming.DedupStream.DocIn

  private def asTuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4))).toSet

  test("stream gate across micro-batches == batch q54 on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/fake/decontam_stream"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "alpha beta gamma delta epsilon"), // benchmark (0 % 97 == 0)
      (97L, "zeta eta theta"),                // benchmark too
      (1L, "alpha beta gamma delta epsilon"), // verbatim leak -> rate 1
      (2L, "one two three four five six"),    // disjoint -> rate 0
      (3L, "hi there")                        // < 3 tokens -> no grams
    ).toDF("doc_id", "text"))
    val truth = asTuples(operators.Curation.decontaminate(spark, dir).collect())

    val idx = DecontamStream.loadBench(spark, dir)
    val arrivals = Seq(DocIn(1L, "alpha beta gamma delta epsilon"),
      DocIn(2L, "one two three four five six"), DocIn(3L, "hi there"))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = DecontamStream.gate(idx, stream.toDF())
      .writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    stream.addData(arrivals.head); q.processAllAvailable()
    stream.addData(arrivals.tail: _*); q.processAllAvailable()
    val streamOut = asTuples(spark.table("decontam_out").collect())
    q.stop()
    assert(streamOut == truth, "stream gate must equal batch q54 row-for-row")
    assert(truth.exists(_._5) && truth.exists(t => !t._5), "both outcomes exercised")

    // one code path: the same gate on a batch frame agrees too
    val batchOut = asTuples(DecontamStream.gate(idx, arrivals.toDF()).toDF().collect())
    assert(batchOut == truth)
    idx.bench.unpersist(false)
  }

  test("fuzzy gate: stream across micro-batches == batch q76 on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/fake/decontam_fuzzy_stream"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "alpha beta gamma delta epsilon"),  // bench
      (97L, "alpha beta gamma delta epsilon"), // bench, same text (tie)
      (1L, "alpha beta gamma delta epsilon"),  // verbatim hit on both
      (2L, "one two three four five"),         // clean
      (3L, "hi")                               // shingle-less -> clean
    ).toDF("doc_id", "text"))
    val idx = DecontamStream.loadBenchFuzzy(spark, dir)
    val arrivals = Seq(DocIn(1L, "alpha beta gamma delta epsilon"),
      DocIn(2L, "one two three four five"), DocIn(3L, "hi"))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = DecontamStream.gateFuzzy(idx, stream.toDF())
      .writeStream.format("memory").queryName("fuzzy_out")
      .outputMode("append").start()
    stream.addData(arrivals.head); q.processAllAvailable()
    stream.addData(arrivals.tail: _*); q.processAllAvailable()
    val out = spark.table("fuzzy_out").collect()
      .map(r => r.getLong(0) -> r).toMap
    q.stop()
    assert(out.keySet == Set(1L, 2L, 3L), "every arriving doc gets a verdict")
    assert(out(1L).getLong(1) == 2 && out(1L).getDouble(2) == 1.0 &&
      out(1L).getLong(3) == 0L && out(1L).getBoolean(4),
      "verbatim leak: both bench copies hit, tie resolves to min bench_id")
    assert(!out(2L).getBoolean(4) && out(2L).getLong(1) == 0L)
    assert(!out(3L).getBoolean(4), "a shingle-less doc passes clean")
  }

  test("fuzzy gate on the corpus-side frame == batch q76 contaminated set") {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.dir).select("doc_id", "text")
    // q76's planted corpus side, re-derived: non-bench docs plus a
    // verbatim copy of every 2nd bench doc at +1000000
    val corpus = base.filter(col("doc_id") % 97 =!= 0)
      .union(base.filter(col("doc_id") % 194 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val idx = DecontamStream.loadBenchFuzzy(spark, TestSpark.dir)
    val gate = DecontamStream.gateFuzzy(idx, corpus).toDF().collect()
    val flagged = gate.filter(_.getBoolean(4))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val batch = operators.Curation.decontamFuzzy(spark, TestSpark.dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(flagged == batch,
      "ingest gate must flag exactly the docs batch q76 reports, with identical scores")
    assert(gate.length == corpus.count(), "clean docs pass through with a verdict")
  }

  test("fpp 0.5 screen still yields the exact answer on the real corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0)
      .select("doc_id", "text")
    val truth = asTuples(operators.Curation.decontaminate(spark, TestSpark.dir).collect())
    val idx = DecontamStream.loadBench(spark, TestSpark.dir, fpp = 0.5)
    val out = asTuples(DecontamStream.gate(idx, docs).toDF().collect())
    assert(out == truth, "false positives must die in the verify join at any fpp")
    idx.bench.unpersist(false)
  }
}
