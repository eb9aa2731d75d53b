package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming PQ gate (streaming.PqStream): arrivals scored against
  * the persisted IVF-PQ index. Laws pinned:
  *
  *  - the gate is a pure function of its input: the MemoryStream
  *    spelling across micro-batches equals the batch spelling on the
  *    union (identical code path, so this checks the stream-static
  *    join and literal plumbing, not luck);
  *  - ADC optimality of a planted twin: for an arrival that is an
  *    EXACT copy of an indexed vector q, adc(q → twin) =
  *    Σ_s min_c l2(q_s, c) — the unconditional lower bound of any
  *    ADC distance from q — so among the gate's hits the twin is the
  *    argmin with certainty (ties only from identical codes).
  */
class PqStreamSpec extends AnyFunSuite {
  import TestSpark._
  import streaming.PqStream
  import streaming.PqStream.VecIn

  private lazy val idx = {
    // fresh index per suite run: the warehouse path may carry one
    // from another suite's session with a different lifecycle (NB:
    // the path is a file: URI — delete via Hadoop fs, java.io.File
    // no-ops on it)
    val p = new org.apache.hadoop.fs.Path(operators.PQ.ivfPqIndexPath(spark, dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    PqStream.loadIndex(spark, dir)
  }

  private def arrivalsSeq: Seq[VecIn] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .filter(col("vec_id").isin(0L, 7L, 13L)).collect()
      .map(r => VecIn(r.getLong(0) + 5000000L, r.getSeq[Float](1).toArray))
      .sortBy(_.vec_id).toSeq

  test("stream gate across micro-batches == batch gate on the union") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val arrivals = arrivalsSeq
    val batchOut = PqStream.nearDupGate(idx, arrivals.toDF(), maxDist = 1e12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[VecIn]
    val q = PqStream.nearDupGate(idx, stream.toDF(), maxDist = 1e12)
      .writeStream.format("memory").queryName("pq_gate_out").outputMode("append").start()
    stream.addData(arrivals.head); q.processAllAvailable()
    stream.addData(arrivals.tail: _*); q.processAllAvailable()
    val streamOut = spark.table("pq_gate_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(batchOut.nonEmpty, "probed cells must produce candidates")
    assert(streamOut == batchOut,
      "the stream across batches must equal the batch gate on the union")
  }

  test("file-sink checkpoint restart: recovered stream equals the batch gate, no duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("pq_rec_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pq_rec_ckpt").toString
    val arrivals = arrivalsSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[VecIn]
    def start() = PqStream.nearDupGate(idx, stream.toDF(), maxDist = 1e12)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // first incarnation commits batch 0 to the file sink, then dies
    val q1 = start()
    stream.addData(arrivals.head); q1.processAllAvailable(); q1.stop()
    // arrivals land while the stream is down; the restarted query must
    // resume from the checkpointed offset — emitting the missed data
    // exactly once into the sink (the _spark_metadata commit log is
    // what makes a replayed file write invisible to readers)
    stream.addData(arrivals.tail: _*)
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // MULTISET comparison: a replayed/duplicated batch would survive a
    // set-compare, so sort full rows
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val want = PqStream.nearDupGate(idx, arrivals.toDF(), maxDist = 1e12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(want.nonEmpty && got == want,
      "recovery must emit each hit exactly once and match the batch gate on the union")
  }

  test("a planted twin arrival's argmin hit is its indexed original (ADC floor)") {
    import spark.implicits._
    val hits = PqStream.nearDupGate(idx, arrivalsSeq.toDF(), maxDist = 1e12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for (origId <- Seq(0L, 7L, 13L)) {
      val mine = hits.filter(_._1 == origId + 5000000L)
      assert(mine.nonEmpty, s"arrival for $origId must reach its probed cells")
      val minAdc = mine.map(_._3).min
      val twinRows = mine.filter(_._2 == origId)
      assert(twinRows.nonEmpty, s"the original $origId must be in a probed cell")
      assert(twinRows.head._3 == minAdc,
        s"twin of $origId must sit at the ADC minimum: twin=${twinRows.head._3} min=$minAdc")
    }
  }

  // LAST in the suite: rebuilds the shared index path under two-level
  // params (the earlier tests' flat GateIndex literals are already
  // consumed)
  test("TWO-LEVEL index (nLists > 64): gate cells == assignCells; twin recovery survives") {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(operators.PQ.ivfPqIndexPath(spark, dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val idx2 = PqStream.loadIndex(spark, dir, nLists = 128)
    assert(idx2.gcentsLit.isDefined,
      "nLists=128 must take the two-level path (autoCoarse > 1)")
    val arrivals = arrivalsSeq
    // ranking parity: the gate's probed cells must equal the batch
    // assignCells under the index's own structure — the co-ranking
    // guarantee the twin-recovery law rests on
    val gateProbe = PqStream.nearDupGate(idx2, arrivals.toDF(), maxDist = 1e12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cents = spark.read.parquet(s"${operators.PQ.ivfPqIndexPath(spark, dir)}/centroids")
      .select(org.apache.spark.sql.functions.col("cell")
        .cast("int").as("c_cell"), org.apache.spark.sql.functions.col("cvec"))
    val want = operators.Vectors.assignCells(
        arrivals.toDF().select("vec_id", "embedding"), cents,
        nProbe = 3, nCoarse = operators.Vectors.autoCoarse(128))
      .collect().map(r => (r.getLong(0), r.get(1).toString.toInt)).toSet
    val got = PqStream.nearDupGate(idx2, arrivals.toDF(), maxDist = 1e12)
      .select("in_id", "cell").distinct()
      .collect().map(r => (r.getLong(0), r.get(1).toString.toInt)).toSet
    // the gate emits (in_id, cell) only for non-empty cells; assignCells
    // may rank an empty cell — gate cells must be a subset ranked the
    // same way, and every arrival's twin must still be recovered
    assert(got.subsetOf(want),
      s"gate must probe exactly the index's own ranking: extra=${got.diff(want)}")
    for (origId <- Seq(0L, 7L, 13L)) {
      val mine = gateProbe.filter(_._1 == origId + 5000000L)
      val twinRows = mine.filter(_._2 == origId)
      assert(twinRows.nonEmpty,
        s"two-level gate must recover the exact twin of $origId (co-ranking guarantee)")
      assert(twinRows.head._3 == mine.map(_._3).min,
        s"twin of $origId at the ADC floor under the two-level probe")
    }
  }

  test("q91 harness: streamed planted corpus argmin pairs == the planted SELECT") {
    // the driver row's law at spec scale: every arrival's argmin hit
    // (self dropped) is its planted twin — q67g's floor certainty
    // carried through the MemoryStream feed and the persisted index
    val got = streaming.StreamHarness.streamAnnGate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 5L).map(i => (i, i + 1000000L))
    assert(got == want, s"planted argmin pairs: $got")
  }
}
