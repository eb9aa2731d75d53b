package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins streaming.FunnelStream — the online q79:
  *   1. stream-across-batches ≡ batch funnelDelta on the union when
  *      arrivals come in ascending doc_id order (the batch partner
  *      rule and arrival order agree), row for row on the q79 columns;
  *   2. the composed fuzzy column ≡ DecontamStream.gateFuzzy on the
  *      union (the q76 ingest gate riding along);
  *   3. ingest-time first-writer-wins: an EARLIER ARRIVAL beats a
  *      later arrival even when the later one has a smaller doc_id —
  *      the stream's semantics where arrival order and id order
  *      disagree (batch q79 resolves by id; the stream resolves by
  *      when the doc actually showed up, which is what an online
  *      admission gate must do).
  */
class FunnelStreamSpec extends AnyFunSuite {
  import TestSpark._
  import streaming.FunnelStream._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rowKey(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3),
      r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getString(7))

  test("stream verdicts across batches == batch funnelDelta on the union; fuzzy rides along") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("funnel_state"); val out = tmp("funnel_out"); val ckpt = tmp("funnel_ckpt")
    val ctx = load(spark, TestSpark.dir, state)
    val deltaDocs = Tables.documents(spark, TestSpark.dir)
      .filter(col("doc_id") % 16 === 0)
      .select("doc_id", "source", "text")
      .as[DocIn].collect().sortBy(_.doc_id)
    assert(deltaDocs.length > 10, "the sf0.001 delta must be non-trivial")
    val (b1, rest) = deltaDocs.splitAt(deltaDocs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = verdicts(ctx, stream.toDS(), out, ckpt)
    Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = spark.read.parquet(out)
    val gotRows = got
      .select("doc_id", "source", "n_pass", "is_bench",
        "is_exact_dup", "is_near_dup", "contaminated", "stage")
      .collect().map(rowKey).sortBy(_._1).toSeq
    val want = operators.Curation.funnelDelta(spark, TestSpark.dir)
      .collect().map(rowKey).sortBy(_._1).toSeq
    assert(gotRows == want,
      "ascending-order ingest must reproduce the batch delta funnel exactly")
    // the composed q76 leg: fuzzy_contaminated ≡ gateFuzzy on the union
    val wantFuzzy = streaming.DecontamStream
      .gateFuzzy(ctx.fuzzy, Tables.documents(spark, TestSpark.dir)
        .filter(col("doc_id") % 16 === 0).select("doc_id", "text"))
      .collect().filter(_.contaminated).map(_.doc_id).toSet
    val gotFuzzy = got.filter(col("fuzzy_contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotFuzzy == wantFuzzy, "the fuzzy column must equal the q76 ingest gate on the union")
  }

  test("ann leg: an arrival carrying an indexed twin's embedding flags ann_dup") {
    import spark.implicits._
    val state = tmp("ann_state")
    val ctx = load(spark, TestSpark.dir, state, withAnn = true, annMaxDist = 1e12)
    val twin = Tables.embeddings(spark, TestSpark.dir)
      .filter(col("vec_id") === 7L).select("embedding")
      .head.getSeq[Float](0).toArray
    val batch = Seq((5000007L, "s", "an arrival that rides the vector leg too", twin))
      .toDF("doc_id", "source", "text", "embedding")
    val out = gateBatch(ctx, batch).collect()
    assert(out.length == 1, "one arrival, one verdict row")
    assert(out.head.getBoolean(out.head.fieldIndex("ann_dup")),
      "an exact twin of an indexed vector must hit through the PQ probe (ADC floor)")
    // without an embedding column the leg is inert, never an error
    val plain = gateBatch(ctx,
      Seq((5000008L, "s", "a text-only arrival")).toDF("doc_id", "source", "text")).collect()
    assert(!plain.head.getBoolean(plain.head.fieldIndex("ann_dup")))
  }

  test("ann leg END-TO-END: a DocVecIn stream through verdictsOf flags ann_dup in the sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("ann_e2e_state"); val out = tmp("ann_e2e_out"); val ckpt = tmp("ann_e2e_ckpt")
    val ctx = load(spark, TestSpark.dir, state, withAnn = true, annMaxDist = 1e12)
    val twin = Tables.embeddings(spark, TestSpark.dir)
      .filter(col("vec_id") === 7L).select("embedding")
      .head.getSeq[Float](0).toArray
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocVecIn]
    val q = verdictsOf(ctx, stream.toDF(), out, ckpt)
    stream.addData(DocVecIn(5000100L, "s",
      "an arrival that rides the vector leg end to end", twin))
    q.processAllAvailable(); q.stop()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1)
    assert(rows.head.getBoolean(rows.head.fieldIndex("ann_dup")),
      "the advertised stream entrypoint must reach the ANN leg when arrivals carry embeddings")
  }

  test("checkpoint restart: stream killed between micro-batches recovers and reproduces the batch delta") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("rec_state"); val out = tmp("rec_out"); val ckpt = tmp("rec_ckpt")
    val ctx = load(spark, TestSpark.dir, state)
    val deltaDocs = Tables.documents(spark, TestSpark.dir)
      .filter(col("doc_id") % 16 === 0)
      .select("doc_id", "source", "text")
      .as[DocIn].collect().sortBy(_.doc_id)
    val (b1, rest) = deltaDocs.splitAt(deltaDocs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    // first incarnation: commit batch 0, then die
    val q1 = verdicts(ctx, stream.toDS(), out, ckpt)
    stream.addData(b1: _*); q1.processAllAvailable()
    q1.stop()
    // arrivals land while the stream is down
    stream.addData(b2: _*)
    // second incarnation resumes from the SAME checkpoint — offsets,
    // batchIds and the seen-store must all line up so the recovered
    // stream gates b2/b3 against exactly the history b1 absorbed
    val q2 = verdicts(ctx, stream.toDS(), out, ckpt)
    stream.addData(b3: _*); q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "source", "n_pass", "is_bench",
        "is_exact_dup", "is_near_dup", "contaminated", "stage")
      .collect().map(rowKey).sortBy(_._1).toSeq
    val want = operators.Curation.funnelDelta(spark, TestSpark.dir)
      .collect().map(rowKey).sortBy(_._1).toSeq
    assert(got == want,
      "a checkpoint-recovered stream must reproduce the batch delta funnel exactly")
  }

  test("at-least-once replay: re-delivered batch (incl. crash-mid-absorb) changes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val state = tmp("rep_state"); val out = tmp("rep_out"); val ckpt = tmp("rep_ckpt")
    val ctx = load(spark, TestSpark.dir, state)
    val deltaDocs = Tables.documents(spark, TestSpark.dir)
      .filter(col("doc_id") % 16 === 0)
      .select("doc_id", "source", "text")
      .as[DocIn].collect().sortBy(_.doc_id)
    val (b1, b2) = deltaDocs.splitAt(deltaDocs.length / 2)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = verdicts(ctx, stream.toDS(), out, ckpt)
    Seq(b1, b2).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    def snapshot() = (
      spark.read.parquet(out).collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(s"$state/hashes").collect().map(_.toString).sorted.toSeq,
      spark.read.parquet(s"$state/shingles").collect().map(_.toString).sorted.toSeq)
    val before = snapshot()
    // crash-mid-absorb: batch 1's shingle rows never landed — the
    // ugliest partial state a retry can find
    val shDir = new org.apache.hadoop.fs.Path(s"$state/shingles/batch=1")
    shDir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(shDir, true)
    // the foreachBatch body, re-delivered verbatim for batchId=1:
    // gate against batches < 1 only, overwrite the batch dirs
    val batch1 = b2.toSeq.toDF("doc_id", "source", "text")
    gateBatch(ctx, batch1, Some(1L))
      .write.mode("overwrite").parquet(s"$out/batch=1")
    absorb(ctx, batch1, 1L)
    assert(snapshot() == before,
      "replaying a batch over partial state must restore, not duplicate or drift")
  }

  test("full lifecycle: stop on a committed checkpoint, compact, reload, restart — verdicts unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t1 = "the quiet harbor sheltered a small fleet of wooden boats during rough " +
      "weather while fishermen mended their heavy nets beside tall stacks of salted crates " +
      "and seagulls circled above the narrow pier waiting for scraps every morning"
    val t2 = "the quick brown foxes jumped gracefully over a sleeping canine beside the " +
      "quiet riverbank while autumn leaves drifted slowly downward covering narrow pathways " +
      "with golden colors during early morning hours yesterday"
    val t3 = "distant mountains glowed under the pale morning light as shepherds guided " +
      "their flocks across dew covered meadows toward the stone walls of the old village " +
      "where bakers were already lighting their ovens before sunrise"
    val t16 = "carpenters assembled long oak beams inside the workshop while apprentices " +
      "sorted polished brass fittings into labeled wooden drawers near the open furnace " +
      "door as the morning bell rang across the cobbled courtyard outside"
    val t64 = "sailors hauled heavy coils of rope onto the weathered deck while the first " +
      "mate checked the charts against a brass compass and gulls screamed over the mast " +
      "in the gray light of an approaching autumn storm"
    val fdir = "/fake/funnel_lifecycle"
    // corpus: 3 old docs (not %16) + 4 delta docs (%16): 32 twins an
    // old doc, 48 twins an earlier delta arrival, 16/64 are fresh
    Tables.registerOverride(spark, fdir, "documents", Seq(
      (1L, "s", t1), (2L, "s", t2), (3L, "s", t3),
      (16L, "s", t16), (32L, "s", t2), (48L, "s", t16), (64L, "s", t64)
    ).toDF("doc_id", "source", "text"))
    val ipath = operators.Curation.FunnelIndex.path(spark, fdir)
    val ifs = new org.apache.hadoop.fs.Path(ipath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ifs.delete(new org.apache.hadoop.fs.Path(ipath), true)
    val state = tmp("lc_state"); val out = tmp("lc_out"); val ckpt = tmp("lc_ckpt")
    val docOf = Map(16L -> t16, 32L -> t2, 48L -> t16, 64L -> t64)
    def batch(ids: Long*) = ids.map(i => DocIn(i, "s", docOf(i)))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val ctx1 = load(spark, fdir, state)
    val q1 = verdicts(ctx1, stream.toDS(), out, ckpt)
    stream.addData(batch(16L, 32L): _*); q1.processAllAvailable()
    q1.stop() // stopped ON a committed checkpoint — compact's precondition
    compact(spark, ctx1)
    val foldedHashes = spark.read.parquet(s"$ipath/hashes").count()
    // a restart calls load() again: the folded index must read as
    // FRESH (foldStore keeps the watermark) — a rebuild here would
    // silently drop the absorbed arrivals from history
    val ctx2 = load(spark, fdir, state)
    assert(spark.read.parquet(s"$ipath/hashes").count() == foldedHashes,
      "load() after compaction must reuse the folded index, not rebuild from the corpus")
    val q2 = verdicts(ctx2, stream.toDS(), out, ckpt)
    stream.addData(batch(48L, 64L): _*); q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "source", "n_pass", "is_bench",
        "is_exact_dup", "is_near_dup", "contaminated", "stage")
      .collect().map(rowKey).sortBy(_._1).toSeq
    val want = operators.Curation.funnelDelta(spark, fdir)
      .collect().map(rowKey).sortBy(_._1).toSeq
    assert(got == want,
      "compact + reload + checkpoint-restart must leave the verdict stream ≡ batch funnelDelta")
    assert(got.count(_._8 == "exact_dup") >= 2,
      "the fixture must exercise both the folded-history and old-corpus dup paths")
    ifs.delete(new org.apache.hadoop.fs.Path(ipath), true)
  }

  test("ingest-time first-writer-wins: earlier ARRIVAL beats smaller doc_id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textGood = "the quiet harbor sheltered a small fleet of wooden boats during rough " +
      "weather while fishermen mended their heavy nets beside tall stacks of salted crates " +
      "and seagulls circled above the narrow pier waiting for scraps every morning"
    val textOld = "the quick brown foxes jumped gracefully over a sleeping canine beside the " +
      "quiet riverbank while autumn leaves drifted slowly downward covering narrow pathways " +
      "with golden colors during early morning hours yesterday"
    val dir = "/fake/funnel_stream_fww"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (1L, "s", textOld) // pre-existing corpus; no bench docs in this fixture
    ).toDF("doc_id", "source", "text"))
    val state = tmp("fww_state"); val out = tmp("fww_out"); val ckpt = tmp("fww_ckpt")
    val ctx = load(spark, dir, state)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocIn]
    val q = verdicts(ctx, stream.toDS(), out, ckpt)
    stream.addData(DocIn(160L, "s", textGood)); q.processAllAvailable() // first writer
    stream.addData(
      DocIn(16L, "s", textGood),  // smaller id, LATER arrival -> dup
      DocIn(32L, "s", textOld))   // twin of pre-existing corpus doc -> dup
    q.processAllAvailable()
    q.stop()
    val stages = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(stages(160L) == "admitted", "the first arrival owns the content")
    assert(stages(16L) == "exact_dup",
      "a later arrival is a dup of absorbed history even with a smaller doc_id")
    assert(stages(32L) == "exact_dup", "pre-existing corpus always beats an arrival")
  }
}
