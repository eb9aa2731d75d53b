package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.Curation
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming decontamination gate — the online twin of q54/q54b: a
  * crawl/ingest stream is screened against a FROZEN benchmark gram
  * set before anything lands in the training corpus (the point in the
  * pipeline where decontamination actually wants to run: at ingest,
  * not as a nightly batch over data already mixed in).
  *
  * Same two-phase exactness as the batch q54b
  * (operators/Curation.decontaminateBloom):
  *
  *   1. SCREEN (map-side, zero state): every arriving gram tests
  *      against the benchmark's broadcast Bloom filter — no false
  *      negatives, so nothing contaminated can slip; the clean bulk
  *      of the stream dies in the stateless projection.
  *   2. VERIFY (exact): bloom-positive grams stream-static join the
  *      exact gram frame; counts come from verified hits only, so
  *      the fpp sliver of false positives is eliminated and the
  *      output is EXACT — identical to running batch q54 over the
  *      same documents (spec-pinned).
  *
  * The per-doc rollup is a flatMapGroupsWithState keyed by doc_id
  * (the corpusGate pattern): documents arrive whole within a
  * micro-batch (the ingest contract), state is ONE boolean seen-guard
  * per doc_id — constant bytes, evictable by timeout in a production
  * deployment. The same code path runs on a batch frame (Spark
  * executes mapGroupsWithState statelessly there), which is what the
  * stream ≡ batch spec leans on.
  */
object DecontamStream {

  /** Frozen benchmark side: the exact distinct-gram frame (persisted
    * — it is read by every micro-batch's verify join) plus its Bloom
    * sketch for the map-side screen.
    */
  case class BenchIndex(bench: DataFrame, bloom: Array[Byte])

  case class DecontamOut(doc_id: Long, n_grams: Int, n_overlap: Long,
                         rate: Option[Double], contaminated: Boolean)

  def loadBench(spark: SparkSession, dir: String,
                benchMod: Int = 97, fpp: Double = 0.01): BenchIndex = {
    GraftFunctions.register(spark)
    val bench = Curation.docGrams3(spark, dir)
      .filter(col("doc_id") % benchMod === 0)
      .select(explode(col("g3")).as("g")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    BenchIndex(bench, Curation.bloomBytesFor(bench, fpp))
  }

  /** Gate a (doc_id, text) frame — batch or stream, one code path. */
  def gate(idx: BenchIndex, docs: DataFrame,
           threshold: Double = 0.3): Dataset[DecontamOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val withG = Curation.grams3(docs)
    // every doc carries one NULL-gram sentinel row that passes the
    // screen unconditionally, so an all-clean doc still reaches the
    // rollup with n_overlap 0 (q54b's sentinel discipline)
    val screened = withG
      .select(col("doc_id"), size(col("g3")).as("n_grams"),
        explode_outer(concat(col("g3"), array(lit(null).cast("string")))).as("g"))
      .filter(col("g").isNull ||
        call_function("bloom_might_contain", lit(idx.bloom), xxhash64(col("g"))))
      .join(broadcast(idx.bench.withColumn("hit", lit(1))), Seq("g"), "left")
    screened
      .groupByKey(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_grams")))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Int), it: Iterator[org.apache.spark.sql.Row],
         state: GroupState[Boolean]) =>
          if (state.exists) { it.foreach(_ => ()); Iterator.empty }
          else {
            state.update(true)
            val nOverlap = it.count(r => !r.isNullAt(r.fieldIndex("hit"))).toLong
            val rate = if (key._2 > 0) Some(nOverlap.toDouble / key._2) else None
            Iterator.single(DecontamOut(key._1, key._2, nOverlap,
              rate, rate.exists(_ >= threshold)))
          }
      }
  }
}
