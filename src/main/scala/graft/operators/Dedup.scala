package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for LLM-pipeline workloads (SURVEY.md §2 D).
  *
  * The reference's near-duplicate surface is embedding-cosine
  * clustering (vector_store.py similarity search + TextPreprocessor
  * segment merging); this family adds the standard scale paths:
  * exact (hash), n-gram Jaccard, MinHash-LSH, SimHash, and
  * embedding-cosine blocking.
  *
  * Scale design: nothing here is O(n²) on the corpus. Every
  * candidate generator is a shuffle keyed on a block id (min-shingle,
  * LSH band bucket, simhash band, label) so only same-block rows
  * meet; exact verification runs on candidates only. Block keys are
  * hash-derived ⇒ near-uniform ⇒ skew-safe; AQE handles stragglers.
  */
object Dedup {

  /** tokens / distinct bigram shingles of the text column. A
    * single-token or empty doc has NO bigrams: without the guard,
    * sequence(1, 0) yields descending [1, 0] and ANSI element_at
    * throws on index 0. Empty-shingle docs are filtered out of every
    * candidate generator below (no shingles ⇒ can never pair; the
    * DuckDB oracle drops them the same way via its NULL block key).
    */
  private val tokens: Column = split(col("text"), " ")
  private val shingles: Column =
    when(size(tokens) >= 2,
      array_distinct(transform(sequence(lit(1), size(tokens) - 1),
        i => concat(element_at(tokens, i), lit(" "), element_at(tokens, i + 1)))))
      .otherwise(array().cast("array<string>"))

  /** q25: exact dedup with survivors — group identical texts by
    * content hash, keep min doc_id (the classic first-writer-wins).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep_doc_id"))
      .orderBy("keep_doc_id")

  /** q26: n-gram Jaccard near-dup pairs, blocked on the
    * lexicographic min shingle (a 1-permutation MinHash with the
    * identity hash — engine-independent, so oracle-exact). Pairs in
    * the same block with bigram-set Jaccard ≥ threshold.
    */
  private[operators] case class DocShingles(doc_id: Long, sh: Array[String], blk: String)
  private[operators] case class NgramPair(doc_a: Long, doc_b: Long, jac: Double)

  def dedupNgram(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    // Each doc's shingle array shuffles ONCE to its block and all
    // candidate pairs form in-memory per block — a self-join instead
    // duplicates every array into every candidate pair row (observed
    // ~126x shuffle amplification at sf0.1). Blocks are bounded (docs
    // sharing one min-shingle); the linear merge keeps a pair O(|sh|).
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), array_sort(shingles).as("sh"))
      .filter(size(col("sh")) > 0)                 // degenerate docs can't pair
      .withColumn("blk", element_at(col("sh"), 1)) // min shingle of a sorted array
      .as[DocShingles]
    sh.groupByKey(_.blk)
      .flatMapGroups { (_, it) =>
        val docs = it.toArray.sortBy(_.doc_id)
        for {
          i <- docs.indices.iterator
          j <- (i + 1 until docs.length).iterator
          a = docs(i); b = docs(j)
          c = sortedIntersectCount(a.sh, b.sh)
          jac = roundHalfUp6(c.toDouble / (a.sh.length + b.sh.length - c))
          if jac >= threshold
        } yield NgramPair(a.doc_id, b.doc_id, jac)
      }
      .toDF("doc_a", "doc_b", "jac")
      .orderBy("doc_a", "doc_b")
  }

  /** Linear merge count over two sorted string arrays (JVM twin of
    * functions.IntersectCountSorted, for typed group processing).
    */
  private def sortedIntersectCount(x: Array[String], y: Array[String]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      val cmp = x(i).compareTo(y(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 } else if (cmp < 0) i += 1 else j += 1
    }
    c
  }

  /** Matches Spark round() / DuckDB round(): HALF_UP at 6dp. */
  private def roundHalfUp6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** q27: MinHash-LSH near-dup pairs. k=32 permutations, 8 bands × 4
    * rows: docs sharing any band bucket become candidates, then exact
    * Jaccard ≥ threshold verifies (no false positives survive; band
    * recall at j=0.5 is 1-(1-0.5^4)^8 ≈ 0.4, j=0.9 ≈ 0.998 — tuned
    * for "catch true near-dups"). Engine-internal hashes ⇒ rows-only
    * oracle; q26 cross-checks the Jaccard math.
    */
  private[operators] case class BandedDoc(doc_id: Long, sh: Array[String], band: Int, bucket: String)

  def dedupMinHash(spark: SparkSession, dir: String, threshold: Double = 0.5,
                   k: Int = 32, bands: Int = 8): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = k / bands
    // same shape as dedupNgram: shingles shuffle once per (doc, band)
    // — a banded self-join would duplicate them into every candidate
    // pair. A pair colliding in several bands gets identical jac;
    // dropDuplicates keeps one.
    val banded = Tables.documents(spark, dir)
      .select(col("doc_id"), array_sort(shingles).as("sh"))
      .filter(size(col("sh")) > 0)                 // degenerate docs can't pair
      .withColumn("sig", expr(s"minhash(sh, $k)"))
      .select(col("doc_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))).as(Seq("band", "bucket")))
      .as[BandedDoc]
    banded.groupByKey(d => (d.band, d.bucket))
      .flatMapGroups { (_, it) =>
        val docs = it.toArray.sortBy(_.doc_id)
        for {
          i <- docs.indices.iterator
          j <- (i + 1 until docs.length).iterator
          a = docs(i); b = docs(j)
          c = sortedIntersectCount(a.sh, b.sh)
          jac = roundHalfUp6(c.toDouble / (a.sh.length + b.sh.length - c))
          if jac >= threshold
        } yield NgramPair(a.doc_id, b.doc_id, jac)
      }
      .toDF("doc_a", "doc_b", "jac")
      .dropDuplicates("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** q28: SimHash near-dup pairs — 64-bit sketch, candidates blocked
    * on any of four 16-bit bands (two docs within Hamming ≤ 3 must
    * agree on ≥1 band), verified by exact Hamming ≤ maxDist.
    * Rows-only oracle (hash bits are engine-internal).
    */
  private[operators] case class SimBanded(doc_id: Long, sig: Long, band: Int, bucket: Long)
  private[operators] case class SimPair(doc_a: Long, doc_b: Long, hamming: Int)

  def dedupSimHash(spark: SparkSession, dir: String, maxDist: Int = 16): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    // same per-group shape as dedupNgram/dedupMinHash: one shuffled
    // row per (doc, band); pairs verify in-memory per bucket
    val banded = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles.as("sh"))
      .filter(size(col("sh")) > 0)                 // degenerate docs can't pair
      .withColumn("sig", expr("simhash(sh)"))
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bucket", expr("shiftrightunsigned(sig, band * 16) & 65535"))
      .select("doc_id", "sig", "band", "bucket")
      .as[SimBanded]
    banded.groupByKey(d => (d.band, d.bucket))
      .flatMapGroups { (_, it) =>
        val docs = it.toArray.sortBy(_.doc_id)
        for {
          i <- docs.indices.iterator
          j <- (i + 1 until docs.length).iterator
          a = docs(i); b = docs(j)
          h = java.lang.Long.bitCount(a.sig ^ b.sig)
          if h <= maxDist
        } yield SimPair(a.doc_id, b.doc_id, h)
      }
      .toDF("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** q29: embedding-cosine near-dup pairs, blocked by label (at scale
    * the block key is an IVF cell / LSH bucket of the vector, same
    * join shape). Oracle-exact: cosine is bit-identical to DuckDB.
    */
  def dedupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.3): DataFrame = {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(expr("cosine_sim(a.embedding, b.embedding)"), 6))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.label").as("label"), col("sim"))
      .orderBy("vec_a", "vec_b")
  }
}
