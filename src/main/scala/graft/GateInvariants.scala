package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus preconditions the graduated replay oracles stand on
  * (ADVICE r15). Two of the correctness gates are only as strong as
  * invariants of the GATE CORPORA, not of the operators:
  *
  *  1. q27's oracle is brute-force all-pairs Jaccard at 0.5, so the
  *     8×4 MinHash banding must have PERFECT recall on the corpus.
  *     That holds (and is verified bit-exactly per SF) only because
  *     every true pair sits at jac ≥ 0.9, where per-pair band-miss
  *     probability is ≤ ~2e-4; a datagen drift that introduces a
  *     pair in the 0.5 ≤ jac < 0.9 band would fail the gate as an
  *     opaque row-count mismatch even though the operator behaves
  *     as designed.
  *  2. q28/q33/q34/q49's DuckDB replays hash ord(codepoint) per character
  *     while the Scala side hashes UTF-8 bytes (q28 FNV, q33
  *     fingerprint, q34 byte-statistics decode) or UTF-16 units (q49 hashCode); the spellings
  *     agree iff the text is pure ASCII. A non-ASCII document would
  *     surface as an opaque signature mismatch.
  *
  * `check` turns both drift classes into TARGETED messages: Verify
  * runs it as a pre-flight whenever a gate query is in the requested
  * set, and GateInvariantsSpec pins it per round at sf0.001. The
  * band check reuses q40's exact PPJoin all-pairs join — a second,
  * independently oracle-certified algorithm, so the invariant is not
  * vouched for by the operator it guards.
  */
object GateInvariants {
  /** Queries whose oracles depend on these corpus invariants. */
  val gateQueries: Set[String] =
    Set("q27_dedup_minhash", "q28_dedup_simhash", "q33_fingerprint",
        "q34_media_pipeline", "q49_text_encode")

  /** Non-ASCII documents break the q28/q33/q34/q49 byte-vs-codepoint
    * replay equivalence. ASCII ⟺ octet_length == char_length. */
  def nonAsciiDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(octet_length(col("text")) =!= length(col("text")))
      .select("doc_id")

  /** True pairs in the banding-recall danger band [0.5, 0.9):
    * pairs the q27 oracle counts but whose per-pair band-miss
    * probability is no longer negligible (~40% a-priori at j=0.5). */
  def jaccardDangerPairs(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.dedupAllPairs(spark, dir, threshold = 0.5)
      .filter(col("jac") < 0.9)

  /** Empty = all invariants hold; otherwise one targeted message per
    * violated invariant, naming the gate queries it invalidates. */
  def check(spark: SparkSession, dir: String): Seq[String] = {
    val msgs = scala.collection.mutable.ArrayBuffer[String]()
    val nonAscii = nonAsciiDocs(spark, dir).limit(5).collect().map(_.getLong(0))
    if (nonAscii.nonEmpty)
      msgs += s"GATE INVARIANT VIOLATED: non-ASCII text in documents ($dir), " +
        s"e.g. doc_id ${nonAscii.mkString(",")} — the q28/q33/q34/q49 replay " +
        "oracles hash codepoints while the engine hashes UTF-8/UTF-16 " +
        "units; expect signature mismatches on those gates (datagen " +
        "drift, not an operator bug)."
    val danger = jaccardDangerPairs(spark, dir).limit(5).collect()
      .map(r => s"(${r.getLong(0)},${r.getLong(1)})@${r.getDouble(2)}")
    if (danger.nonEmpty)
      msgs += s"GATE INVARIANT VIOLATED: true Jaccard pairs in [0.5,0.9) " +
        s"on $dir, e.g. ${danger.mkString(" ")} — q27's brute-force oracle " +
        "requires PERFECT 8x4 MinHash banding recall, which is only " +
        "negligible-risk for pairs at jac >= 0.9; a q27 row-count mismatch " +
        "on this corpus is datagen drift, not an operator bug."
    msgs.toSeq
  }
}
