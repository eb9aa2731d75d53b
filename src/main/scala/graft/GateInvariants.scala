package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus preconditions the graduated replay oracles stand on
  * (ADVICE r15). Two of the correctness gates are only as strong as
  * invariants of the GATE CORPORA, not of the operators:
  *
  *  1. q27's oracle is brute-force all-pairs Jaccard at 0.5, so the
  *     8×4 MinHash banding must have PERFECT recall on the corpus.
  *     Recovery is deterministic for fixed texts + the fixed hash
  *     family, but NOT implied by the jac level alone: the sf0.1
  *     corpus holds two true pairs in the [0.5, 0.9) danger band
  *     (j=0.889, j=0.818 — a-priori miss risk up to ~1%) that the
  *     banding happens to recover. `check` therefore verifies
  *     recovery DIRECTLY (runs the banding, anti-joins the exact
  *     pair set): a datagen drift that flips recovery fails here
  *     with the missed pairs named, instead of as an opaque q27
  *     row-count mismatch.
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
    * probability is no longer negligible (~40% a-priori at j=0.5,
    * ~1% at j=0.82). The sf0.1 corpus DOES hold such pairs (two, at
    * j=0.889 and j=0.818, found by this check's first run) — q27
    * passes there because the fixed 8×4 banding happens to recover
    * them, which `check` verifies DIRECTLY per corpus below. */
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
    val danger = jaccardDangerPairs(spark, dir).limit(100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    if (danger.nonEmpty) {
      // Recovery checked DIRECTLY, not assumed from the jac level:
      // run the operator's own banding and see which danger pairs it
      // pairs. Recovery is deterministic for fixed texts + the fixed
      // hash family, so "recovered today" holds until the datagen
      // changes — exactly the drift this pre-flight exists to name.
      val banded = operators.Dedup.dedupMinHash(spark, dir, threshold = 0.5)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = danger.filterNot(p => banded((p._1, p._2)))
      def fmt(ps: Seq[(Long, Long, Double)]) =
        ps.take(5).map(p => s"(${p._1},${p._2})@${p._3}").mkString(" ")
      if (missed.nonEmpty)
        msgs += s"GATE INVARIANT VIOLATED: ${missed.length} true Jaccard " +
          s"pair(s) in [0.5,0.9) on $dir are MISSED by the 8x4 MinHash " +
          s"banding, e.g. ${fmt(missed.toSeq)} — q27's brute-force oracle " +
          "counts them, so q27 WILL fail its row compare on this corpus " +
          "(datagen drift flipped banding recovery, not an operator bug)."
      else
        System.err.println(s"[gate-note] ${danger.length} true Jaccard " +
          s"pair(s) in [0.5,0.9) on $dir (${fmt(danger.toSeq)}) are all " +
          "RECOVERED by the current 8x4 banding (deterministic for fixed " +
          "corpus+hashes); a datagen change can flip recovery — if q27 " +
          "row-counts ever mismatch here, check these pairs first.")
    }
    msgs.toSeq
  }
}
