package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins operators.Curation.funnelDelta (q79): the nightly-delta
  * funnel's FIRST-WRITER-WINS ingest semantics and its delta-only
  * output contract.
  *
  * The partner rules under test (Curation.scala funnelDelta):
  *   - an OLD corpus twin (any id, non-delta) always beats a delta
  *     arrival — history is immutable;
  *   - within the delta batch, the EARLIER doc_id wins — its later
  *     twin stages out, the earlier one sails through;
  *   - only delta docs (doc_id ≡ 0 mod deltaMod) receive verdicts.
  *
  * Fixture texts are built so every blocking decision is decidable by
  * hand: shingles() emits lexicographically SORTED bigram strings and
  * funnelDelta blocks on element_at(sh, 1), so each near-dup pair
  * shares its lexicographic-min bigram by construction ("a gentle" /
  * "a remarkable" survive the one-word edits).
  */
class FunnelDeltaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ≥30 words, contains "the" and "a", sane mean length, all-alpha,
  // no bullets/ellipsis/# → all 7 gopher rules pass (n_pass = 7).
  private val textA = "the ancient library held a remarkable collection containing thousands of " +
    "leather volumes arranged carefully along wooden shelves where scholars gathered the " +
    "quiet evenings studying forgotten manuscripts about distant kingdoms while candles " +
    "flickered gently casting shadows across marble floors"
  private val textB = "the quick brown foxes jumped gracefully over a sleeping canine beside the " +
    "quiet riverbank while autumn leaves drifted slowly downward covering narrow pathways " +
    "with golden colors during early morning hours yesterday"
  private val textC = "the quiet harbor sheltered a small fleet of wooden boats during rough " +
    "weather while fishermen mended their heavy nets beside tall stacks of salted crates " +
    "and seagulls circled above the narrow pier waiting for scraps every morning"
  private val textD = "a gentle storm crossed the valley before dawn bringing steady rainfall " +
    "across scattered farms while villagers prepared warm meals inside stone cottages and " +
    "watched distant lightning illuminate rolling hills beyond the ancient bridge near quiet meadows"
  private val textE = "the old observatory stood upon a windswept ridge where astronomers " +
    "tracked wandering comets through polished brass instruments during clear winter nights " +
    "while students recorded careful measurements inside leather journals beside glowing " +
    "lanterns and copper kettles whistled softly near the wooden staircase"
  // first 16 words of A (≥30% of its 3-grams leak from the bench doc)
  // + fresh tail → contaminated, but bigram Jaccard vs A ≈ 0.25 < 0.5
  // so NOT a near-dup
  private val textHalfA = textA.split(" ").take(16).mkString(" ") + " travelers sought refuge " +
    "inside sturdy buildings during heavy storms which arrived suddenly from northern " +
    "mountains every winter"

  test("funnelDelta: first-writer-wins partner rules, gate order, delta-only output") {
    val dir = "/fake/funnel_delta"
    Tables.registerOverride(spark, dir, "documents", Seq(
      // corpus (non-delta; never receives a verdict)
      (1L, "s", textB),                         // old twin of delta doc 16
      (2L, "s", textD),                         // old near-partner of delta doc 64
      (97L, "s", textA),                        // benchmark (97 % 97 == 0)
      // delta batch (doc_id ≡ 0 mod 16)
      (0L, "s", "benchmark evaluation suite item covering arithmetic reasoning puzzles"), // bench AND delta
      (16L, "s", textB),                        // exact twin of OLD doc 1 → history wins
      (32L, "s", textC),                        // earlier delta twin → admitted
      (48L, "s", textC),                        // later delta twin of 32 → exact_dup
      (64L, "s", textD.replace("meadows", "pastures")), // near-dup of OLD doc 2 (jac 34/36)
      (80L, "s", "tiny text"),                  // fails quality (n_pass < 6)
      (96L, "s", textHalfA),                    // bench 3-gram leak → contaminated
      (112L, "s", textE)                        // fresh → admitted
    ).toDF("doc_id", "source", "text"))
    val r = operators.Curation.funnelDelta(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getString(7)).toMap
    assert(r == Map(
      0L -> "benchmark",
      16L -> "exact_dup",   // old twin (doc 1) beats the arrival
      32L -> "admitted",    // its only twin (48) is a LATER delta id
      48L -> "exact_dup",   // earlier delta twin (32) wins
      64L -> "near_dup",    // old doc 2 at Jaccard ≈ 0.94
      80L -> "quality",
      96L -> "contaminated",
      112L -> "admitted"),
      "verdicts must follow first-writer-wins + canonical gate order")
    assert(!r.keySet.exists(_ % 16 != 0), "output is delta-only: corpus docs get no verdict")
  }

  test("funnelDelta laws on the real corpus") {
    val rows = operators.Curation.funnelDelta(spark, TestSpark.dir).collect()
    val deltaCount = Tables.documents(spark, TestSpark.dir)
      .filter(col("doc_id") % 16 === 0).count()
    assert(rows.length == deltaCount, "every delta doc gets exactly one verdict; nothing else does")
    // the verdict is exactly the first failing gate in canonical order
    // — a pure function of the flag columns
    rows.foreach { x =>
      val expect =
        if (x.getBoolean(3)) "benchmark"
        else if (x.getInt(2) < 6) "quality"
        else if (x.getBoolean(4)) "exact_dup"
        else if (x.getBoolean(5)) "near_dup"
        else if (x.getBoolean(6)) "contaminated"
        else "admitted"
      assert(x.getString(7) == expect, s"stage mismatch for doc ${x.getLong(0)}")
    }
    assert(rows.map(_.getString(7)).toSet.contains("admitted"),
      "the delta funnel must admit something at sf0.001")
  }
}
