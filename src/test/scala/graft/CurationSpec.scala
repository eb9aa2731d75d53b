package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins operators.Curation: planted benchmark contamination, planted
  * PII redaction, the greedy packing fold (hand-computed pack ids,
  * lang-boundary reset, oversized docs), integer-rarity term scores,
  * and stratified-sample determinism + threshold honesty.
  *
  * Synthetic inputs ride Tables.registerOverride under fake dir keys
  * (the bench's shared-table mechanism), so the operators' real
  * dir-bound entries are what runs.
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("decontaminate flags a planted benchmark leak and nothing else") {
    val dir = "/fake/curation_decontam"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "alpha beta gamma delta epsilon"), // benchmark (0 % 97 == 0)
      (97L, "zeta eta theta"),                // benchmark too (97 % 97 == 0)
      (1L, "alpha beta gamma delta epsilon"), // identical to bench doc 0 -> rate 1
      (2L, "one two three four five six"),    // disjoint -> rate 0
      (3L, "hi there")                        // < 3 tokens -> no grams
    ).toDF("doc_id", "text"))
    val r = operators.Curation.decontaminate(spark, dir)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(0L) && !r.contains(97L), "benchmark docs are not scored")
    assert(r(1L).getBoolean(4) && r(1L).getDouble(3) == 1.0, "a verbatim bench doc must be fully contaminated")
    assert(!r(2L).getBoolean(4) && r(2L).getLong(2) == 0L)
    assert(r(3L).getInt(1) == 0 && r(3L).isNullAt(3) && !r(3L).getBoolean(4),
      "a gram-less doc has NULL rate and is not flagged")
  }

  test("decontaminateBloom == decontaminate row-for-row (screen has no false negatives)") {
    // the Bloom screen must change the PLAN (map-side kill of clean
    // grams before any join), never the ANSWER: exact equality on
    // the real testdata, including NULL-rate gram-less docs
    val exact = operators.Curation.decontaminate(spark, TestSpark.dir).collect().toSeq
    val bloom = operators.Curation.decontaminateBloom(spark, TestSpark.dir).collect().toSeq
    assert(bloom == exact, "bloom screen + exact verify must equal the exact path")
    assert(exact.nonEmpty)
    // and at a deliberately terrible fpp the verify phase still
    // eliminates every false positive the screen lets through
    val sloppy = operators.Curation.decontaminateBloom(spark, TestSpark.dir, fpp = 0.5)
      .collect().toSeq
    assert(sloppy == exact, "false positives must die in the verify join at any fpp")
  }

  test("decontamFuzzy recovers verbatim hits and breaks best-bench ties by min id") {
    val dir = "/fake/curation_fuzzy"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "alpha beta gamma delta epsilon"),  // bench; 0 % 194 == 0 -> planted at 1000000
      (97L, "alpha beta gamma delta epsilon"), // bench, same text -> tie for best_bench_id
      (1L, "alpha beta gamma delta epsilon"),  // corpus verbatim hit on BOTH bench docs
      (2L, "one two three four five"),         // clean
      (3L, "hi")                               // < 2 tokens: no shingles, absent
    ).toDF("doc_id", "text"))
    val r = operators.Curation.decontamFuzzy(spark, dir)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 1000000L), "bench docs, clean docs and shingle-less docs are absent")
    // identical signatures guarantee banding recovery; both bench
    // docs match at jac 1.0 and the tie resolves to MIN bench_id
    for (id <- Seq(1L, 1000000L)) {
      assert(r(id).getLong(1) == 2, "both bench copies must match")
      assert(r(id).getDouble(2) == 1.0)
      assert(r(id).getLong(3) == 0L, "jac tie must resolve to the smaller bench_id")
    }
  }

  test("decontamFuzzy laws on the real corpus") {
    val rows = operators.Curation.decontamFuzzy(spark, TestSpark.dir).collect()
    assert(rows.forall(_.getLong(0) % 97 != 0), "no bench doc may appear in the output")
    assert(rows.forall(x => x.getLong(1) >= 1 && x.getDouble(2) >= 0.5))
    // every planted bench copy (certain recovery: identical
    // signatures) surfaces with a perfect score
    val plantable = Tables.documents(spark, TestSpark.dir)
      .filter(col("doc_id") % 194 === 0 && size(split(col("text"), " ")) >= 2)
      .select("doc_id").collect().map(_.getLong(0) + 1000000L).toSet
    assert(plantable.nonEmpty)
    val byId = rows.map(x => x.getLong(0) -> x).toMap
    for (id <- plantable) {
      assert(byId.contains(id), s"planted copy $id must be recovered")
      assert(byId(id).getDouble(2) == 1.0)
    }
  }

  test("curationFunnel assigns each doc its first failing gate in the canonical order") {
    val dir = "/fake/curation_funnel"
    // two "good" texts (≥30 words, stopwords, sane lengths → all 7
    // gopher rules pass): A for the bench side, B for the corpus
    val textA = "the ancient library held a remarkable collection containing thousands of " +
      "leather volumes arranged carefully along wooden shelves where scholars gathered the " +
      "quiet evenings studying forgotten manuscripts about distant kingdoms while candles " +
      "flickered gently casting shadows across marble floors"
    val textB = "the quick brown foxes jumped gracefully over a sleeping canine beside the " +
      "quiet riverbank while autumn leaves drifted slowly downward covering narrow pathways " +
      "with golden colors during early morning hours yesterday"
    // doc 5: first 16 words of A (≥30% of its own 3-grams leak from
    // the bench doc) + fresh tail → contaminated but NOT a near-dup
    // (bigram Jaccard vs A ≈ 0.27 < 0.5)
    val textHalfA = textA.split(" ").take(16).mkString(" ") + " travelers sought refuge " +
      "inside sturdy buildings during heavy storms which arrived suddenly from northern " +
      "mountains every winter"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "s", textA),                                             // benchmark
      (1L, "s", textB),                                             // kept (hkey 489905 < boundary)
      (2L, "s", textB),                                             // exact dup of 1
      (3L, "s", "tiny text"),                                       // quality (n_pass 3)
      (4L, "s", textB.replace("yesterday", "tonight")),             // near-dup of 1, not exact
      (5L, "s", textHalfA)                                          // contaminated
    ).toDF("doc_id", "source", "text"))
    val r = operators.Curation.curationFunnel(spark, dir)
      .collect().map(x => x.getLong(0) -> x.getString(8)).toMap
    assert(r == Map(0L -> "benchmark", 1L -> "kept", 2L -> "exact_dup",
      3L -> "quality", 4L -> "near_dup", 5L -> "contaminated"))
  }

  test("q77b gram routes are row-identical: driver sorted-merge vs Bloom screen + verify") {
    // maxDriverGrams = 1 forces the above-bound route (Bloom screen +
    // exact verify join, no driver gram collect); the default takes
    // the sorted-merge literal path. Same rows bit-for-bit, or the
    // size routing changed semantics (VERDICT r18 item 5).
    val fast = operators.Curation.curationFunnelOneScan(spark, TestSpark.dir)
    val bloom = operators.Curation.curationFunnelOneScan(spark, TestSpark.dir,
      maxDriverGrams = 1)
    assert(fast.exceptAll(bloom).count() == 0 && bloom.exceptAll(fast).count() == 0,
      "both gram routes must produce identical funnel verdicts")
  }

  test("curationFunnel laws on the real corpus") {
    val rows = operators.Curation.curationFunnel(spark, TestSpark.dir).collect()
    assert(rows.length == Tables.documents(spark, TestSpark.dir).count(),
      "every document gets a verdict")
    // the verdict is exactly the first failing gate in order — a
    // pure function of the flag columns
    rows.foreach { x =>
      val expect =
        if (x.getBoolean(3)) "benchmark"
        else if (x.getInt(2) < 6) "quality"
        else if (x.getBoolean(4)) "exact_dup"
        else if (x.getBoolean(5)) "near_dup"
        else if (x.getBoolean(6)) "contaminated"
        else if (x.getBoolean(7)) "over_budget"
        else "kept"
      assert(x.getString(8) == expect, s"stage mismatch for doc ${x.getLong(0)}")
    }
    val stages = rows.map(_.getString(8)).toSet
    assert(stages.contains("kept") && stages.size >= 3,
      "the funnel must keep some docs and drop others for several reasons")
  }

  test("importanceSelect scores a hand-computed corpus exactly") {
    val dir = "/fake/curation_dsir"
    // targetMod=7 -> doc 0 is the target set; docs 1-3 are raw
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "alpha beta gamma"),  // target: grams {alpha beta, beta gamma}, nt=2
      (1L, "alpha beta gamma"),  // raw verbatim target copy -> maximally target-like
      (2L, "zeta eta theta"),    // raw, zero target-gram overlap
      (3L, "x")                  // raw, gram-less
    ).toDF("doc_id", "text"))
    val r = operators.Curation.importanceSelect(spark, dir).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L), "target docs are not scored")
    // nr=4; doc1: sum_t=2, sum_r=2 -> w = (2/2)/(2/4) = 2.0
    assert(r(1L).getLong(1) == 2 && r(1L).getLong(2) == 2 && r(1L).getLong(3) == 2)
    assert(r(1L).getDouble(4) == 2.0 && r(1L).getBoolean(5))
    // doc2 shares no gram with the target: w = 0, not selected
    assert(r(2L).getLong(2) == 0 && r(2L).getDouble(4) == 0.0 && !r(2L).getBoolean(5))
    // gram-less doc survives with n_grams 0, NULL weight, not selected
    assert(r(3L).getLong(1) == 0 && r(3L).isNullAt(4) && !r(3L).getBoolean(5))
  }

  test("importanceSelect laws on the real corpus") {
    val rows = operators.Curation.importanceSelect(spark, TestSpark.dir).collect()
    assert(rows.nonEmpty)
    // a raw doc's own occurrences count in c_r, so sum_r >= n_grams
    assert(rows.forall(x => x.getLong(3) >= x.getLong(1)))
    assert(rows.forall(x => x.getLong(0) % 7 != 0), "no target doc leaks into the output")
    // non-vacuous on the gate corpus: both selection outcomes occur
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("sourceOverlap computes a hand-checked pair matrix, zero pairs included") {
    val dir = "/fake/curation_overlap"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "srcA", "x y z"), // bigrams {x y, y z}
      (1L, "srcB", "x y q"), // bigrams {x y, y q}: shares {x y} with A
      (2L, "srcC", "m n")    // bigrams {m n}: disjoint from both
    ).toDF("doc_id", "source", "text"))
    val r = operators.Curation.sourceOverlap(spark, dir).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    assert(r.keySet == Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")),
      "every ordered pair appears, including zero-overlap ones")
    val ab = r(("srcA", "srcB"))
    assert(ab.getLong(2) == 2 && ab.getLong(3) == 2 && ab.getLong(4) == 1)
    assert(ab.getDouble(5) == 1.0 / 3.0)
    assert(r(("srcA", "srcC")).getLong(4) == 0 && r(("srcA", "srcC")).getDouble(5) == 0.0)
    assert(r(("srcB", "srcC")).getLong(4) == 0)
  }

  test("sourceOverlap laws on the real corpus") {
    val rows = operators.Curation.sourceOverlap(spark, TestSpark.dir).collect()
    assert(rows.length == 190, s"C(20,2) ordered source pairs: ${rows.length}")
    assert(rows.forall(x => x.getLong(4) <= math.min(x.getLong(2), x.getLong(3))),
      "shared vocabulary cannot exceed either side")
    assert(rows.forall(x => x.getDouble(5) >= 0.0 && x.getDouble(5) <= 1.0))
    // the synthetic sources draw from one shared vocabulary: overlap
    // must be non-vacuous
    assert(rows.exists(_.getLong(4) > 0))
  }

  test("boilerplateSpans cuts hand-checked spans, merges overlaps, passes clean docs through") {
    val dir = "/fake/curation_boiler"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "srcA", "a b c d e"),       // "a b c" at pos 0 -> covers {0,1,2}, keeps "d e"
      (1L, "srcA", "x a b c y"),       // "a b c" at pos 1 -> covers {1,2,3}, keeps "x y"
      (2L, "srcB", "m n"),             // < k tokens: no grams, untouched
      (3L, "srcB", "a b c a b c z"),   // starts {0,3} -> covered {0..5} merged, keeps "z"
      (4L, "srcB", "q r s t")          // grams all unique: untouched
    ).toDF("doc_id", "source", "text"))
    val r = operators.Curation.boilerplateSpans(spark, dir, k = 3, minDocs = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 5, "one row per document, including gram-less ones")
    assert(r(0L).getInt(2) == 5 && r(0L).getInt(3) == 3 && r(0L).getString(4) == "d e")
    assert(r(1L).getInt(3) == 3 && r(1L).getString(4) == "x y")
    assert(r(2L).getInt(3) == 0 && r(2L).getString(4) == "m n")
    assert(r(3L).getInt(2) == 7 && r(3L).getInt(3) == 6 && r(3L).getString(4) == "z",
      "overlapping spans merge: covered positions are a SET, not a sum")
    assert(r(4L).getInt(3) == 0 && r(4L).getString(4) == "q r s t")
  }

  test("boilerplateSpans laws on the real corpus") {
    val rows = operators.Curation.boilerplateSpans(spark, TestSpark.dir).collect()
    assert(rows.length == 500, "one row per document")
    assert(rows.forall(x => x.getInt(3) >= 0 && x.getInt(3) <= x.getInt(2)),
      "coverage is bounded by document length")
    // the rewrite is positional: kept tokens == n_tokens - n_covered
    assert(rows.forall { x =>
      val kept = if (x.getString(4).isEmpty) 0 else x.getString(4).split(" ").length
      kept == x.getInt(2) - x.getInt(3)
    })
    // non-vacuous at gate scale: boilerplate exists AND clean docs exist
    assert(rows.exists(_.getInt(3) > 0) && rows.exists(_.getInt(3) == 0))
  }

  test("tokenBudget fills best bins first, samples the boundary, stops at budget") {
    val dir = "/fake/curation_budget"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "s", "aaaaa bbbbb ccccc ddddd"),  // wc 4, all rules pass -> bin 7
      (1L, "s", "aaaaa bbbbb ccccc"),        // wc 3, bin 7
      (2L, "s", "aaaaa bbbbb"),              // wc 2 < minWords -> bin 6
      (3L, "s", "aaaaa"),                    // wc 1 -> bin 6
      (4L, "u", "aaaaa bbbbb ccccc ddddd"),  // u: one 8-token bin-7
      (5L, "u", "eeeee fffff ggggg hhhhh"),
      (6L, "v", "aaaaa bbbbb ccccc"),        // v: bin 7 fits budget exactly
      (7L, "v", "aaaaaaaaaaaa bbbbbbbbbbbb cccccccccccc") // mean len 12 > 10 -> bin 6
    ).toDF("doc_id", "source", "text"))
    val r = operators.Curation.tokenBudget(spark, dir, budgetPct = 50,
        minWords = 3L, minStopwords = 0L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 8, "every doc appears with its decision")
    assert(r(0L).getInt(3) == 7 && r(2L).getInt(3) == 6 && r(7L).getInt(3) == 6, "rule-pass bins")
    // source s (tot 10, budget 5): bin 7 (7 tokens) is the boundary ->
    // hash sampling at rate 5/7 keeps both docs (hkeys 0, 489905);
    // bin 6 starts past the budget -> dropped outright
    assert(r(0L).getBoolean(4) && r(1L).getBoolean(4))
    assert(!r(2L).getBoolean(4) && !r(3L).getBoolean(4))
    // source u (tot 8, budget 4): single boundary bin at rate 1/2 ->
    // exactly the doc whose hkey clears the rule (911044 no, 352373 yes)
    assert(!r(4L).getBoolean(4) && r(5L).getBoolean(4))
    // source v (tot 6, budget 3): best bin fits exactly (keep_all),
    // the next bin's remaining budget is 0
    assert(r(6L).getBoolean(4) && !r(7L).getBoolean(4))
  }

  test("tokenBudget laws on the real corpus") {
    val rows = operators.Curation.tokenBudget(spark, TestSpark.dir).collect()
    assert(rows.length == 500, "one decision per document")
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "a 50% budget must split the corpus")
    // the fill is top-down: every bin strictly better than a bin with
    // a kept doc is keep_all, so above the minimum kept n_pass of a
    // source there are no drops
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val keptPass = rs.filter(_.getBoolean(4)).map(_.getInt(3))
      if (keptPass.nonEmpty) {
        val m = keptPass.min
        assert(rs.filter(_.getInt(3) > m).forall(_.getBoolean(4)),
          s"source $src drops a doc above its boundary bin")
      }
    }
  }

  test("piiScrub counts and redacts exactly the planted PII") {
    val dir = "/fake/curation_pii"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "plain words here"),   // 0 mod everything -> all three planted
      (1L, "no pii at all")
    ).toDF("doc_id", "text"))
    val r = operators.Curation.piiScrub(spark, dir).collect().map(x => x.getLong(0) -> x).toMap
    val c0 = r(0L)
    assert(c0.getInt(1) == 1 && c0.getInt(2) == 1 && c0.getInt(3) == 1)
    val clean = c0.getString(4)
    assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>") && clean.contains("<URL>"))
    assert(!clean.contains("@") && !clean.contains("+1555") && !clean.contains("https://"))
    val c1 = r(1L)
    assert(c1.getInt(1) == 0 && c1.getInt(2) == 0 && c1.getInt(3) == 0)
    assert(c1.getString(4) == "no pii at all", "a clean doc passes through unchanged")
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packSequences replays the greedy fold exactly") {
    val dir = "/fake/curation_pack"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "en", words(100)), (1L, "en", words(100)), (2L, "en", words(100)), // 100+100 fits, third spills
      (3L, "en", words(500)),                                                // oversized -> own pack
      (4L, "en", words(10)),
      (5L, "fr", words(200)), (6L, "fr", words(10))                          // fresh fold per lang
    ).toDF("doc_id", "lang", "text"))
    val r = operators.Curation.packSequences(spark, dir, budget = 256)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(r(("en", 0L)) == 0L && r(("en", 1L)) == 0L, "100+100 <= 256 shares pack 0")
    assert(r(("en", 2L)) == 1L, "the third 100 overflows to pack 1")
    assert(r(("en", 3L)) == 2L, "an oversized doc opens its own pack")
    assert(r(("en", 4L)) == 3L, "after a 500-doc the open pack is full (500+10 > 256)")
    assert(r(("fr", 5L)) == 0L && r(("fr", 6L)) == 0L,
      "fold resets on the lang boundary (200+10 fits pack 0, not en's running pack 3)")
  }

  test("packSequencesSharded: per-shard fold equals the global fold on that shard's docs") {
    val dir = "/fake/curation_pack_sharded"
    // dominant lang spanning 3 shards at shardWidth=128, minority lang in one
    val en = (0L until 300L).map(i => (i, "en", words(if (i % 3 == 0) 200 else 60)))
    val fr = Seq((301L, "fr", words(100)), (302L, "fr", words(100)))
    Tables.registerOverride(spark, dir, "documents", (en ++ fr).toDF("doc_id", "lang", "text"))
    val sharded = operators.Curation.packSequencesSharded(spark, dir, budget = 256)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)) -> (x.getLong(3), x.getLong(4)))
      .toMap
    val shards = sharded.keys.filter(_._1 == "en").map(_._2).toSet
    assert(shards == Set(0L, 1L, 2L), "the dominant lang splits across 3 independent fold keys")
    // shard law: restrict the corpus to one shard, run the GLOBAL
    // (q57) fold on it — rows must match the sharded output exactly
    shards.foreach { s =>
      val subDir = s"/fake/curation_pack_sharded_$s"
      Tables.registerOverride(spark, subDir, "documents",
        en.filter(_._1 / 128 == s).toDF("doc_id", "lang", "text"))
      val global = operators.Curation.packSequences(spark, subDir, budget = 256)
        .collect().map(x => (x.getString(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
      global.foreach { case ((lang, docId), (wc, packId)) =>
        assert(sharded((lang, s, docId)) == ((wc, packId)),
          s"shard $s doc $docId: sharded fold must equal the global fold on the restricted input")
      }
    }
  }

  test("distinctiveTerms weights lang-unique words above shared ones") {
    val dir = "/fake/curation_terms"
    Tables.registerOverride(spark, dir, "documents", Seq(
      (0L, "en", "shared unique_en unique_en"),
      (1L, "fr", "shared shared shared partage")
    ).toDF("doc_id", "lang", "text"))
    val r = operators.Curation.distinctiveTerms(spark, dir)
      .collect().map(x => (x.getString(0), x.getString(1)) -> (x.getLong(4), x.getInt(5))).toMap
    // n_langs=2: lang-unique word df=1 -> weight 2; shared df=2 -> weight 1
    assert(r(("en", "unique_en")) == (4L, 1), "tf=2 * weight 2 outranks shared tf=1 * weight 1")
    assert(r(("en", "shared")) == (1L, 2))
    assert(r(("fr", "shared")) == (3L, 1) && r(("fr", "partage")) == (2L, 2))
  }

  test("stratifiedSample is deterministic, threshold-honest, and keeps the min stratum whole") {
    val dir = "/root/testdata/sf0.001"
    val a = operators.Curation.stratifiedSample(spark, dir).collect()
    val b = operators.Curation.stratifiedSample(spark, dir).collect()
    assert(a.sameElements(b), "repeat evaluation must be bit-identical")
    assert(a.nonEmpty)
    a.foreach { row =>
      val id = row.getLong(0)
      assert(row.getLong(3) == ((id % 1048576L) * 2654435761L) % 1048576L, "hkey must be the documented hash")
    }
    // the smallest stratum's threshold is 2^20 -> every member kept
    val docs = Tables.documents(spark, dir).groupBy("lang", "source").count().collect()
    val minStratum = docs.minBy(_.getLong(2))
    val keptMin = a.count(r => r.getString(1) == minStratum.getString(0) && r.getString(2) == minStratum.getString(1))
    assert(keptMin == minStratum.getLong(2), "the min stratum is kept in full")
  }

  test("pseudonymize: stable, collision-free author mapping; bucketed rewrite; deterministic") {
    val dir = "/root/testdata/sf0.001"
    val a = operators.Curation.pseudonymize(spark, dir).collect()
    val b = operators.Curation.pseudonymize(spark, dir).collect()
    assert(a.sameElements(b), "repeat evaluation must be bit-identical")
    // consistency + collision-freedom: the (user -> pseudonym) map is
    // a bijection over the corpus's authors
    val events = Tables.events(spark, dir).select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = a.groupBy(r => events(r.getLong(0))).map { case (u, rows) =>
      u -> rows.map(_.getString(1)).distinct
    }
    assert(byUser.values.forall(_.length == 1), "one pseudonym per author, corpus-wide")
    val pseudos = byUser.map(_._2.head).toSeq
    assert(pseudos.distinct.length == pseudos.length, "no two authors share a pseudonym")
    // bucket rule: every emitted text comes from the pool its raw
    // length class selects (replaying transform_message_text's order)
    import operators.Curation.Pseudonyms._
    val props = Tables.events(spark, dir).select("event_id", "props").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach { r =>
      val raw = props(r.getLong(0)); val t = r.getString(2)
      val expectPool =
        if (raw == null || raw.trim.isEmpty) questionPool
        else if (raw.endsWith("?")) questionPool
        else if (raw.length < 20) shortPool
        else if (raw.length < 50) questionPool
        else longPool
      assert(expectPool.contains(t), s"event ${r.getLong(0)}: '$t' not in its length-class pool")
    }
  }

  test("q77 funnel computes the shared gopher frame once (both gates read the cache)") {
    // the shared scored frame is persisted through the registry and
    // read by BOTH the budget gate and the canonical pick — the plan
    // must show at least two InMemoryTableScans over it, i.e. the
    // corpus text is scored once, not once per gate (VERDICT r12
    // item 5; rows stay oracle-EXACT, asserted by the driver gate)
    // optimizedPlan, not executedPlan: AQE prints query stages lazily
    // before execution, but the logical cache substitution (one
    // InMemoryRelation node per reference to the persisted frame) is
    // already visible at optimization time
    val plan = operators.Curation.curationFunnel(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
    val scans = "InMemoryRelation".r.findAllIn(plan).length
    assert(scans >= 2, s"expected >=2 cached reads of the shared scored frame, saw $scans")
  }
}
