package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-document regression: single-token and empty docs have
  * NO bigram shingles. Before the guard in Dedup.shingles,
  * sequence(1, size-1) produced a descending [1, 0] range and ANSI
  * element_at aborted the whole job on index 0 — any real corpus
  * contains one-word docs, so q26/q27/q28/q39 must survive them.
  */
class DedupEdgeSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("dedup_edge").toString
    import spark.implicits._
    Seq(
      (0L, "hello", "en", "s0", 5L),                      // single token: no shingles
      (1L, "", "en", "s0", 0L),                           // empty text
      // near-dup pair sharing 11 of 12 shingles: enough shingles that
      // the simhash Hamming distance concentrates well under maxDist
      // (4-shingle docs sit near E[hamming]≈24 and legitimately miss)
      (2L, "the quick brown fox jumps over the lazy dog every single morning here", "en", "s1", 70L),
      (3L, "the quick brown fox leaps over the lazy dog every single morning here", "en", "s1", 70L),
      (4L, "completely different words appear in this other document about databases", "en", "s1", 72L),
      (5L, "hello", "en", "s2", 5L),                      // exact dup of 0, still unpairable (no shingles)
      (6L, "the quick brown fox jumps over the lazy dog every single morning here", "en", "s2", 70L), // exact dup of 2: hamming 0 ⇒ guaranteed band match
      (7L, null.asInstanceOf[String], "en", "s2", 0L) // NULL text must not crash any path
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val foxPairs = Set((2L, 3L), (2L, 6L), (3L, 6L))

  test("ngram dedup survives single-token and empty docs") {
    val pairs = operators.Dedup.dedupNgram(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == foxPairs, s"expected the fox trio's pairs, got $pairs")
  }

  test("minhash dedup survives degenerate docs and honors k") {
    // fallback off: a codegen compile failure must FAIL, not silently
    // run interpreted (regression: generated code referenced
    // Hashing.MODULE$, which does not exist on the mirror class)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val p32 = operators.Dedup.dedupMinHash(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p32.contains((2L, 6L)) && p32.subsetOf(foxPairs),
        s"exact dup must surface, only fox pairs may, got $p32")
      // k=16 with 8 bands (2 rows/band): must not crash and must band
      // over a 16-element signature (regression: k was hardcoded 32)
      val p16 = operators.Dedup.dedupMinHash(spark, dir, k = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p16.contains((2L, 6L)) && p16.subsetOf(foxPairs),
        s"k=16 banding broke recall or leaked a bad pair: $p16")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("minhash maxBucket guard: star pairs on a verbatim clique, connectivity preserved") {
    import spark.implicits._
    // a degenerate corpus: 12 verbatim copies of one doc (every band
    // bucket holds the whole clique) plus one unrelated doc
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docsDf = ((0 until 12).map(i => (i.toLong, base)) :+
      (100L, "totally unrelated words fill this other document completely"))
      .toDF("doc_id", "text")
    val sh = operators.Dedup.docShinglesOn(spark, docsDf)
    val full = operators.Dedup.dedupMinHashOn(spark, sh, 0.5, 32, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size == 12 * 11 / 2, s"uncapped: the full clique listing, got ${full.size}")
    val capped = operators.Dedup.dedupMinHashOn(spark, sh, 0.5, 32, 8, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the star: linear in clique size, anchored at the min id
    assert(capped == (1 until 12).map(i => (0L, i.toLong)).toSet,
      s"capped listing must be the min-id star, got $capped")
    // what q53/q75 consume is CONNECTIVITY — identical under the cap
    def comps(pairs: Set[(Long, Long)]) =
      operators.DupGraph.connectedComponents(
        pairs.toSeq.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(capped) == comps(full),
      "the star must reproduce the uncapped components exactly")
  }

  test("ngram maxBlock guard: star pairs on a verbatim clique, connectivity preserved") {
    import spark.implicits._
    // verbatim copies all share the min shingle, so one block holds
    // the whole clique — the Θ(C²) shape maxBlock exists to cap
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docsDf = ((0 until 12).map(i => (i.toLong, base)) :+
      (100L, "totally unrelated words fill this other document completely"))
      .toDF("doc_id", "text")
    val sh = operators.Dedup.docShinglesOn(spark, docsDf)
    val full = operators.Dedup.dedupNgramOn(spark, sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size == 12 * 11 / 2, s"uncapped: the full clique listing, got ${full.size}")
    val capped = operators.Dedup.dedupNgramOn(spark, sh, 0.5, maxBlock = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the star: linear in clique size, anchored at the min id, and
    // every emitted pair still carries its EXACT jaccard (=1 here)
    assert(capped.map(p => (p._1, p._2)).toSet ==
      (1 until 12).map(i => (0L, i.toLong)).toSet,
      s"capped listing must be the min-id star, got ${capped.toSeq}")
    assert(capped.forall(_._3 == 1.0), s"star pairs verify exactly: ${capped.toSeq}")
    def comps(pairs: Set[(Long, Long)]) =
      operators.DupGraph.connectedComponents(pairs.toSeq.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(capped.map(p => (p._1, p._2)).toSet) == comps(full),
      "the star must reproduce the uncapped components exactly")
  }

  test("ngram maxBlock on a NON-clique block: divergence is by design and is COUNTED") {
    import spark.implicits._
    // an oversized block that is NOT one verbatim clique: all six
    // docs share the min shingle ("aaa …" sorts first), docs 2 and 3
    // are near-dups of EACH OTHER but not of the anchor — the star
    // checks anchor-vs-member only, so (2,3) is dropped BY DESIGN
    // (ADVICE r18: the intended approximation, documented and now
    // observable via the oversizedBlockCount accumulator instead of
    // silent)
    def shOf(extra: String*) = ("aaa aaa" +: extra).toArray.sorted
    val sh = Seq(
      (0L, shOf("p1 q1", "p2 q2", "p3 q3")),
      (1L, shOf("r1 s1", "r2 s2", "r3 s3")),
      (2L, shOf("zz1 zz2", "zz2 zz3", "zz3 zz4")),
      (3L, shOf("zz1 zz2", "zz2 zz3", "zz9 zz9")),
      (4L, shOf("t1 u1", "t2 u2", "t3 u3")),
      (5L, shOf("v1 w1", "v2 w2", "v3 w3"))
    ).toDF("doc_id", "sh")
    val full = operators.Dedup.dedupNgramPairs(spark, sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(operators.Dedup.oversizedBlockCount(spark) == 0,
      "uncapped run must report zero oversized blocks")
    assert(full == Set((2L, 3L)), s"full listing finds the member-member pair: $full")
    val belted = operators.Dedup.dedupNgramPairs(spark, sh, 0.5, maxBlock = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(belted.isEmpty,
      s"the anchor star drops the (2,3) member-member pair by design: $belted")
    // >0, not ==1: the accumulator ticks inside a transformation, so
    // retries/speculation may double-count (ADVICE r19) — the contract
    // is engaged-vs-not, which is retry-proof
    assert(operators.Dedup.oversizedBlockCount(spark) > 0,
      "the engaged belt must be visible: oversized block count > 0")
  }

  test("simhash dedup survives degenerate docs") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val pairs = operators.Dedup.dedupSimHash(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // hamming(2,6)=0 ⇒ all four bands collide ⇒ guaranteed found;
      // the 2/3 near-dup pair may or may not band-match (no recall
      // guarantee above hamming 3) but degenerate docs never pair
      assert(pairs.contains((2L, 6L)) && pairs.forall(p => Set(2L, 3L, 6L)(p._1) && Set(2L, 3L, 6L)(p._2)),
        s"exact dup must be found, degenerate docs must not pair: $pairs")
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("all-pairs prefix join finds exactly the fox trio's pairs") {
    val rows = operators.Dedup.dedupAllPairs(spark, dir, threshold = 0.5).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == foxPairs, s"exact all-pairs must find the full trio, got $pairs")
    val jac = rows.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((2L, 6L)) == 1.0, s"exact dup jac must be 1.0: $jac")
    // near-dup pair: 10 shared of 12+12 shingles -> 10/14
    assert(math.abs(jac((2L, 3L)) - 10.0 / 14) < 1e-6, s"fox near-dup jac: $jac")
  }

  test("embedding LSH finds planted near-duplicates, exactly and only") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("emb_lsh").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 40L).map(i => (i, vec(), i.toInt % 4))
    // plant 10 near-dups of vectors 0..9: tiny perturbation => sim ~0.9999
    val dups = (0L until 10L).map(i =>
      (100L + i, base(i.toInt)._2.map(x => x + 0.001f), 9))
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = operators.Dedup.dedupEmbeddingLsh(spark, d).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val want = (0L until 10L).map(i => (i, 100L + i)).toSet
    assert(want.subsetOf(got.keySet),
      s"all planted near-dup pairs must surface, missing ${want -- got.keySet}")
    assert(got.values.forall(_ >= 0.9), "only pairs above the verify threshold")
    // exactness of the verify: planted pairs are near-identical
    want.foreach(k => assert(got(k) > 0.999, s"planted pair $k sim ${got(k)}"))
  }

  test("IVF-cell dedup finds planted near-duplicates and beats label blocking") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("emb_ivf").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 40L).map(i => (i, vec(), i.toInt % 4))
    val dups = (0L until 10L).map(i =>
      (100L + i, base(i.toInt)._2.map(x => x + 0.001f), 9))
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // near-identical vectors rank the centroids near-identically, so
    // multi-probe cell blocking must surface every planted pair
    val got = operators.Dedup.dedupEmbeddingIvf(spark, d, threshold = 0.9, nLists = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 10L).map(i => (i, 100L + i)).toSet
    assert(want.subsetOf(got), s"planted pairs must surface, missing ${want -- got}")
  }

  test("IVF-cell dedup recall >= label-blocked recall on testdata (same threshold)") {
    // measured (tools.RecallProbe, brute-force ground truth, t=0.3):
    // sf0.001 ivf 51.5% vs label 8.9%; sf0.01 ivf 49.8% vs label 11.2%
    val sf = TestSpark.dir
    val ivf = operators.Dedup.dedupEmbeddingIvf(spark, sf).count()
    val label = operators.Dedup.dedupEmbedding(spark, sf).count()
    assert(ivf >= label, s"cell blocking must not lose to the fixed-block label plan: $ivf < $label")
  }

  test("corpus prep pipeline survives degenerate docs") {
    val rows = operators.TextAnalysis.corpusPrep(spark, dir, minQuality = 0.0).collect()
    assert(rows.nonEmpty)
  }

  test("q39b dedup-first corpus prep == q39 (incl. on a planted verbatim clique)") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq
    // on the degenerate-doc corpus above
    assert(rows(operators.TextAnalysis.corpusPrepDedupFirst(spark, dir)) ==
      rows(operators.TextAnalysis.corpusPrep(spark, dir)))
    // and on real testdata
    val td = TestSpark.dir
    assert(rows(operators.TextAnalysis.corpusPrepDedupFirst(spark, td)) ==
      rows(operators.TextAnalysis.corpusPrep(spark, td)))
    // and on a planted verbatim clique — the corpus the composition
    // order exists for (30 copies: big enough to catch an ordering
    // bug, small enough that the RAW q39 twin still runs in a spec)
    val fake = "/fake/prep_megadup"
    val clique = (0 until 30).map(i =>
      (1000L + i, "the quick brown fox jumps over the lazy dog every single morning here", "en", "s1", 70L))
    val extra = Seq(
      (1L, "completely different words appear in this other document about databases", "en", "s0", 72L),
      (2L, "the quick brown fox leaps over the lazy dog every single morning here", "en", "s1", 70L))
    Tables.registerOverride(spark, fake, "documents",
      (clique ++ extra).toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(rows(operators.TextAnalysis.corpusPrepDedupFirst(spark, fake)) ==
      rows(operators.TextAnalysis.corpusPrep(spark, fake)))
  }

  test("composed-pipeline belts (r18 default): belted q39/q53 equal the unguarded spelling on a verbatim clique") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    // a 30-copy verbatim clique (min-id member INSIDE the clique, so
    // the star anchor is the clique's own min — the case the belt's
    // equivalence argument covers) plus one unrelated doc in another
    // block. maxBlock=5 forces the star; MaxValue is the full listing.
    val fake = "/fake/belt_composed"
    val clique = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog every single morning here", "en", "s1", 70L))
    val extra = Seq(
      (100L, "completely different words appear in this other document about databases", "en", "s0", 72L))
    Tables.registerOverride(spark, fake, "documents",
      (clique ++ extra).toDF("doc_id", "text", "lang", "source", "n_chars"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq
    assert(rows(operators.TextAnalysis.corpusPrep(spark, fake, minQuality = 0.0, maxBlock = 5)) ==
      rows(operators.TextAnalysis.corpusPrep(spark, fake, minQuality = 0.0, maxBlock = Int.MaxValue)),
      "q39's drop set must be belt-invariant on a verbatim clique")
    assert(rows(operators.DupGraph.dupClusters(spark, fake, maxBlock = 5)) ==
      rows(operators.DupGraph.dupClusters(spark, fake, maxBlock = Int.MaxValue)),
      "q53's clusters must be belt-invariant on a verbatim clique")
  }

  test("substringDup computes exact span coverage on planted shared passages") {
    import spark.implicits._
    val sdir = "/fake/substring_dup"
    Tables.registerOverride(spark, sdir, "documents", Seq(
      (0L, "a b c d e f g h i j"),              // shares its full text with doc 2
      (1L, "x y a b c d e f g h z"),            // embeds doc 0's first 8 tokens mid-doc
      (2L, "a b c d e f g h i j"),              // exact copy of doc 0
      (3L, "short doc"),                        // < k tokens: no grams
      (4L, "p q r s t u v w p q r s t u v w")   // WITHIN-doc repeat only: not cross-doc
    ).toDF("doc_id", "text"))
    val r = operators.Dedup.substringDup(spark, sdir, k = 8)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 0/2: all 3 grams shared with the copy; interval union =
    // 1 + 1 + 8 = 10 tokens -> fully covered
    Seq(0L, 2L).foreach { id =>
      assert(r(id).getInt(1) == 10 && r(id).getLong(2) == 3L && r(id).getLong(3) == 10L)
      assert(r(id).getDouble(4) == 1.0)
    }
    // doc 1: exactly one gram ("a b c d e f g h") is cross-doc; 8 of 11 tokens covered
    assert(r(1L).getLong(2) == 1L && r(1L).getLong(3) == 8L && r(1L).getDouble(4) == 8.0 / 11)
    // doc 3: no grams at all
    assert(r(3L).getLong(2) == 0L && r(3L).getLong(3) == 0L && r(3L).getDouble(4) == 0.0)
    // doc 4: its repeated gram lives in ONE doc only - cross-doc rule must not fire
    assert(r(4L).getLong(2) == 0L && r(4L).getLong(3) == 0L,
      "within-doc repetition is q60's business, not span dedup's")
  }
}
