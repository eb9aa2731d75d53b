package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r21 shared-leaf registry (Curation.sharedLeafFrame) and
  * the walk's extra-hop no-op law — the two operator internals the
  * optimization round changed. Value-level correctness of the gate
  * entries themselves stays with the DuckDB oracle.
  */
class SharedLeafFrameSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus(n: Int) =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .filter(col("vec_id") < n)

  test("sharedLeafFrame computes once per (key, deps) and serves the same leaf") {
    var computes = 0
    def get() = operators.Curation.sharedLeafFrame(spark, "spec_slf_a", Seq(corpus(50))) {
      computes += 1
      corpus(50).select(col("vec_id"), size(col("embedding")).as("d"))
    }
    val f1 = get()
    val f2 = get()
    assert(computes == 1, s"second call must reuse, computed $computes times")
    assert(f1 eq f2, "reuse must return the SAME leaf frame")
    assert(f2.count() == 50)
  }

  test("sharedLeafFrame: a different dependency plan recomputes, and both entries coexist") {
    var computes = 0
    def get(n: Int) = operators.Curation.sharedLeafFrame(spark, "spec_slf_b", Seq(corpus(n))) {
      computes += 1
      corpus(n).select("vec_id")
    }
    val a = get(30); val b = get(40)
    assert(computes == 2, "distinct corpora must each compute")
    assert(a.count() == 30 && b.count() == 40)
    // and neither evicted the other (semanticHash-keyed coexistence)
    get(30); get(40)
    assert(computes == 2, s"both entries must still serve, computed $computes")
  }

  test("sharedLeafFrame: a token change invalidates the copy") {
    var computes = 0
    def get(tok: String) =
      operators.Curation.sharedLeafFrame(spark, "spec_slf_c", Seq(corpus(20)), tok) {
        computes += 1
        corpus(20).select("vec_id")
      }
    get("wm1"); get("wm1")
    assert(computes == 1)
    get("wm2") // models an index rebuild bumping the watermark
    assert(computes == 2, "token change must recompute")
    get("wm2")
    assert(computes == 2, "same token reuses again")
  }

  test("walk: extra hops beyond convergence are a no-op (the dropped early-stop law)") {
    // below wholeEdgeThreshold the walk runs ALL maxHops lazily with
    // no growth check (r21); this pins the equivalence the drop
    // stands on — once no query discovers a new node, further hops
    // add zero rows, so the final top-k is identical at any larger
    // maxHops bound
    val fake = "/fake/slf_walk_eq"
    val base = corpus(60)
    Tables.registerOverride(spark, fake, "embeddings", base)
    val path = java.nio.file.Files.createTempDirectory("graft_slf_walk_")
      .toAbsolutePath.toString
    operators.KnnGraph.buildGraph(spark, fake, path, k = 10, lists = 4, maxIters = 1)
    val queries = base.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def walk(h: Int) = operators.KnnGraph
      .graphWalkOn(spark, path, base, queries, k = 10, beam = 8, maxHops = h)
      .select("q_id", "node", "sim")
    // 60 nodes, beam 8, degree 10: the frontier saturates well before
    // hop 6 — a larger bound must change nothing
    val h6 = walk(6).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val h9 = walk(9).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(h6 == h9, "hops past convergence must not change the top-k")
  }
}
