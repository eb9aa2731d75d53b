package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-validates the distributed k-means refinement (q41) against a
  * plain-JVM replay of one Lloyd round at sf0.001: exact
  * decimal-mean centroids from the label seed cells, then argmax
  * cosine reassignment with the same 6dp rounding and (sim desc,
  * cell) tie-break. Assignments must be IDENTICAL — this is what
  * makes the rows-only oracle trustworthy.
  */
class KmeansSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def cosine(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      val a = x(i).toDouble; val b = y(i).toDouble
      dot += a * b; nx += a * a; ny += b * b; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("one Lloyd round matches a plain-JVM replay exactly") {
    val rows = Tables.embeddings(spark, dir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).toArray))
    // exact decimal-mean centroids per label cell
    val centroids = rows.groupBy(_._2).map { case (cell, vs) =>
      val dim = vs.head._3.length
      val c = Array.tabulate(dim) { d =>
        val sum = vs.map(v => BigDecimal(v._3(d).toDouble).setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        (sum / vs.length).toDouble.toFloat
      }
      cell -> c
    }
    // argmax cosine reassignment, (sim desc, cell asc) tie-break
    val expected = rows.map { case (id, _, emb) =>
      val best = centroids.toSeq
        .map { case (cell, c) => (cell, round6(cosine(emb, c))) }
        .sortBy { case (cell, s) => (-s, cell) }.head
      id -> best._1
    }.toMap
    val got = operators.Vectors.kmeansIvf(spark, dir, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == expected.size)
    val diffs = expected.collect { case (id, c) if got(id) != c => (id, c, got(id)) }
    assert(diffs.isEmpty, s"assignment mismatches (expected vs got): ${diffs.take(5)}")
  }

  test("refinement does not lose vectors and csim is populated") {
    val out = operators.Vectors.kmeansIvf(spark, dir, iters = 2).collect()
    assert(out.length == Tables.embeddings(spark, dir).count())
    assert(out.forall(r => !r.isNullAt(2) && r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("incremental minhash dedup = full pairs minus old-old pairs") {
    val full = operators.Dedup.dedupMinHash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cut = 250L
    val inc = operators.Dedup.dedupMinHashIncremental(spark, dir, cut).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full.filter { case (_, b) => b >= cut },
      s"incremental must emit exactly the pairs whose newer side is >= $cut")
  }

  test("q41b: every planted twin co-assigns through the Lloyd loop (assignment purity)") {
    val got = operators.Vectors.kmeansPlanted(spark, TestSpark.dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val expect = operators.Vectors.kmeansIvf(spark, TestSpark.dir)
      .select("vec_id").collect().map(_.getLong(0)).filter(_ % 20 == 0)
      .map(v => (v, v + 1000000L, true))
    assert(got.toSeq == expect.toSeq,
      "identical embeddings may never diverge, whatever the centroids compute to")
  }
}
