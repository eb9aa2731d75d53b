package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q29c (dedupEmbeddingIvfIndexed): the persisted-blocking
  * steady state must (a) produce exactly q29b's pairs at the same
  * parameters, and (b) actually REUSE a fresh index — the second run
  * must not rebuild.
  */
class DedupIndexSpec extends AnyFunSuite {
  import TestSpark._
  import operators.{Dedup, VectorIndex}

  private def cellsSuccessMtime: Long = {
    val path = VectorIndex.defaultPath(spark, dir) + "-dedup"
    val p = new org.apache.hadoop.fs.Path(s"$path/cells/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else -1L
  }

  test("indexed dedup == per-query q29b, and the second run reuses the index") {
    val direct = Dedup.dedupEmbeddingIvf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val first = Dedup.dedupEmbeddingIvfIndexed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(first == direct, "persisted blocking must reproduce q29b exactly")
    val builtAt = cellsSuccessMtime
    assert(builtAt > 0, "first run must have built the dedup index")
    val second = Dedup.dedupEmbeddingIvfIndexed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(second == direct)
    assert(cellsSuccessMtime == builtAt, "a fresh index must be read, not rebuilt")
  }

  test("q29d: IVF-planted pairs == sign-LSH-planted pairs (blocking-independent truth)") {
    // two different blockings (IVF cells vs sign-LSH bands) over the
    // same planted derived input must surface the IDENTICAL pair set:
    // planted recovery is certain for both, and at t=0.9 the corpus
    // holds no other pair — this is the engine-side witness of the
    // shared DuckDB brute-force oracle both entries check against
    val ivf = Dedup.dedupEmbeddingIvfPlanted(spark, dir).collect().toSeq
    val lsh = Dedup.dedupEmbeddingLshPlanted(spark, dir).collect().toSeq
    assert(ivf.nonEmpty, "the planted pairs must be recovered")
    assert(ivf == lsh, "cell blocking and sign-LSH blocking must agree on the planted truth")
  }
}
