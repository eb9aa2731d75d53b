package graft.tools

import graft.Tables
import graft.operators.KnnGraph

/** NN-descent quality probe: recall@k vs the exact graph at sf0.001
  * across (sampleR, ringJ, lists) settings. The r18 sweep that set
  * the operator defaults measured (k = 10, maxIters = 20):
  *   sampleR=10 ringJ=10 lists=16 → 0.812
  *   sampleR=20 ringJ=10 lists=16 → 0.839
  *   sampleR=20 ringJ=20 lists=16 → 0.842
  *   sampleR=30 ringJ=20 lists=8  → 0.825
  * — reverse-sample 2k is the binding lever; ring width and cell
  * count are marginal. Near-random embeddings are the worst case for
  * neighbor-of-neighbor exploration (no cluster structure to ride),
  * so these are FLOOR numbers, not typical ones.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val ex = KnnGraph.knnGraphExact(spark, dir, 10)
      .select("vec_id", "nb_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((sr, rj, li) <- Seq((10, 10, 16), (20, 10, 16), (20, 20, 16), (30, 20, 8))) {
      val d = KnnGraph.nnDescent(spark, e, k = 10, lists = li,
        maxIters = 20, sampleR = sr, ringJ = rj)
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"sampleR=$sr ringJ=$rj lists=$li recall=${ex.count(d.contains).toDouble / ex.length}%.4f")
    }
  }
}
