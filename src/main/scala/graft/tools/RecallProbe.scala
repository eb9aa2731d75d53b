package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures embedding near-dup RECALL of the blocked variants against
  * the brute-force ground truth at a given sf/threshold:
  * q29 (label-blocked), q29b (IVF-cell-blocked, the scale default),
  * q44-style sign-LSH. runMain graft.tools.RecallProbe <sfdir> [t]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val t = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(expr("cosine_sim(a.embedding, b.embedding)"), 6))
      .filter(col("sim") >= t)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val total = brute.count()
    val label = Dedup.dedupEmbedding(spark, sfDir, t).count()
    val ivf = Dedup.dedupEmbeddingIvf(spark, sfDir, t).count()
    val lsh = Dedup.dedupEmbeddingLshOn(spark, e, t).count()
    println(f"RECALL sf=$sfDir t=$t brute=$total label=$label (${label * 100.0 / total}%.1f%%) " +
      f"ivf=$ivf (${ivf * 100.0 / total}%.1f%%) signlsh=$lsh (${lsh * 100.0 / total}%.1f%%)")
    spark.stop()
  }
}
