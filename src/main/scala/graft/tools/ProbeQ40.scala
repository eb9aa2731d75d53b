package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level decomposition of dedupAllPairs to find its cost center. */
object ProbeQ40 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val threshold = 0.9

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.operators.Dedup.docShingles(spark, dir)
      .withColumn("n", size(col("sh")))
    (1 to 2).foreach(_ => t("docs.noop")(docs.write.format("noop").mode("overwrite").save()))
    val exploded = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
    (1 to 2).foreach(_ => t("exploded.noop")(exploded.write.format("noop").mode("overwrite").save()))
    val dfreq = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
    (1 to 2).foreach(_ => t("dfreq.noop")(dfreq.write.format("noop").mode("overwrite").save()))
    val pref = exploded.join(dfreq, "shingle")
      .groupBy("doc_id", "n")
      .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ranked"))
      .select(col("doc_id"),
        slice(transform(col("ranked"), r => r.getField("shingle")),
          lit(1), (col("n") - ceil(col("n") * threshold) + 1).cast("int")).as("pref"))
    (1 to 2).foreach(_ => t("pref.noop")(pref.write.format("noop").mode("overwrite").save()))
    val rows = docs.join(pref, "doc_id")
      .select(explode(col("pref")).as("shingle"), col("doc_id"), col("sh"), col("pref"))
    (1 to 2).foreach(_ => t("rows.noop")(rows.write.format("noop").mode("overwrite").save()))
    (1 to 2).foreach(_ => t("full")(graft.operators.Dedup.dedupAllPairs(spark, dir, threshold)
      .write.format("noop").mode("overwrite").save()))
    spark.stop()
  }
}
