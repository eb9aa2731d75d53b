package graft.tools

import graft.Tables
import graft.operators.{EmbeddingQuality, VectorIndex, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: measures hard-negative mining cost — the r06-flagged
  * brute-force N×nAnchors nested loop (O(N²/anchorMod) cosines,
  * anchors ∝ N) vs the q62b IVF-pruned path (anchors probe nProbe
  * fine cells of ~125 vectors each → O(N) total) — at growing N with
  * the corpus-replication protocol AssignProbe uses. Also reports the
  * IVF path's recall of the brute top-k pair set, so the speed/recall
  * trade is visible in one place.
  *
  *   runMain graft.tools.NegMineProbe [maxCopies]
  *   runMain graft.tools.NegMineProbe nprobe [copies]   # nProbe 1..8 curve
  */
object NegMineProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("nprobe")) { nProbeSweep(args.drop(1)); return }
    val maxCopies = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "label", "embedding")

    def corpus(copies: Int): DataFrame =
      base.crossJoin(spark.range(copies).select(col("id").cast("int").as("copy")))
        .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"), col("label"),
          transform(col("embedding"),
            x => x + col("copy").cast("float") * lit(0.01f)).cast("array<float>").as("embedding"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val k = 5

    Seq(1, 2, maxCopies).foreach { copies =>
      sweep(spark, corpus(copies), k)
    }
    spark.stop()
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** The probe-depth curve (VERDICT r07 item 6): fixed corpus, index
    * built ONCE, nProbe swept 1..8 so a user can pick a point on the
    * hardness-retention / cost trade. On this structureless synthetic
    * corpus recall grows slowly with nProbe (cells carry no semantic
    * locality — the IVF worst case); on real clustered embeddings the
    * same sweep climbs much faster because near neighbors co-assign.
    */
  private def nProbeSweep(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "label", "embedding")
    val e = base.crossJoin(spark.range(copies).select(col("id").cast("int").as("copy")))
      .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"), col("label"),
        transform(col("embedding"),
          x => x + col("copy").cast("float") * lit(0.01f)).cast("array<float>").as("embedding"))
      .cache()
    val n = e.count()
    val k = 5
    val anchors = e.filter(col("vec_id") % 101 === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
        col("embedding").as("avec"))
    val wb = Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("vec_id"))
    val bruteUncached = e.join(broadcast(anchors), col("label") =!= col("anchor_label"))
      .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
      .withColumn("rk", row_number().over(wb))
      .filter(col("rk") <= k)
      .select("anchor_id", "vec_id", "sim")
    bruteUncached.write.format("noop").mode("overwrite").save() // warm
    val tBrute = time(bruteUncached.write.format("noop").mode("overwrite").save())
    val brute = bruteUncached.cache()
    val total = brute.count()
    val bruteSim = brute.agg(avg("sim")).head.getDouble(0)
    val lists = math.max(16, (n / 125L).toInt)
    val cents = Vectors.refinedCentroids(e.select("vec_id", "embedding"), lists, 0).cache()
    cents.count()
    val cells = e.join(
      Vectors.assignCells(e.select("vec_id", "embedding"), cents,
        nProbe = 1, nCoarse = Vectors.autoCoarse(lists)).select("vec_id", "cell"),
      "vec_id").cache()
    cells.count()
    println(f"NPROBE-SWEEP n=$n%,d nLists=$lists anchors=${total / k} " +
      f"brute=$tBrute%.2fs bruteMeanSim=$bruteSim%.4f")
    (1 to 8).foreach { nProbe =>
      def ivf = {
        val probes = Vectors.assignCells(
            anchors.select(col("anchor_id").as("vec_id"), col("avec").as("embedding")),
            cents, nProbe = nProbe, nCoarse = Vectors.autoCoarse(lists))
          .join(anchors, col("vec_id") === col("anchor_id"))
          .select(col("anchor_id"), col("anchor_label"), col("avec"), col("cell"))
        cells.join(probes, Seq("cell"))
          .filter(col("label") =!= col("anchor_label"))
          .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
          .withColumn("rk", row_number().over(wb))
          .filter(col("rk") <= k)
          .select("anchor_id", "vec_id", "sim")
      }
      ivf.write.format("noop").mode("overwrite").save() // warm
      val tIvf = time(ivf.write.format("noop").mode("overwrite").save())
      val hit = ivf.join(brute.select(col("anchor_id").as("b_a"), col("vec_id").as("b_v")),
        col("anchor_id") === col("b_a") && col("vec_id") === col("b_v")).count()
      val ivfSim = ivf.agg(avg("sim")).head.getDouble(0)
      println(f"NPROBE nProbe=$nProbe ivf=$tIvf%.2fs recall_topk=${hit.toDouble / total}%.3f " +
        f"hardness=${ivfSim / bruteSim}%.3f")
    }
    spark.stop()
  }

  private def sweep(spark: SparkSession, raw: DataFrame, k: Int): Unit = {
    Seq(0, 1, 2).foreach { iters =>
      val e = raw.cache()
      val n = e.count()
      val anchors = e.filter(col("vec_id") % 101 === 0)
        .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
          col("embedding").as("avec"))
      val wb = Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("vec_id"))
      def brute = e.join(broadcast(anchors), col("label") =!= col("anchor_label"))
        .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
        .withColumn("rk", row_number().over(wb))
        .filter(col("rk") <= k)
        .select("anchor_id", "vec_id", "sim")

      // mining-index probe over the replicated corpus (same kernel as
      // q62b, built inline because the corpus is synthetic here)
      val lists = math.max(16, (n / 125L).toInt)
      val cents = Vectors.refinedCentroids(e.select("vec_id", "embedding"), lists, iters).cache()
      cents.count()
      val cells = e.join(
        Vectors.assignCells(e.select("vec_id", "embedding"), cents,
          nProbe = 1, nCoarse = Vectors.autoCoarse(lists)).select("vec_id", "cell"),
        "vec_id").cache()
      cells.count()
      def ivf = {
        val probes = Vectors.assignCells(
            anchors.select(col("anchor_id").as("vec_id"), col("avec").as("embedding")),
            cents, nProbe = 3, nCoarse = Vectors.autoCoarse(lists))
          .join(anchors, col("vec_id") === col("anchor_id"))
          .select(col("anchor_id"), col("anchor_label"), col("avec"), col("cell"))
        cells.join(probes, Seq("cell"))
          .filter(col("label") =!= col("anchor_label"))
          .withColumn("sim", round(expr("cosine_sim(embedding, avec)"), 6))
          .withColumn("rk", row_number().over(wb))
          .filter(col("rk") <= k)
          .select("anchor_id", "vec_id", "sim")
      }
      brute.write.format("noop").mode("overwrite").save()
      ivf.write.format("noop").mode("overwrite").save()
      val tBrute = time(brute.write.format("noop").mode("overwrite").save())
      val tIvf = time(ivf.write.format("noop").mode("overwrite").save())
      val b = brute.cache(); val total = b.count()
      val hit = ivf.join(b.select(col("anchor_id").as("b_a"), col("vec_id").as("b_v")),
        col("anchor_id") === col("b_a") && col("vec_id") === col("b_v")).count()
      // HARDNESS RETENTION: pair recall understates mining quality —
      // a missed exact-top-k pair is usually replaced by a nearly-as-
      // similar one from a probed cell. Compare the mean similarity
      // of what IVF returns vs the exact top-k's mean: a ratio near 1
      // means the negatives found are still hard, recall aside.
      val bruteSim = b.agg(avg("sim")).head.getDouble(0)
      val ivfSim = ivf.agg(avg("sim")).head.getDouble(0)
      println(f"NEGMINE n=$n%,d iters=$iters anchors=${total / k} nLists=$lists " +
        f"brute=$tBrute%.2fs ivf=$tIvf%.2fs recall_topk=${hit.toDouble / total}%.3f " +
        f"hardness=${ivfSim / bruteSim}%.3f (ivf mean sim $ivfSim%.4f vs brute $bruteSim%.4f)")
      b.unpersist(); cents.unpersist(); cells.unpersist(); e.unpersist()
    }
  }
}
