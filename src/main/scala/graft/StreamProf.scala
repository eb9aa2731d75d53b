package graft

import org.apache.spark.sql.SparkSession

/** Scratch three-SF slope sweep for the r13-new entries (r14 item 5).
  * Not part of the library surface; removed before round end.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "q56c_forward_sources", "q80_stream_sessions", "q80b_stream_funnel",
      "q80c_sessions_rocks", "q80d_sessions_native",
      "q81_mcp_search", "q81b_mcp_clusters", "q81c_mcp_get_cluster",
      "q81d_mcp_random_cluster", "q82_pseudonymize",
      "q83_stream_dedup", "q84_stream_decontam", "q85_stream_threads",
      "q86_source_roundtrip", "q86b_source_html", "q86c_source_pipeline",
      "q86d_chat_summary", "q87_resessionize", "q88_heatmap_intensity",
      "q89_stream_windowed",
      "q34b_media_decode", "q34c_media_arrow")
    def force(name: String, sfDir: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      // settle pass (codegen, index builds), then min-of-2 timed
      names.foreach(n => try force(n, dir) catch { case _: Throwable => () })
      for (n <- names) {
        var best = Double.MaxValue
        for (_ <- 1 to 2) {
          System.gc()
          val t0 = System.nanoTime()
          try { force(n, dir); best = math.min(best, (System.nanoTime() - t0) / 1e9) }
          catch { case t: Throwable => println(s"[slope] $n sf$sf ERROR ${t.getMessage}") }
        }
        println(f"[slope] $n%-26s sf$sf%-6s $best%.2f")
      }
    }
    spark.stop()
  }
}
