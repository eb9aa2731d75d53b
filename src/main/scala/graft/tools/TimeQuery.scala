package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeQuery <sfdir> <name>...
  * Times each named query twice through the noop sink (same protocol
  * as Bench) and prints per-run seconds.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name: ${times.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
