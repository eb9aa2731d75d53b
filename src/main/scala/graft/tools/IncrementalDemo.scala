package graft.tools
import graft.{Tables, operators}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: drive the incremental-update flow on real testdata —
  * resume position, then fetch-newer + upsert round trip.
  */
object IncrementalDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val existing = ev.filter(col("event_id") < 500)
    val pos = operators.Incremental.maxKeyPerGroup(existing, "user_id", "event_id")
    pos.show(3)
    val merged = operators.Incremental.upsertByKey(existing, ev, Seq("event_id"))
    println(s"existing=${existing.count()} incoming=${ev.count()} merged=${merged.count()}")
    spark.stop()
  }
}
