package graft.tools
import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev tool: prove GraftSession gives a ready-to-use session — ns
  * timestamps readable and native functions resolvable, no setup.
  */
object SessionDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    val n = Tables.events(spark, "/root/testdata/sf0.001").count()
    val c = spark.sql(
      "SELECT round(cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))), 3) AS c").head().getDouble(0)
    println(s"events=$n cosine_self=$c")
    spark.stop()
  }
}
