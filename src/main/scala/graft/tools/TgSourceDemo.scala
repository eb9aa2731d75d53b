package graft.tools
import org.apache.spark.sql.SparkSession
object TgSourceDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TelegramJson.readExport(spark, args(0), minMessages = 1)
      .select("message_id", "reaction", "members").orderBy("message_id").show(false)
    spark.stop()
  }
}
