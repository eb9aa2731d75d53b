package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: prove the spark.sql.extensions deployment path in a
  * fresh JVM — no runtime register() call anywhere.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
      """SELECT round(cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |                        array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))), 6) AS cos,
        |       simhash(array('a b', 'b c')) AS sh,
        |       fingerprint64('hello') AS fp,
        |       intersect_count_sorted(array('a','b','c'), array('b','c','d')) AS ic,
        |       size(minhash(array('a b','b c'), 8)) AS mh_k,
        |       size(shingles('a b c')) AS ng,
        |       sign_bits(array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 16) AS sb,
        |       repetition_stats('a b a b').n_uniq_words AS ru,
        |       size(kgrams('a b c d', 2)) AS kg,
        |       size(kgram_hashes('a b c d', 2)) AS kh,
        |       l2_sq(array(CAST(0.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |             array(CAST(4.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS l2,
        |       round(pq_adc(array(0, 1), array(1.0D, 2.0D, 3.0D, 4.0D), 2), 6) AS adc
        |""".stripMargin).show(false)
    spark.stop()
  }
}
