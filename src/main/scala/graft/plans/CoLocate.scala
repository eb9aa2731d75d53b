package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketing utilities — the storage-layout half of the 100TB join
  * strategy (SURVEY.md §4): facts written bucketed+sorted on their
  * join key co-locate, so repeated fact-fact joins run shuffle-free
  * (SortMergeJoin reads matching buckets directly). At warehouse
  * scale this turns the dominant recurring cost (orders⋈lineitem
  * every query) into a scan.
  */
object CoLocate {

  /** Write a DataFrame as a bucketed, per-bucket-sorted table.
    * The repartition aligns write tasks with the bucket hash (both
    * Murmur3) so each bucket lands in ONE file — with multiple files
    * per bucket Spark cannot trust the per-bucket sort and re-sorts
    * both sides of every "shuffle-free" join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket keys; with
    * matching bucket counts Catalyst plans this without an Exchange.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    // dataframe-qualified key references: bare col(...) on both sides
    // throws AMBIGUOUS_REFERENCE whenever the two tables bucket on an
    // identically-named key (the common case)
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
