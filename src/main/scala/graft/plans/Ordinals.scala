package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Dense global ordinals WITHOUT an unpartitioned window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the whole dataset
  * through ONE task — fine on a post-HAVING handful of rows, a
  * straggler/OOM at 100 TB. This is the classic two-pass global
  * numbering instead: range-repartition on the sort key (so the
  * partition index order IS the total order), sort within partitions,
  * then zipWithIndex — Spark runs one count job over the partitions
  * and broadcasts the per-partition prefix offsets into a map task.
  * Every task holds only its slice; the result is identical to the
  * global window for any total (tie-free) sort key. (The RDD hop is
  * the point: this is genuinely per-partition imperative logic.)
  */
object Ordinals {

  /** Append `name` = offset + 0-based position of the row in the
    * total order of `sortCols` (which must be a unique key).
    */
  def withOrdinal(df: DataFrame, sortCols: Seq[Column], name: String,
                  offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + offset)) }
    spark.createDataFrame(rdd, schema)
  }
}
