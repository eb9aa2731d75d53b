package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index lifecycle — the build/read split of the
  * reference's vector index surface (vector_store.py:105-214
  * `create_hnsw_index` / `check_index_exists` / `get_index_stats`):
  * q19/q19b/q41 compute their IVF structure per query; at 100 TB the
  * index is built ONCE and probed many times, so the structure must
  * live on storage with a stats surface.
  *
  * Layout (the Spark-native equivalent of HNSW's persisted graph):
  *   <path>/centroids/    — one row per cell: (label, svec)
  *   <path>/cells/cell=X/ — the corpus partitioned by cell id: the
  *                          INVERTED LISTS. A probe filters on the
  *                          partition column, so Spark's partition
  *                          pruning skips every non-probed cell's
  *                          files — the nProbe/nLists scan fraction
  *                          falls out of the directory layout (plan-
  *                          asserted in VectorIndexSpec).
  *
  * Cells here are q19b's seeded cells (min-vec_id member per label),
  * so the probe path is value-identical to q19b and shares its DuckDB
  * oracle; a q41 k-means refinement writes the same layout.
  */
object VectorIndex {

  /** Index root for a given data dir (under the build dir — the
    * single-JVM stand-in for a warehouse path).
    */
  def defaultPath(dir: String): String =
    "/root/repo/target/ivf-index/" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** `check_index_exists` twin: a completed build leaves _SUCCESS. */
  def exists(spark: SparkSession, path: String): Boolean =
    new java.io.File(s"$path/cells/_SUCCESS").exists() &&
      new java.io.File(s"$path/centroids/_SUCCESS").exists()

  /** Index is present AND no newer than its source table — a stale
    * index (source regenerated after the build) must not serve
    * probes; the real-deployment analog is a build watermark in the
    * index metadata.
    */
  def fresh(spark: SparkSession, dir: String, path: String): Boolean =
    exists(spark, path) && {
      val built = new java.io.File(s"$path/cells/_SUCCESS").lastModified()
      val src = new java.io.File(s"$dir/embeddings.parquet")
      val srcM =
        if (src.isDirectory) Option(src.listFiles()).map(_.map(_.lastModified()).max).getOrElse(0L)
        else src.lastModified()
      built >= srcM
    }

  /** Build the index: seeded centroids + cell-partitioned corpus.
    * One pass over the data per table; the cells write is the one
    * shuffle-free reorganization (partitionBy on write splits files
    * per task — at cluster scale precede it with a repartition on
    * cell so each cell's list is written by one task).
    */
  def build(spark: SparkSession, dir: String, path: String): Unit = {
    val e = Tables.embeddings(spark, dir)
    val seedW = Window.partitionBy("label").orderBy("vec_id")
    e.withColumn("rn", row_number().over(seedW)).filter(col("rn") === 1)
      .select(col("label"), col("embedding").as("svec"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    e.select(col("vec_id"), col("label"), col("embedding"), col("label").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  def centroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/centroids")

  def cells(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cells")

  /** `get_index_stats` twin: per-cell inverted-list sizes + dims,
    * answered from the INDEX (not the base table).
    */
  def indexStats(spark: SparkSession, path: String): DataFrame =
    cells(spark, path)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        min(size(col("embedding"))).as("dim"),
        min("vec_id").as("min_vec_id"),
        max("vec_id").as("max_vec_id"))
      .orderBy("cell")

  /** Probe the persisted index — value-identical to q19b (same seeds,
    * same ranking), but candidates come from a partition-pruned read
    * of the probed cells only. The probed cell ids are collected to
    * the driver (bounded by nLists — knowing which inverted lists to
    * open IS the index-probe contract) so the pruning filter is
    * static and visible to the scan.
    */
  def probe(spark: SparkSession, dir: String, path: String, k: Int = 10,
            nProbe: Int = 3, nQueries: Int = 5): DataFrame = {
    GraftFunctions.register(spark)
    val seeds = centroids(spark, path)
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probeW = Window.partitionBy("query_id").orderBy(col("csim").desc, col("label"))
    val probes = q.crossJoin(broadcast(seeds))
      .withColumn("csim", round(expr("cosine_sim(qvec, svec)"), 6))
      .withColumn("crk", row_number().over(probeW))
      .filter(col("crk") <= nProbe)
      .select("query_id", "qvec", "label")
    val probedCells = probes.select("label").distinct().collect().map(_.get(0)).toSeq
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cells(spark, path)
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(expr("cosine_sim(embedding, qvec)"), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id", "label", "sim", "rk")
      .orderBy("query_id", "rk")
  }

  /** q48: the full lifecycle as one driver entry — build if absent
    * (the nightly build), then probe (the steady-state read path).
    */
  def buildAndProbe(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    if (!fresh(spark, dir, path)) build(spark, dir, path)
    probe(spark, dir, path)
  }

  /** q48b: the stats surface as a driver entry, oracle-checked
    * against the same aggregation on the base table.
    */
  def statsEntry(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    if (!fresh(spark, dir, path)) build(spark, dir, path)
    indexStats(spark, path)
  }
}
