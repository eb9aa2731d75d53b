package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory for library users: graft's extensions
  * plus the conf this engine is designed around. On a cluster, the
  * same settings go through spark-defaults/spark-submit and
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // post-shuffle partition count follows DATA SIZE
      // (advisoryPartitionSizeInBytes — Spark's 64m default is right
      // for cluster-scale corpora; local harnesses size it down, see
      // Bench.scala), not core count — r21, guide §2.2
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    // idempotent; covers attaching to a pre-existing session too
    functions.GraftFunctions.register(spark)
    spark
  }

  /** SQL surface: register every testdata table as a temp view (plus
    * graft's functions), so the reference's DuckDB-style SQL runs
    * directly under spark.sql — e.g.
    * `spark.sql("SELECT shingles(text) FROM documents")`. View names
    * match the reference's table names; re-registration repoints the
    * views at a new sf dir.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    functions.GraftFunctions.register(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.byName(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }
}
