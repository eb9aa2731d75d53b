package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables.
  *
  * One parquet file per table under the sf dir (see TESTDATA.md).
  * Kept as plain parquet scans so Catalyst can push filters/pruning
  * into the scan; at cluster scale these would be partitioned
  * directories, which changes nothing in the call sites.
  */
object Tables {
  /** Resolved-relation cache keyed by (session, dir, table): a fresh
    * spark.read.parquet re-lists the directory and re-reads footers
    * on EVERY query — across a 46-query run that's pure per-query
    * floor. A real deployment holds table handles in a catalog; this
    * is the single-JVM equivalent. (DataFrames are immutable plans —
    * sharing one across queries is safe.)
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), (String, DataFrame)]()

  /** Both registries key by SparkSession with strong references, so a
    * long-lived JVM cycling many sessions would pin every stopped
    * session (and its plans) forever (ADVICE r08, the eventThreadCache
    * leak-bounding rule). Evict stopped sessions' entries whenever a
    * registry is touched — O(live entries), and the touch rate is one
    * per table load.
    */
  private def evictStopped(): Unit = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    overrideVersions.keySet.removeIf(k => k._1.sparkContext.isStopped)
  }

  /** TOKEN-AWARE read cache: each entry remembers the sourceToken it
    * was built under, and a mismatch (files regenerated, or a newer
    * registerOverride) re-reads instead of serving the stale relation
    * — without this, the derived caches that check sourceToken for
    * freshness (ReplyChains' thread frames) would "rebuild" through
    * this cache's old InMemoryFileIndex and still resolve against
    * deleted part files. The token costs one FS listing per read()
    * call — driver-side, at query-construction rate, not per row.
    * Note the override edge: a source regeneration also invalidates a
    * registered override (it was built from the old bytes).
    */
  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    evictStopped()
    val key = (spark, dir, name)
    val token = sourceToken(spark, dir, name)
    val cached = cache.get(key)
    if (cached != null && cached._1 == token) cached._2
    else {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      cache.put(key, (token, df))
      df
    }
  }

  /** Substitute a pre-materialized twin (e.g. a bucketed copy) for a
    * table — the bench's shared-table mechanism, the single-JVM
    * analog of pointing the catalog at a better physical layout of
    * the SAME data. Every operator picks it up transparently.
    */
  def registerOverride(spark: SparkSession, dir: String, name: String, df: DataFrame): Unit = {
    evictStopped()
    // bump the version FIRST so the cached entry's token matches what
    // read() recomputes (the token embeds the version)
    overrideVersions.merge((spark, dir, name), 1, (a, b) => a + b)
    cache.put((spark, dir, name), (sourceToken(spark, dir, name), df))
  }

  private val overrideVersions =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Integer]()

  /** Freshness token for a table as this session currently sees it:
    * changes whenever the table is re-registered (registerOverride)
    * OR its backing files are regenerated — the two ways derived
    * caches (ReplyChains' converged thread frames) go silently stale
    * (ADVICE r07). Same (name, length, mtime) recursive-listing
    * contract as VectorIndex.sourceSnapshot: snapshot EQUALITY decides
    * freshness, no clock agreement needed.
    */
  def sourceToken(spark: SparkSession, dir: String, name: String): String = {
    val v = Option(overrideVersions.get((spark, dir, name))).map(_.intValue).getOrElse(0)
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) ""
      else if (!fs.getFileStatus(p).isDirectory) {
        val s = fs.getFileStatus(p)
        s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
      } else {
        val root = p.toUri.getPath.stripSuffix("/") + "/"
        val it = fs.listFiles(p, true)
        val parts = scala.collection.mutable.ArrayBuffer[String]()
        while (it.hasNext) {
          val s = it.next()
          parts += s"${s.getPath.toUri.getPath.stripPrefix(root)}:${s.getLen}:${s.getModificationTime}"
        }
        parts.sorted.mkString(",")
      }
    s"v$v|$files"
  }

  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  /** `events.ts` contract: every operator sees ts as a RAW
    * ns-since-epoch LONG (operators derive epoch-ms / timestamp views
    * from it — exact, and cheaper than timestamps in the hot path).
    * The physical parquet type has drifted across testdata
    * generations — TIMESTAMP(NANOS) originally (which Spark's
    * vectorized reader only accepts as a long via the nanosAsLong
    * legacy conf), timestamp[us] since 2026-08-13 — so normalize at
    * the loader, the ONE place the physical type is visible:
    *   - LongType (NANOS via legacy conf): already the contract.
    *   - TimestampType / TimestampNTZType (µs precision):
    *     unix_micros * 1000. Session TZ is UTC (SURVEY §3), so the
    *     NTZ→TZ cast is exact; µs→ns widening is exact by definition.
    * Any other dtype fails LOUDLY here instead of as 22 per-query
    * DATATYPE_MISMATCH analysis errors (the r10 failure mode).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // TIMESTAMP(NANOS) generations need the legacy nanosAsLong conf —
    // and not just for schema inference: the scan's hadoopConf is
    // rebuilt from session conf at execution, so once such a file is
    // seen the conf must STAY set for this session. For every other
    // generation (timestamp[us], the current one) we must not touch
    // session conf at all — unconditionally setting it here leaked a
    // session-wide behavior change into unrelated parquet reads
    // (ADVICE r11). So: try the plain read first; only on the
    // distinctive "Illegal Parquet type … NANOS" failure set the conf
    // and retry (computeIfAbsent caches nothing on a throw, so the
    // retry re-runs the footer read under the conf).
    val df =
      try read(spark, dir, "events")
      catch {
        case e: Throwable if Option(e.getMessage).exists(_.contains("NANOS")) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          read(spark, dir, "events")
      }
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case None | Some(LongType) => df // ts-less spec frames / already ns
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported type $other; expected LONG (ns) or TIMESTAMP[_NTZ] — " +
            "testdata schema drifted again; extend Tables.events' normalization")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Name-based lookup (view registration, tooling). `events` must go
    * through its dedicated loader for the nanos conf.
    */
  def byName(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" => events(spark, dir)
    case other    => read(spark, dir, other)
  }
}
