package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator has a `queries` entry; every
  * SQL-expressible one also has an `oracleSql` entry whose DuckDB
  * result is value-identical (see SURVEY.md §6 for the cross-engine
  * determinism rules: exact decimal sums, surface-only double casts,
  * total deterministic ordering, epoch_ms timestamps).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_temporal_sessions" -> ((s, d) => Sessions.temporalSessions(s, d)),
    "q02_session_stats"     -> ((s, d) => Sessions.sessionStats(s, d)),
    "q03_concat_runs"       -> ((s, d) => Sessions.concatRuns(s, d)),
    "q04_largest_sessions"  -> ((s, d) => Sessions.largestSessions(s, d)),
    "q05_activity_heatmap"  -> ((s, d) => Sessions.activityHeatmap(s, d)),
    "q06_user_stats"        -> ((s, d) => Sessions.userStats(s, d)),
    "q08_long_groups"       -> ((s, d) => Sessions.longGroups(s, d)),
    "q20_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q21_top_orders"      -> ((s, d) => Relational.topOrders(s, d)),
    "q22_region_volume"   -> ((s, d) => Relational.regionVolume(s, d)),
    "q23_windowed_topn"   -> ((s, d) => Relational.windowedTopN(s, d)),
    "q24_order_priority"  -> ((s, d) => Relational.orderPriority(s, d))
  )

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  /** Shared session-assignment subquery: gap > windowMs ⇒ break,
    * running sum of breaks per user = session id (epoch-ms space).
    */
  private def sessionsCte(windowMs: Long): String =
    s"""SELECT event_id, user_id, event_type, value, ts_ms,
       |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |FROM (
       |  SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > $windowMs THEN 1 ELSE 0 END AS brk
       |  FROM (
       |    SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms,
       |      LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
       |    FROM events) a) b""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_temporal_sessions" ->
      s"""SELECT event_id, user_id, session_id
         |FROM (${sessionsCte(1800000)}) s
         |ORDER BY user_id, session_id, event_id""".stripMargin,
    "q02_session_stats" ->
      s"""SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
         |  MAX(ts_ms) - MIN(ts_ms) AS duration_ms,
         |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
         |  COUNT(DISTINCT event_type) AS n_kinds
         |FROM (${sessionsCte(1800000)}) s
         |GROUP BY user_id, session_id
         |HAVING COUNT(*) >= 3
         |ORDER BY user_id, session_id""".stripMargin,
    "q03_concat_runs" ->
      """SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
        |  MIN(event_type) AS event_type, COUNT(*) AS n, MIN(ts_ms) AS start_ms,
        |  string_agg(props, '. ' ORDER BY ts_ms, event_id) AS joined_props
        |FROM (
        |  SELECT *, SUM(run_brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM (
        |    SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 300000 OR prev_kind <> event_type THEN 1 ELSE 0 END AS run_brk
        |    FROM (
        |      SELECT event_id, user_id, event_type, props, epoch_ms(ts) AS ts_ms,
        |        LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms,
        |        LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_kind
        |      FROM events) a) b) c
        |GROUP BY user_id, run_id
        |ORDER BY user_id, run_id""".stripMargin,
    "q04_largest_sessions" ->
      s"""SELECT user_id, session_id, COUNT(*) AS size,
         |  MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
         |FROM (${sessionsCte(1800000)}) s
         |GROUP BY user_id, session_id
         |HAVING COUNT(*) >= 2
         |ORDER BY size DESC, user_id, session_id
         |LIMIT 20""".stripMargin,
    "q05_activity_heatmap" ->
      """SELECT dayofweek(ts) AS dow, hour(ts) AS hour_of_day,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY dayofweek(ts), hour(ts)
        |ORDER BY dow, hour_of_day""".stripMargin,
    "q06_user_stats" ->
      """SELECT user_id, COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_kinds,
        |  MIN(epoch_ms(ts)) AS first_seen_ms, MAX(epoch_ms(ts)) AS last_seen_ms,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q08_long_groups" ->
      """WITH f AS (
        |  SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms, event_id
        |  FROM events WHERE value >= 50.0),
        |d AS (SELECT *, LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ms FROM f),
        |b AS (SELECT *, CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 3600000 THEN 1 ELSE 0 END AS brk FROM d),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS tmp_group FROM b),
        |s AS (
        |  SELECT user_id, tmp_group, COUNT(*) AS n_events, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |    COUNT(DISTINCT event_type) AS n_kinds,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |  FROM g GROUP BY user_id, tmp_group HAVING COUNT(*) >= 3)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY start_ms, user_id) - 1 AS INT) AS group_id,
        |  user_id, n_events, start_ms, end_ms, total_value, n_kinds, avg_value
        |FROM s ORDER BY group_id""".stripMargin,
    "q20_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($discPrice * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q21_top_orders" ->
      s"""SELECT o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
         |  CAST(rev_exact AS DOUBLE) AS revenue
         |FROM (
         |  SELECT o_orderkey, o_orderdate, o_orderpriority, SUM($discPrice) AS rev_exact
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |  ORDER BY rev_exact DESC, o_orderkey
         |  LIMIT 10
         |) t""".stripMargin,
    "q22_region_volume" ->
      s"""SELECT n_name, CAST(rev_exact AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n_name, SUM($discPrice) AS rev_exact
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY n_name
         |  ORDER BY rev_exact DESC, n_name
         |) t""".stripMargin,
    "q23_windowed_topn" ->
      s"""SELECT p_brand, p_partkey, CAST(rev_exact AS DOUBLE) AS revenue, rk
         |FROM (
         |  SELECT p_brand, p_partkey, rev_exact,
         |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY rev_exact DESC, p_partkey) AS rk
         |  FROM (
         |    SELECT l_partkey, SUM($discPrice) AS rev_exact
         |    FROM lineitem GROUP BY l_partkey
         |  ) r JOIN part ON p_partkey = l_partkey
         |) t WHERE rk <= 3
         |ORDER BY p_brand, rk""".stripMargin,
    "q24_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
