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
    "q20_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q21_top_orders"      -> ((s, d) => Relational.topOrders(s, d)),
    "q22_region_volume"   -> ((s, d) => Relational.regionVolume(s, d)),
    "q23_windowed_topn"   -> ((s, d) => Relational.windowedTopN(s, d)),
    "q24_order_priority"  -> ((s, d) => Relational.orderPriority(s, d))
  )

  private val discPrice =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  def oracleSql: Map[String, String] = Map(
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
