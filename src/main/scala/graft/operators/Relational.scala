package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics family.
  *
  * The reference exposes its analytics through SQL on DuckDB
  * (terrorblade/data/database/telegram_database.py:345-1008 — per-chat
  * counts, HAVING-filtered cluster sizes, ordered top-N). These five
  * queries re-express that surface as classic warehouse patterns on
  * the TPC-H-ish testdata, written so Catalyst gets a fully
  * declarative plan (scan-level filter pushdown, partial aggregation,
  * broadcast dims, AQE-decided fact joins).
  *
  * Numeric discipline: money/quantity aggregates are summed as
  * DECIMAL — exact and ORDER-INSENSITIVE, so results are identical
  * under any partitioning/AQE decision at any scale (and bit-equal to
  * the DuckDB oracle). Only the final result surface is cast to
  * DOUBLE.
  */
object Relational {

  private val one = lit(BigDecimal("1.00"))
  private def dec12(c: String): Column = col(c).cast(DecimalType(12, 2))
  private def dec4(c: String): Column  = col(c).cast(DecimalType(4, 2))

  /** TPC-H Q1 pattern: single scan, map-side partial agg, 6 groups. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec12("l_quantity")).cast("double").as("sum_qty"),
        sum(dec12("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec12("l_extendedprice") * (one - dec4("l_discount"))).cast("double").as("sum_disc_price"),
        sum(dec12("l_extendedprice") * (one - dec4("l_discount")) * (one + dec4("l_tax")))
          .cast("double").as("sum_charge"),
        (sum(dec12("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec12("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3 pattern: selective dim filter, two fact joins, top-N.
    * Revenue is ranked on the exact decimal sum; ties broken by key.
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(dec12("l_extendedprice") * (one - dec4("l_discount"))).as("rev_exact"))
      .orderBy(col("rev_exact").desc, col("o_orderkey"))
      .limit(10)
      .select(
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"),
        col("rev_exact").cast("double").as("revenue"))
  }

  /** TPC-H Q5 pattern: small dims broadcast explicitly, facts shuffle
    * on their join keys, one partial-agg reduction at the end.
    */
  def regionVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum(dec12("l_extendedprice") * (one - dec4("l_discount"))).as("rev_exact"))
      .orderBy(col("rev_exact").desc, col("n_name"))
      .select(col("n_name"), col("rev_exact").cast("double").as("revenue"))
  }

  /** Top-3 parts per brand by lineitem revenue: rank() window over an
    * aggregated fact, ordered on the exact decimal for determinism.
    */
  def windowedTopN(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(dec12("l_extendedprice") * (one - dec4("l_discount"))).as("rev_exact"))
    val w = Window.partitionBy("p_brand").orderBy(col("rev_exact").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .join(rev, col("p_partkey") === col("l_partkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("rev_exact").cast("double").as("revenue"),
        col("rk"))
      .orderBy("p_brand", "rk")
  }

  /** TPC-H Q4 pattern: EXISTS as a left-semi join (no fact blowup). */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    Tables.orders(spark, dir)
      .join(li, col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }
}
