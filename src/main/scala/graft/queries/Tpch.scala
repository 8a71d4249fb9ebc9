package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sanity/throughput queries over the driver's TPC-H-ish corpus.
  *
  * These exercise the engine's scan → filter-pushdown → partial-agg path on
  * the largest base table (`lineitem`). All money arithmetic is done in
  * decimal (order-independent, parallel-safe); ratio columns are computed as
  * one final double division so results are bit-deterministic under any
  * partitioning — a requirement for the DuckDB differential oracle and for
  * reproducible results on a real cluster.
  */
object Tpch {

  private def dec(p: Int, s: Int) = DecimalType(p, s)

  /** Pricing summary (TPC-H Q1 shape) over lineitem. */
  def q1(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val qty = $"l_quantity".cast(dec(18, 2))
    val price = $"l_extendedprice".cast(dec(18, 2))
    val disc = $"l_discount".cast(dec(4, 2))
    val tax = $"l_tax".cast(dec(4, 2))

    li.filter($"l_quantity" < 48)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(qty).cast(dec(38, 2)).as("sum_qty"),
        sum(price).cast(dec(38, 2)).as("sum_base_price"),
        sum(price * (lit(1).cast(dec(4, 2)) - disc)).cast(dec(38, 4)).as("sum_disc_price"),
        sum(price * (lit(1).cast(dec(4, 2)) - disc) * (lit(1).cast(dec(4, 2)) + tax))
          .cast(dec(38, 6)).as("sum_charge"),
        round(sum(qty).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_qty"),
        round(sum(price).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_price"),
        round(sum(disc).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag,
              l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DECIMAL(38,6)) AS sum_charge,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_qty,
              ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_price,
              ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_disc,
              COUNT(1) AS count_order
       FROM lineitem
       WHERE l_quantity < 48
       GROUP BY l_returnflag, l_linestatus"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle)
}
