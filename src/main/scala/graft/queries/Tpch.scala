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
        // sums accumulate in decimal (order-independent); the FINAL cast
        // canonicalizes across engines. A scale-6 sum cast straight to double
        // is only exact while unscaled < 2^53 (≈1.8× headroom at sf0.1) —
        // so the sum is first rounded to scale 2, which makes the double
        // conversion exact up to ~9e13 in value: any plausible sf. Spark's
        // decimal downscale cast rounds HALF_UP; the DuckDB oracle must use
        // ROUND(x, 2) (half-away-from-zero == HALF_UP for positives), NOT
        // CAST(x AS DECIMAL(38,2)), whose rounding differs.
        sum(qty).cast(DoubleType).as("sum_qty"),
        sum(price).cast(DoubleType).as("sum_base_price"),
        sum(price * (lit(1).cast(dec(4, 2)) - disc))
          .cast(dec(38, 2)).cast(DoubleType).as("sum_disc_price"),
        sum(price * (lit(1).cast(dec(4, 2)) - disc) * (lit(1).cast(dec(4, 2)) + tax))
          .cast(dec(38, 2)).cast(DoubleType).as("sum_charge"),
        round(sum(qty).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_qty"),
        round(sum(price).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_price"),
        round(sum(disc).cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Oracle: String =
    """SELECT l_returnflag,
              l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_qty,
              ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_price,
              ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6) AS avg_disc,
              COUNT(1) AS count_order
       FROM lineitem
       WHERE l_quantity < 48
       GROUP BY l_returnflag, l_linestatus"""

  /** Top unshipped-revenue orders (TPC-H Q3 shape): 3-way join over the two
    * largest tables + broadcast-sized customer dim, decimal-exact revenue,
    * deterministic top-k. */
  def q3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    // Pre-aggregate revenue per orderkey BEFORE the join: the join input
    // shrinks ~4× (lineitems per order) and the post-join agg disappears —
    // (o_orderdate, o_orderpriority) are functionally dependent on
    // o_orderkey, so joining the pre-agg is semantically identical.
    val revByOrder = li.groupBy($"l_orderkey")
      .agg(sum($"rev").cast(dec(38, 2)).cast(DoubleType).as("revenue"))

    orders
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(revByOrder, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority", $"revenue")
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(20)
  }

  val q3Oracle: String =
    """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, o.o_orderkey
       LIMIT 20"""

  /** Regional supplier volume (TPC-H Q5 shape): the full dimension chain
    * region→nation→supplier broadcast against lineitem. */
  def q5(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_suppkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    val dims = supplier.join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select($"s_suppkey", $"n_name", $"r_name")

    li.join(broadcast(dims), $"l_suppkey" === $"s_suppkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum($"rev").cast(dec(38, 2)).cast(DoubleType).as("revenue"),
        count(lit(1)).as("lineitem_count"))
  }

  val q5Oracle: String =
    """SELECT r.r_name, n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
              COUNT(1) AS lineitem_count
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _),
    "q3_top_orders" -> (q3 _),
    "q5_regional_volume" -> (q5 _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle,
    "q3_top_orders" -> q3Oracle,
    "q5_regional_volume" -> q5Oracle)
}
