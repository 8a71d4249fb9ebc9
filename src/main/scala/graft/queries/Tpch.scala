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

  /** Min-cost supplier per part (TPC-H Q2 shape, adapted: the corpus has no
    * partsupp table, so "suppliers offering the part" = suppliers observed
    * shipping it in lineitem, and "cost" = s_acctbal). The classic
    * correlated-MIN subquery is decorrelated to a `min_by` aggregate — one
    * shuffle on l_partkey over the DISTINCT (part, supplier) pairs, which are
    * already far smaller than lineitem. Ties broken by s_suppkey so the
    * winner is unique under any partitioning. */
  def q2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_size" <= 3)
      .select($"p_partkey", $"p_name")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey").distinct()

    pairs
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(min_by(struct($"s_name", $"s_acctbal"), struct($"s_acctbal", $"s_suppkey")).as("best"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .select($"p_partkey", $"p_name",
        $"best.s_name".as("s_name"), $"best.s_acctbal".as("s_acctbal"))
  }

  val q2Oracle: String =
    """SELECT p.p_partkey, p.p_name, b.s_name, b.s_acctbal
       FROM part p
       JOIN (SELECT ps.l_partkey, s.s_name, s.s_acctbal,
                    ROW_NUMBER() OVER (PARTITION BY ps.l_partkey
                                       ORDER BY s.s_acctbal, s.s_suppkey) AS rn
             FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             JOIN supplier s ON ps.l_suppkey = s.s_suppkey) b
         ON p.p_partkey = b.l_partkey AND b.rn = 1
       WHERE p.p_size <= 3"""

  /** Order-priority count under an EXISTS (TPC-H Q4 shape, adapted: the
    * corpus has no commit/receipt dates, so "late" = shipped more than a year
    * after the order date). The correlated EXISTS is a LEFT SEMI hash join on
    * l_orderkey with the lateness comparison as an extra join condition — no
    * subquery re-execution, one shuffle, and the semi join short-circuits per
    * order on the first qualifying lineitem. */
  def q4(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_shipdate")

    orders
      .join(li,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 365 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Oracle: String =
    """SELECT o.o_orderpriority, COUNT(1) AS order_count
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
       GROUP BY 1"""

  /** Cross-nation shipping volume (TPC-H Q7 shape): revenue between
    * (supplier nation, customer nation) pairs per ship year. One genuine
    * fact-to-fact shuffle join (lineitem ⋈ orders on orderkey — both sides
    * corpus-sized at 100 TB, so this is the standard repartition join);
    * everything dimension-shaped (customer, supplier, nation) broadcasts.
    * Revenue is pre-projected to one decimal column before the shuffle. */
  def q7(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val custNation = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val suppNation = spark.read.parquet(s"$sfDir/supplier.parquet")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val orderCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
      .join(broadcast(custNation), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"cust_nation")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey",
        year($"l_shipdate").cast(LongType).as("ship_year"),
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    li.join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(orderCust, $"l_orderkey" === $"o_orderkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"ship_year")
      .agg(sum($"rev").cast(dec(38, 2)).cast(DoubleType).as("revenue"))
  }

  val q7Oracle: String =
    """SELECT sn.n_name AS supp_nation,
              cn.n_name AS cust_nation,
              CAST(YEAR(l.l_shipdate) AS BIGINT) AS ship_year,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       WHERE sn.n_name <> cn.n_name
       GROUP BY 1, 2, 3"""

  /** Top customers by returned-item revenue (TPC-H Q10 shape). Revenue is
    * pre-aggregated per customer key BEFORE the dimension join — the grouped
    * frame is customer-sized, so the name/nation join broadcasts against it
    * rather than widening every lineitem row. Deterministic top-20 via the
    * c_custkey tiebreak. */
  def q10(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val returned = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    returned
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"rev").cast(dec(38, 2)).cast(DoubleType).as("revenue"))
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"n_name", $"revenue")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Oracle: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, c.c_custkey
       LIMIT 20"""

  /** Large-volume orders (TPC-H Q18 shape): orders whose total quantity
    * exceeds 250. The HAVING subquery is ONE map-side-combinable groupBy on
    * l_orderkey; the surviving keys (p99 of orders) then join orders and the
    * broadcast customer dim. No IN-subquery re-scan of lineitem. */
  def q18(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_name")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast(dec(18, 2))).as("sum_qty"))
      .filter($"sum_qty" > 250)

    orders
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        $"sum_qty".cast(DoubleType).as("sum_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Oracle: String =
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
              CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY 1, 2, 3, 4, 5
       HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 250
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 100"""

  /** Suppliers who alone held up multi-supplier orders (TPC-H Q21 shape,
    * adapted lateness: shipped >730 days after the order date).
    *
    * The double correlation (EXISTS another supplier on the order /
    * NOT EXISTS another LATE supplier) is decided by two per-order
    * NUMBERS, not by self-joins: with n_supp = distinct suppliers on the
    * order and n_late_supp = distinct LATE suppliers, a late (order,
    * supplier) row qualifies iff n_supp ≥ 2 (someone else supplied) and
    * n_late_supp = 1 (the only late supplier is itself). numwait counts
    * late LINEITEM rows, so each qualifying (order, supplier) contributes
    * its late-row count. The former shape instantiated the
    * lineitem⋈orders projection three times (outer + semi + anti self-
    * joins, three l_orderkey shuffles of it); this one scans it ONCE and
    * computes both per-order counts as window aggregates over the same
    * l_orderkey partitioning, so after the single repartition nothing
    * reshuffles until the |suppliers|-bounded final aggregate (opt guide
    * §2.4/§3.2: remove the repeated big-side passes rather than prefilter
    * them). Oracle text unchanged — the DuckDB gate proves the rewrite. */
  def q21(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name")
    val lo = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(spark.read.parquet(s"$sfDir/orders.parquet")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 730 DAYS")).as("late"))

    // per (order, supplier): late-row count, then the per-ORDER counts as
    // window aggregates over the same l_orderkey partitioning — one
    // repartition serves the (order, supplier) aggregate, the two order-
    // level counts, AND the qualification filter (HashPartitioning(ok)
    // satisfies ClusteredDistribution(ok, sk)); an os⋈ord formulation
    // instead re-instantiates the whole scan+agg subtree per consumer.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_orderkey")
    lo.repartition($"l_orderkey")
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum(when($"late", 1L).otherwise(0L)).as("n_late"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", sum(when($"n_late" > 0, 1L).otherwise(0L)).over(w))
      .filter($"n_late" > 0 && $"n_supp" >= 2 && $"n_late_supp" === 1)
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(sum($"n_late").as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(25)
  }

  val q21Oracle: String =
    """WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
                          (l.l_shipdate > o.o_orderdate + INTERVAL 730 DAY) AS late
                   FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       SELECT s.s_name, COUNT(1) AS numwait
       FROM lo l1
       JOIN supplier s ON l1.l_suppkey = s.s_suppkey
       WHERE l1.late
         AND EXISTS (SELECT 1 FROM lo l2
                     WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lo l3
                         WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.late)
       GROUP BY 1
       ORDER BY numwait DESC, s.s_name
       LIMIT 25"""

  /** Forecast-revenue change (TPC-H Q6): pure scan → pushed filter →
    * single partial-aggregated sum, zero joins and zero shuffles beyond the
    * final 1-row combine. The fastest possible shape at 100 TB: every
    * predicate reaches the parquet reader as a PushedFilter and only 4 of
    * 11 lineitem columns are read. */
  def q6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        $"l_shipdate" < expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(sum($"l_extendedprice".cast(dec(18, 2)) * $"l_discount".cast(dec(4, 2)))
        .cast(dec(38, 2)).cast(DoubleType).as("revenue"))
  }

  val q6Oracle: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""

  /** Promotion revenue share (TPC-H Q14 shape): one month of lineitem
    * against the broadcast part dim, conditional decimal sums, one final
    * double division. */
  def q14(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_type")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= expr("TIMESTAMP '1996-03-01 00:00:00'") &&
        $"l_shipdate" < expr("TIMESTAMP '1996-04-01 00:00:00'"))
      .select($"l_partkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"rev").otherwise(lit(0).cast(dec(18, 4))))
          .cast(dec(38, 2)).as("promo"),
        sum($"rev").cast(dec(38, 2)).as("total"))
      .select(round(lit(100.0) * $"promo".cast(DoubleType) / $"total".cast(DoubleType), 6)
        .as("promo_revenue"))
  }

  val q14Oracle: String =
    """SELECT ROUND(100.0
               * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                        ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
               / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE),
             6) AS promo_revenue
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
         AND l.l_shipdate < TIMESTAMP '1996-04-01'"""

  /** Top supplier(s) by quarterly revenue (TPC-H Q15 shape): the revenue
    * view is one map-side-combinable groupBy on l_suppkey; the "= MAX of
    * the view" correlation becomes a global window max over the
    * supplier-sized aggregate (output-sized input, so the unpartitioned
    * window is safe by construction). Decimal revenue makes the tie
    * comparison exact; genuine ties all surface, as in the spec query. */
  def q15(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name")
    val revenue = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        $"l_shipdate" < expr("TIMESTAMP '1996-04-01 00:00:00'"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice".cast(dec(18, 2)) *
        (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2))))
        .cast(dec(38, 2)).as("total_revenue"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    revenue
      .withColumn("max_rev", max($"total_revenue").over(w))
      .filter($"total_revenue" === $"max_rev")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        $"total_revenue".cast(DoubleType).as("total_revenue"))
  }

  val q15Oracle: String =
    """WITH revenue AS (
         SELECT l_suppkey,
                ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY 1)
       SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
       FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
       WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)"""

  /** Small-quantity-order revenue (TPC-H Q17 shape): lineitems below 20%
    * of their part's average quantity. The correlated AVG subquery is
    * decorrelated to ONE per-part aggregate joined back on l_partkey, and
    * the threshold `qty < 0.2 * avg` is compared as
    * `qty * 5 * count < sum` — exact decimal cross-multiplication, no
    * double division on the comparison path. */
  def q17(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_quantity".cast(dec(18, 2)).as("qty"),
        $"l_extendedprice".cast(dec(18, 2)).as("price"))
    val perPart = li.groupBy($"l_partkey".as("agg_partkey"))
      .agg(sum($"qty").as("sum_qty"), count(lit(1)).as("n_li"))

    li.join(perPart, $"l_partkey" === $"agg_partkey")
      .filter($"qty" * 5 * $"n_li" < $"sum_qty")
      .agg(sum($"price").cast(dec(38, 2)).cast(DoubleType).as("small_lot_revenue"))
  }

  val q17Oracle: String =
    """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS small_lot_revenue
       FROM lineitem l
       JOIN (SELECT l_partkey AS agg_partkey,
                    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                    COUNT(1) AS n_li
             FROM lineitem GROUP BY 1) p
         ON l.l_partkey = p.agg_partkey
       WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * p.n_li < p.sum_qty"""

  /** Disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
    * brand/size/quantity branches over the lineitem ⋈ part join. The join
    * key is the only equi-condition; the disjunction stays a post-join
    * filter that Catalyst pushes to each side as far as its columns allow
    * (quantity bounds to lineitem, size/brand bounds to part). */
  def q19(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_brand", $"p_size")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_quantity",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
      .agg(sum($"rev").cast(dec(38, 2)).cast(DoubleType).as("revenue"))
  }

  val q19Oracle: String =
    """SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)"""

  /** Dormant high-balance customers (TPC-H Q22 shape, adapted: nation key
    * stands in for the phone country code). The global-average threshold is
    * compared by CROSS-MULTIPLICATION (`c_acctbal * n > total`) so both
    * engines decide each borderline customer with exact decimal arithmetic —
    * an avg-as-double threshold could flip a customer on the last ulp. The
    * 1-row average broadcasts; "dormant" (no order since 1999 — every
    * customer in this corpus has SOME order) is a LEFT ANTI join against
    * the date-filtered orders, with the date predicate pushed to the
    * orders scan. */
  def q22(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal".cast(dec(18, 2)).as("bal"))
    val thr = cust.filter($"bal" > 0)
      .agg(sum($"bal").as("tot"), count(lit(1)).as("n"))
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter($"o_orderdate" >= expr("TIMESTAMP '1999-01-01 00:00:00'"))
      .select($"o_custkey")

    cust
      .join(broadcast(thr))
      .filter($"bal" * $"n" > $"tot")
      .join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey".cast(LongType).as("nation"))
      .agg(count(lit(1)).as("numcust"),
        sum($"bal").cast(dec(38, 2)).cast(DoubleType).as("totacctbal"))
  }

  val q22Oracle: String =
    """WITH c AS (SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
                  FROM customer),
            t AS (SELECT SUM(bal) AS tot, COUNT(1) AS n FROM c WHERE bal > 0)
       SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
              COUNT(1) AS numcust,
              CAST(ROUND(SUM(c.bal), 2) AS DOUBLE) AS totacctbal
       FROM c, t
       WHERE c.bal * t.n > t.tot
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '1999-01-01')
       GROUP BY 1"""

  /** National market share (TPC-H Q8 shape): NATION_3 suppliers' share of
    * ECONOMY-part revenue sold to AMERICA-region customers, per order year.
    * Every dimension chain (part, supplier→nation, customer→nation→region)
    * broadcasts; the one fact-to-fact shuffle is lineitem ⋈ orders on
    * orderkey, with orders pre-shrunk by the region semi-join and projected
    * to (orderkey, year) before the exchange. The share divides two decimal
    * sums as ONE final double division (same discipline as q14). */
  def q8(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val region = spark.read.parquet(s"$sfDir/region.parquet")
      .filter($"r_name" === "AMERICA")
    val regionCust = spark.read.parquet(s"$sfDir/customer.parquet")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter($"o_orderdate" >= expr("TIMESTAMP '1995-01-01 00:00:00'") &&
        $"o_orderdate" < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      .join(broadcast(regionCust), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", year($"o_orderdate").cast(LongType).as("o_year"))
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_type" === "ECONOMY")
      .select($"p_partkey")
    val suppNation = spark.read.parquet(s"$sfDir/supplier.parquet")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"))

    li.join(broadcast(part), $"l_partkey" === $"p_partkey", "left_semi")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_year")
      .agg(
        sum(when($"n_name" === "NATION_3", $"rev").otherwise(lit(0).cast(dec(18, 4))))
          .cast(dec(38, 2)).as("nat"),
        sum($"rev").cast(dec(38, 2)).as("tot"))
      .select($"o_year",
        round($"nat".cast(DoubleType) / $"tot".cast(DoubleType), 6).as("mkt_share"))
  }

  val q8Oracle: String =
    """SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
              ROUND(CAST(ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3'
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                       ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
                  / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE),
                    6) AS mkt_share
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       JOIN region r ON cn.n_regionkey = r.r_regionkey
       WHERE p.p_type = 'ECONOMY'
         AND r.r_name = 'AMERICA'
         AND o.o_orderdate >= TIMESTAMP '1995-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY 1"""

  /** Product-type profit (TPC-H Q9 shape, adapted: no partsupp, so unit
    * supply cost = 10% of p_retailprice). Profit per (supplier nation, order
    * year) over 'widget' parts. Every term stays in EXACT decimal until the
    * final rounding — qty(9,2) × retail(9,2) × 0.10(4,2) never exceeds the
    * multiply-scale budget in either engine, so no intermediate rounding can
    * diverge. Part and supplier-nation broadcast; lineitem ⋈ orders is the
    * one genuine shuffle, carrying (orderkey, year) only. */
  def q9(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice")
    val suppNation = spark.read.parquet(s"$sfDir/supplier.parquet")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", year($"o_orderdate").cast(LongType).as("o_year"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        ($"l_extendedprice".cast(dec(18, 2)) *
          (lit(1).cast(dec(4, 2)) - $"l_discount".cast(dec(4, 2)))).as("rev"),
        $"l_quantity".cast(dec(9, 2)).as("qty"))

    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNation), $"l_suppkey" === $"s_suppkey")
      .join(orders, $"l_orderkey" === $"o_orderkey")
      .select($"n_name", $"o_year",
        ($"rev" - $"qty" * $"p_retailprice".cast(dec(9, 2)) * lit(0.10).cast(dec(4, 2)))
          .as("amount"))
      .groupBy($"n_name", $"o_year")
      .agg(sum($"amount").cast(dec(38, 2)).cast(DoubleType).as("sum_profit"))
  }

  val q9Oracle: String =
    """SELECT sn.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                     - CAST(l.l_quantity AS DECIMAL(9,2))
                       * CAST(p.p_retailprice AS DECIMAL(9,2))
                       * CAST(0.10 AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_profit
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY 1, 2"""

  /** Important-part inventory value (TPC-H Q11 shape, adapted: no partsupp,
    * so a part's "stock value" = its total shipped qty × price from
    * lineitem). Parts whose value exceeds 1.5× the MEAN part value — a
    * scale-free threshold (the spec's fixed fraction of the grand total
    * empties as the part count grows). The global (total, count) is a 1-row
    * broadcast compared by CROSS-MULTIPLICATION (`2 × value × n > 3 × total`) —
    * exact decimal on both engines, no double-ulp flip on borderline parts
    * (same discipline as q22). */
  def q11(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perPart = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey",
        ($"l_quantity".cast(dec(9, 2)) * $"l_extendedprice".cast(dec(18, 2))).as("val"))
      .groupBy($"l_partkey")
      .agg(sum($"val").cast(dec(28, 4)).as("value"))
    val total = perPart.agg(
      sum($"value").cast(dec(32, 4)).as("tot"), count(lit(1)).as("n"))

    perPart
      .join(broadcast(total))
      .filter($"value" * $"n" * lit(2).cast(dec(2, 0)) > $"tot" * lit(3).cast(dec(2, 0)))
      .select($"l_partkey", $"value".cast(dec(38, 2)).cast(DoubleType).as("value"))
  }

  val q11Oracle: String =
    """WITH pp AS (SELECT l_partkey,
                          CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))
                                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS value
                   FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(SUM(value) AS DECIMAL(32,4)) AS tot, COUNT(1) AS n FROM pp)
       SELECT pp.l_partkey, CAST(ROUND(pp.value, 2) AS DOUBLE) AS value
       FROM pp, t
       WHERE pp.value * t.n * CAST(2 AS DECIMAL(2,0)) > t.tot * CAST(3 AS DECIMAL(2,0))"""

  /** Late-shipment priority split (TPC-H Q12 shape, adapted: no l_shipmode /
    * receipt dates, so the grouping axis is l_returnflag and "late" =
    * shipped >90 days after the order date; one observation year). The
    * orderkey join is the single fact-to-fact shuffle; both CASE counts are
    * map-side-combinable sums. */
  def q12(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
        $"l_shipdate" < expr("TIMESTAMP '1998-01-01 00:00:00'"))
      .select($"l_orderkey", $"l_returnflag", $"l_shipdate")

    li.join(orders, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
  }

  val q12Oracle: String =
    """SELECT l.l_returnflag,
              CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
         AND l.l_shipdate < TIMESTAMP '1998-01-01'
         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
       GROUP BY 1"""

  /** Customer order-count distribution (TPC-H Q13 shape, adapted: the
    * "special-request" exclusion filters on o_orderpriority instead of the
    * absent comment column). The LEFT OUTER join keeps order-less customers
    * (c_count = 0 bucket); `count(o_orderkey)` counts only matched rows.
    * Two shuffles total: custkey for the per-customer count, then the
    * count-histogram re-agg over a customer-sized frame. */
  def q13(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
      .select($"o_orderkey", $"o_custkey")

    cust
      .join(orders, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Oracle: String =
    """SELECT c_count, COUNT(1) AS custdist
       FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
             FROM customer c
             LEFT OUTER JOIN orders o
               ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '4-NOT SPECIFIED'
             GROUP BY 1) cc
       GROUP BY 1"""

  /** Supplier counts per part attribute (TPC-H Q16 shape, adapted:
    * "suppliers offering the part" = distinct (part, supplier) pairs
    * observed in lineitem; the complaint exclusion = negative-balance
    * suppliers, removed by a LEFT ANTI join before counting). The DISTINCT
    * pair projection is the only lineitem-sized shuffle; part attributes
    * broadcast; COUNT(DISTINCT suppkey) expands to the standard two-level
    * distinct aggregate on a pairs-sized frame. */
  def q16(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_brand" =!= "Brand#12" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    val complaints = spark.read.parquet(s"$sfDir/supplier.parquet")
      .filter($"s_acctbal" < 0)
      .select($"s_suppkey")
    val pairs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey").distinct()

    pairs
      .join(broadcast(complaints), $"l_suppkey" === $"s_suppkey", "left_anti")
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size".cast(LongType).as("p_size"))
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  val q16Oracle: String =
    """SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
              COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       JOIN part p ON ps.l_partkey = p.p_partkey
       WHERE p.p_brand <> 'Brand#12'
         AND p.p_type <> 'PROMO'
         AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
         AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3"""

  /** Dominant suppliers of STANDARD parts (TPC-H Q20 shape, adapted: no
    * ps_availqty, so the nested quantity correlation becomes "supplier
    * shipped MORE than half of the part's total 1996 volume"). Two stacked
    * aggregates over the same filtered projection — per (part, supplier),
    * then per part — joined back and compared by cross-multiplication
    * (`2 × qty > part total`, exact decimal); suppliers with ≥1 dominant
    * part survive a final LEFT SEMI into the broadcast supplier dim. */
  def q20(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .filter($"p_type" === "STANDARD")
      .select($"p_partkey")
    val ps = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter($"l_shipdate" >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
        $"l_shipdate" < expr("TIMESTAMP '1997-01-01 00:00:00'"))
      .join(broadcast(part), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast(dec(18, 2))).as("qty"))
    val perPart = ps.groupBy($"l_partkey".as("agg_partkey"))
      .agg(sum($"qty").as("part_qty"))

    val dominant = ps
      .join(perPart, $"l_partkey" === $"agg_partkey")
      .filter($"qty" * 2 > $"part_qty")
      .select($"l_suppkey").distinct()

    supp
      .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"n_name")
  }

  val q20Oracle: String =
    """WITH ps AS (SELECT l.l_partkey, l.l_suppkey,
                          SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
                   FROM lineitem l
                   JOIN part p ON l.l_partkey = p.p_partkey
                   WHERE p.p_type = 'STANDARD'
                     AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l.l_shipdate < TIMESTAMP '1997-01-01'
                   GROUP BY 1, 2),
            pt AS (SELECT l_partkey, SUM(qty) AS part_qty FROM ps GROUP BY 1)
       SELECT s.s_suppkey, s.s_name, n.n_name
       FROM supplier s
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE s.s_suppkey IN (SELECT ps.l_suppkey
                             FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
                             WHERE ps.qty * 2 > pt.part_qty)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _),
    "q2_min_cost_supplier" -> (q2 _),
    "q3_top_orders" -> (q3 _),
    "q4_late_order_priority" -> (q4 _),
    "q5_regional_volume" -> (q5 _),
    "q6_forecast_revenue" -> (q6 _),
    "q14_promo_revenue" -> (q14 _),
    "q15_top_supplier" -> (q15 _),
    "q17_small_lot_revenue" -> (q17 _),
    "q19_disjunctive_revenue" -> (q19 _),
    "q22_dormant_customers" -> (q22 _),
    "q7_nation_volume" -> (q7 _),
    "q8_market_share" -> (q8 _),
    "q9_product_profit" -> (q9 _),
    "q10_returned_items" -> (q10 _),
    "q11_important_parts" -> (q11 _),
    "q12_priority_shipping" -> (q12 _),
    "q13_order_distribution" -> (q13 _),
    "q16_supplier_part_counts" -> (q16 _),
    "q18_large_orders" -> (q18 _),
    "q20_dominant_suppliers" -> (q20 _),
    "q21_waiting_suppliers" -> (q21 _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle,
    "q2_min_cost_supplier" -> q2Oracle,
    "q3_top_orders" -> q3Oracle,
    "q4_late_order_priority" -> q4Oracle,
    "q5_regional_volume" -> q5Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q14_promo_revenue" -> q14Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q17_small_lot_revenue" -> q17Oracle,
    "q19_disjunctive_revenue" -> q19Oracle,
    "q22_dormant_customers" -> q22Oracle,
    "q7_nation_volume" -> q7Oracle,
    "q8_market_share" -> q8Oracle,
    "q9_product_profit" -> q9Oracle,
    "q10_returned_items" -> q10Oracle,
    "q11_important_parts" -> q11Oracle,
    "q12_priority_shipping" -> q12Oracle,
    "q13_order_distribution" -> q13Oracle,
    "q16_supplier_part_counts" -> q16Oracle,
    "q18_large_orders" -> q18Oracle,
    "q20_dominant_suppliers" -> q20Oracle,
    "q21_waiting_suppliers" -> q21Oracle)
}
