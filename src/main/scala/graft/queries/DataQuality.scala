package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.Fixtures

/** Data-quality expectation checks — the validation stage every production
  * pipeline runs at the ingest boundary before anything downstream trusts
  * the batch (the Great-Expectations / dbt-test operating model, re-expressed
  * as ONE catalog entry): each check is a row predicate (domain, range,
  * consistency) or a referential-integrity probe, and the report carries
  * exact violation counts per (table, check) — a batch gate reads
  * `violation_bp` against its tolerance and fails the load, instead of
  * letting a malformed batch poison 100 TB of downstream state.
  *
  * Scale shape: ONE scan per checked table computes ALL of that table's
  * row-predicate counts in a single map-side-combined aggregate (violation
  * predicates are free riders on the scan — no per-check passes); each
  * referential check is one key-partitioned LEFT ANTI join (dimension side
  * broadcastable when small, shuffle otherwise — Spark's planner decides
  * from stats). Nothing here collects, windows, or self-joins.
  *
  * Exactness: counts are integer aggregates; NULL predicate results count
  * as non-violations in BOTH engines (SUM(CASE WHEN p THEN 1 ELSE 0 END)
  * semantics) — checks that must flag NULLs say `IS NULL OR` explicitly.
  */
object DataQuality {

  /** Row-predicate expectations: (table, check, violation predicate) in
    * dialect-common SQL — the SAME text runs in Spark and DuckDB, so the
    * oracle replays the check verbatim. */
  private[graft] val rowChecks: Seq[(String, String, String)] = Seq(
    ("lineitem", "quantity_range", "NOT (l_quantity BETWEEN 1 AND 50)"),
    ("lineitem", "discount_range", "NOT (l_discount BETWEEN 0 AND 0.10)"),
    ("orders", "status_domain", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    ("orders", "totalprice_positive", "NOT (o_totalprice > 0)"),
    ("events", "value_nonneg", "value IS NULL OR value < 0"),
    ("events", "type_domain",
      "event_type IS NULL OR event_type NOT IN " +
        "('view', 'click', 'purchase', 'signup', 'error')"),
    ("documents", "chars_consistent", "n_chars <> length(text)"),
    ("documents", "lang_domain",
      "lang IS NULL OR lang NOT IN ('en', 'de', 'zh', 'fr', 'es')"),
    ("documents", "text_nonempty", "length(text) = 0"))

  /** Referential expectations: (fact table, check, fact key, dim table,
    * dim key) — a fact key value with no dimension row is a violation. */
  private[graft] val refChecks: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem", "orderkey_ref", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "custkey_ref", "o_custkey", "customer", "c_custkey"))

  /** The expectation report: one row per check with exact violation counts
    * and the violation rate in basis points. */
  def expectations(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._

    val rowReports = rowChecks.groupBy(_._1).toSeq.map { case (table, checks) =>
      val aggs = count(lit(1)).as("n_rows") +:
        checks.map { case (_, nm, pred) =>
          sum(when(expr(pred), 1L).otherwise(0L)).as(s"v_$nm") }
      spark.table(table).agg(aggs.head, aggs.tail: _*)
        .select(lit(table).as("table_name"), $"n_rows",
          explode(array(checks.map { case (_, nm, _) =>
            struct(lit(nm).as("check_name"), col(s"v_$nm").as("n_violations"))
          }: _*)).as("c"))
        .select($"table_name", $"c.check_name", $"n_rows", $"c.n_violations")
    }

    val refReports = refChecks.map { case (table, nm, key, dim, dimKey) =>
      val viol = spark.table(table)
        .join(spark.table(dim), col(key) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      spark.table(table).agg(count(lit(1)).as("n_rows"))
        .crossJoin(viol)
        .select(lit(table).as("table_name"), lit(nm).as("check_name"),
          $"n_rows", $"n_violations")
    }

    (rowReports ++ refReports).reduce(_ unionByName _)
      .select($"table_name", $"check_name", $"n_rows",
        $"n_violations".cast(LongType).as("n_violations"),
        expr("n_violations * 10000 DIV n_rows").cast(LongType)
          .as("violation_bp"))
  }

  val expectationsOracle: String = {
    val rowArms = rowChecks.map { case (table, nm, pred) =>
      s"""SELECT '$table' AS table_name, '$nm' AS check_name,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM $table"""
    }
    val refArms = refChecks.map { case (table, nm, key, dim, dimKey) =>
      s"""SELECT '$table' AS table_name, '$nm' AS check_name,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN d.$dimKey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
          FROM $table f
          LEFT JOIN (SELECT DISTINCT $dimKey FROM $dim) d ON d.$dimKey = f.$key"""
    }
    Fixtures.oracle(
      s""", dq_all AS (
          ${(rowArms ++ refArms).mkString("\n          UNION ALL ")})
         SELECT table_name, check_name, n_rows, n_violations,
                CAST(n_violations * 10000 // n_rows AS BIGINT) AS violation_bp
         FROM dq_all""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_expectations" -> (expectations _))

  val oracles: Map[String, String] = Map(
    "dq_expectations" -> expectationsOracle)
}
