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
  * referential check is ONE key-partitioned LEFT join against the distinct
  * dimension keys — counting rows and dangling keys in the same pass
  * (dimension side broadcastable when small, shuffle otherwise — Spark's
  * planner decides from stats). Nothing here collects, windows, or self-joins.
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

    // LEFT JOIN against the distinct dimension keys gives n_rows AND the
    // violation count in ONE pass over the fact table (the anti-join form
    // would need a second scan just for the denominator)
    val refReports = refChecks.map { case (table, nm, key, dim, dimKey) =>
      spark.table(table)
        .join(spark.table(dim).select(col(dimKey)).distinct(),
          col(key) === col(dimKey), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(dimKey).isNull, 1L).otherwise(0L)).as("n_violations"))
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

  // ------------------------------------------------------------- profile

  /** Profiled columns: (table, column, kind) where kind picks the integer
    * measure lane — `num100` = floor(x·100) centi-units (deterministic:
    * FLOOR on IEEE doubles is bit-identical across engines, unlike CAST,
    * where Spark truncates and DuckDB rounds), `int` = the value itself,
    * `str` = character length (distincts still count the string). */
  private[graft] val profileCols: Seq[(String, String, String)] = Seq(
    ("lineitem", "l_quantity", "num100"),
    ("lineitem", "l_extendedprice", "num100"),
    ("lineitem", "l_discount", "num100"),
    ("orders", "o_totalprice", "num100"),
    ("orders", "o_orderstatus", "str"),
    ("customer", "c_acctbal", "num100"),
    ("customer", "c_mktsegment", "str"),
    ("events", "value", "num100"),
    ("events", "user_id", "int"),
    ("events", "event_type", "str"),
    ("documents", "n_chars", "int"),
    ("documents", "lang", "str"),
    ("documents", "source", "str"))

  private def measureSql(col: String, kind: String): String = kind match {
    case "num100" => s"CAST(FLOOR($col * 100) AS BIGINT)"
    case "int"    => s"CAST($col AS BIGINT)"
    case "str"    => s"CAST(LENGTH($col) AS BIGINT)"
  }

  /** The column profiler (the Deequ-analyzer / `ANALYZE TABLE` operating
    * model as a catalog entry): per profiled column — row count, NULL
    * count, EXACT distinct count, and min/max/sum of the integer measure
    * lane. One scan per table computes every column's stats (the distinct
    * counts ride the same scan through one Expand), so adding a column to
    * the profile adds no pass over the data.
    *
    * Exact COUNT(DISTINCT) is kept because the differential gate demands
    * bit-equality; the 100 TB deployment swaps it for
    * `approx_count_distinct` (HLL — the `events_distinct_hll` entry is
    * that path, sketched and gated separately). SUM lanes hold to ~10¹²
    * rows at centi-scale before BIGINT saturates. */
  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    import spark.implicits._
    val perTable = profileCols.groupBy(_._1).toSeq.map { case (table, cols) =>
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap {
        case (_, c, kind) =>
          val m = expr(measureSql(c, kind))
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            min(m).as(s"lo_$c"), max(m).as(s"hi_$c"),
            sum(m).as(s"tot_$c"))
      }
      spark.table(table).agg(aggs.head, aggs.tail: _*)
        .select(lit(table).as("table_name"), $"n_rows",
          explode(array(cols.map { case (_, c, _) =>
            struct(lit(c).as("column_name"), col(s"nn_$c").as("n_null"),
              col(s"nd_$c").as("n_distinct"), col(s"lo_$c").as("lo"),
              col(s"hi_$c").as("hi"), col(s"tot_$c").as("total"))
          }: _*)).as("s"))
        .select($"table_name", $"s.column_name", $"n_rows",
          $"s.n_null".cast("long").as("n_null"),
          $"s.n_distinct".cast("long").as("n_distinct"),
          $"s.lo".cast("long").as("lo"), $"s.hi".cast("long").as("hi"),
          $"s.total".cast("long").as("total"))
    }
    perTable.reduce(_ unionByName _)
  }

  val profileOracle: String = {
    val arms = profileCols.map { case (table, c, kind) =>
      val m = measureSql(c, kind)
      s"""SELECT '$table' AS table_name, '$c' AS column_name,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
              CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
              CAST(MIN($m) AS BIGINT) AS lo,
              CAST(MAX($m) AS BIGINT) AS hi,
              CAST(SUM($m) AS BIGINT) AS total
          FROM $table"""
    }
    Fixtures.oracle(
      s""", dq_prof AS (
          ${arms.mkString("\n          UNION ALL ")})
         SELECT * FROM dq_prof""")
  }

  // --------------------------------------------------------------- drift

  /** Drift features: (table, feature, bin expressions with the integer-
    * division spelling injected, split key). The split key's max halves
    * the table into "history" (first half) and "latest batch" (second) —
    * the two snapshots the drift report compares. */
  private def driftArms(div: String): Seq[(String, String, Seq[(String, String)])] = Seq(
    ("raw", "seq", Seq(
      ("event_type", "event_type"),
      ("cents_decile", s"LEAST(cents $div 5700, 9)"),
      ("user_bucket", "user_id % 8"))),
    ("documents", "doc_id", Seq(
      ("lang", "lang"),
      ("source", "source"),
      ("chars_bucket", s"LEAST(n_chars $div 64, 9)"))))

  /** Distribution-drift report (the PSI monitor every feature store runs
    * between a new batch and history): each table splits at the midpoint
    * of its monotone id, each feature bins both halves on one GROUPING
    * SETS pass, and the population stability index comes out in EXACT
    * integer micro-bits:
    *
    *  - r = c · 10⁸ DIV n  (per-half bin rate; bounded by 10⁸ at ANY
    *    corpus size, so every later product stays inside BIGINT)
    *  - psi_micro = Σ (r1−r2)·(lg_fp(r1+1) − lg_fp(r2+1)) DIV 6 553 600
    *    (= 10⁸·2¹⁶/10⁶)
    *    — [[Unigram.lgFpSql]]'s 2¹⁶ fixed-point log2; both factors share a
    *    sign (lg_fp is monotone), so every term is non-negative and
    *    Spark's truncating DIV and DuckDB's flooring // agree
    *
    * Scale shape: ONE binning scan per table feeds ALL its features
    * (GROUPING SETS = one Expand + one map-side-combined aggregate over
    * ≤ dozens of bins), plus one 1-row max-key scan for the midpoint
    * (broadcast); the PSI fold runs over the bin frame with
    * feature-partitioned windows. Corpus NULLs would collide with the
    * grouping-set NULL — the profile entry's n_null row is the guard. */
  def drift(spark: SparkSession, sfDir: String): DataFrame = {
    Fixtures.register(spark, sfDir)
    spark.sql("WITH _one AS (SELECT 1)" + driftSql("DIV", spark = true))
  }

  private def driftSql(div: String, spark: Boolean): String = {
    val lg1 = Unigram.lgFpSql("(r1 + 1)", spark)
    val lg2 = Unigram.lgFpSql("(r2 + 1)", spark)
    val perTable = driftArms(div).map { case (table, key, feats) =>
      val binCols = feats.zipWithIndex.map { case ((_, e), i) =>
        s"CAST($e AS STRING) AS b$i" }.mkString(",\n              ")
      val sets = feats.indices.map(i => s"(b$i)").mkString(", ")
      val featName = feats.zipWithIndex.map { case ((nm, _), i) =>
        s"WHEN GROUPING(b$i) = 0 THEN '$nm'" }
        .mkString("CASE ", " ", " END")
      val coal = feats.indices.map(i => s"b$i").mkString("COALESCE(", ", ", ")")
      s"""(SELECT '$table' AS table_name, $featName AS feature, $coal AS bin,
              SUM(1 - h) AS c1, SUM(h) AS c2
          FROM (SELECT CASE WHEN $key * 2 <= m.mx THEN 0 ELSE 1 END AS h,
              $binCols
              FROM $table CROSS JOIN (SELECT MAX($key) AS mx FROM $table) m)
          GROUP BY GROUPING SETS ($sets))"""
    }
    s""", dqd_bins AS (
         ${perTable.mkString("\n         UNION ALL ")}),
       dqd_rates AS (
         SELECT table_name, feature, bin, c1, c2,
                c1 * CAST(100000000 AS BIGINT)
                  $div SUM(c1) OVER (PARTITION BY table_name, feature) AS r1,
                c2 * CAST(100000000 AS BIGINT)
                  $div SUM(c2) OVER (PARTITION BY table_name, feature) AS r2
         FROM dqd_bins)
       SELECT table_name, feature,
              CAST(COUNT(1) AS BIGINT) AS n_bins,
              CAST(SUM(c1) AS BIGINT) AS rows_a,
              CAST(SUM(c2) AS BIGINT) AS rows_b,
              CAST(SUM((r1 - r2) * ($lg1 - $lg2))
                   $div CAST(6553600 AS BIGINT) AS BIGINT) AS psi_micro,
              CAST(MAX(ABS(r1 - r2)) $div 10000 AS BIGINT) AS max_bin_shift_bp
       FROM dqd_rates
       GROUP BY table_name, feature"""
  }

  val driftOracle: String =
    Fixtures.oracle(driftSql("//", spark = false))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_expectations" -> (expectations _),
    "dq_profile" -> (profile _),
    "dq_drift" -> (drift _))

  val oracles: Map[String, String] = Map(
    "dq_expectations" -> expectationsOracle,
    "dq_profile" -> profileOracle,
    "dq_drift" -> driftOracle)
}
