package graft

import org.apache.spark.sql.functions._

import graft.queries.{DataQuality, Insights}

/** Attribution, A/B lift, and the expectation report: credit conservation
  * laws, a driver-side replay of the lift stats, and dirty-corpus
  * detection for the DQ checks. */
class InsightsSpec extends SparkSpec {

  private val sf = SparkSpec.fixtureSf

  test("attribution: every credited conversion's credit sums to exactly 10000") {
    import spark.implicits._
    val rows = Insights.attribution(spark, sf).collect()
    val models = rows.map(_.getString(0)).distinct.sorted
    assert(models ===
      Array("first_touch", "last_touch", "linear", "time_decay"))
    // single-credit models hand out exactly 10^4 per credited conversion
    for (m <- Seq("last_touch", "first_touch")) {
      val r = rows.filter(_.getString(0) == m)
      assert(r.map(_.getLong(4)).sum === r.map(_.getLong(2)).sum * 10000L, m)
      // one touch per conversion
      assert(r.map(_.getLong(3)).sum === r.map(_.getLong(2)).sum, m)
    }
    // all four models agree on the total credit pool (same conversions)
    val pools = models.map(m =>
      rows.filter(_.getString(0) == m).map(_.getLong(4)).sum)
    assert(pools.distinct.length === 1,
      "remainder/deficit-to-last-touch must conserve every model's pool")
    // purchase can never be a credited channel (the window cuts at it)
    assert(rows.forall(_.getString(1) != "purchase"))
    // credited conversions cannot exceed the purchase count — for the
    // single-credit models per-channel conversion counts partition the
    // credited set, so the sum is exact; linear can credit one conversion
    // on several channels, so only the per-channel bound applies there
    graft.fixtures.Fixtures.register(spark, sf)
    val purchases = spark.table("raw")
      .filter($"event_type" === "purchase").count()
    for (m <- Seq("last_touch", "first_touch")) {
      val rs = rows.filter(_.getString(0) == m)
      assert(rs.map(_.getLong(2)).sum <= purchases, m)
    }
    rows.filter(_.getString(0) == "linear").foreach { r =>
      assert(r.getLong(2) <= purchases, s"linear/${r.getString(1)}")
      assert(r.getLong(3) >= r.getLong(2), s"linear/${r.getString(1)}")
    }
  }

  test("attribution curve: coverage is depth-invariant, touches grow strictly") {
    val rows = Insights.queries("events_attribution_curve")(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L))
    // a conversion has a valid touch at any depth iff lag-1 is valid —
    // deeper windows buy touch breadth, never coverage
    assert(rows.map(_.getLong(1)).distinct.length === 1, "credited varies")
    assert(rows.map(_.getLong(3)).distinct.length === 1, "coverage varies")
    val touches = rows.map(_.getLong(2))
    assert(touches.sameElements(touches.sorted) && touches.distinct.length === 3,
      "touches must strictly grow with depth")
    // depth-8 counters equal the full attribution's linear-model totals
    val att = Insights.attribution(spark, sf).collect()
      .filter(_.getString(0) == "linear")
    assert(att.map(_.getLong(3)).sum === rows.last.getLong(2))
  }

  test("ab lift matches a driver-side replay of the exact definitions") {
    import spark.implicits._
    val r = Insights.abLift(spark, sf).collect().head
    graft.fixtures.Fixtures.register(spark, sf)
    val rates = spark.table("raw")
      .groupBy($"user_id")
      .agg((sum(when($"event_type" === "purchase", 1L).otherwise(0L)) * 10000L
        / count(lit(1))).cast("long").as("rate"))
      .withColumn("variant", pmod($"user_id", lit(2)))
      .collect().map(x => (x.getAs[Long]("variant"), x.getAs[Long]("rate")))
    def stats(v: Long): (Long, Long, Long) = {
      val rs = rates.filter(_._1 == v).map(_._2)
      val n = rs.length.toLong
      val s = rs.sum
      val q = rs.map(x => x * x).sum
      (n, s / n, (n * q - s * s) / (n * n))
    }
    val (na, ma, va) = stats(0)
    val (nb, mb, vb) = stats(1)
    assert(r.getLong(0) === na)
    assert(r.getLong(1) === nb)
    assert(r.getLong(2) === ma)
    assert(r.getLong(3) === mb)
    assert(r.getLong(4) === mb - ma)
    val se2 = va / na + vb / nb + 1
    val isq = {
      var x = math.sqrt(se2.toDouble).toLong
      while (x * x > se2) x -= 1
      while ((x + 1) * (x + 1) <= se2) x += 1
      x
    }
    val z = (if (mb >= ma) 1L else -1L) * (math.abs(mb - ma) * 1000L / isq)
    assert(r.getLong(5) === z)
  }

  test("dq expectations: pristine fixture is all-clean, full check grid") {
    val rows = DataQuality.expectations(spark, sf).collect()
    assert(rows.length ===
      DataQuality.rowChecks.length + DataQuality.refChecks.length)
    rows.foreach { r =>
      assert(r.getLong(2) > 0, s"${r.getString(1)}: empty table")
      assert(r.getLong(3) === 0L, s"${r.getString(1)} flagged a clean corpus")
      assert(r.getLong(4) === 0L)
    }
  }

  test("dq expectations: a dirty batch is detected, exactly") {
    import spark.implicits._
    val dir = SparkSpec.fixtureDirExcept("documents", "orders")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dirtyDocs = docs
      .limit(3).collect().zipWithIndex.map { case (r, i) =>
        (900000L + i, if (i == 2) "" else r.getAs[String]("text"),
          if (i == 0) "xx" else r.getAs[String]("lang"),
          r.getAs[String]("source"),
          if (i == 1) -5L else if (i == 2) 0L
          else r.getAs[String]("text").length.toLong)
      }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.select($"doc_id".cast("long").as("doc_id"), $"text", $"lang",
        $"source", $"n_chars".cast("long").as("n_chars"))
      .unionByName(dirtyDocs)
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.limit(1)
      .withColumn("o_orderkey", lit(900000L))
      .withColumn("o_custkey", lit(-12345L)) // no such customer
      .unionByName(orders)
      .write.mode("overwrite").parquet(dir.resolve("orders.parquet").toString)

    val rows = DataQuality.expectations(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(rows(("documents", "lang_domain")) === 1L)
    assert(rows(("documents", "chars_consistent")) === 1L)
    assert(rows(("documents", "text_nonempty")) === 1L)
    assert(rows(("orders", "custkey_ref")) === 1L)
    // the injected orderkey 900000 has no lineitem rows, so lineitem's
    // referential side stays clean
    assert(rows(("lineitem", "orderkey_ref")) === 0L)
  }

  test("feature matrix is leakage-free and label-consistent by construction") {
    import spark.implicits._
    val fm = Insights.featureMatrix(spark, sf).collect()
    graft.fixtures.Fixtures.register(spark, sf)
    val purchases = spark.table("raw")
      .filter($"event_type" === "purchase")
      .select($"user_id").collect().map(_.getLong(0))
    // one training row per purchase
    assert(fm.length === purchases.length)
    // a user with k purchases labels the first k-1 rows 1 and the last 0
    val users = purchases.distinct.length.toLong
    assert(fm.map(_.getLong(6)).sum === purchases.length - users)
    fm.foreach { r =>
      assert(r.getLong(2) >= r.getLong(4), "prior events < prior purchases")
      assert((r.getString(5) == "none") === (r.getLong(2) == 0L),
        "last-type sentinel must coincide with an empty history")
      assert(r.getLong(3) >= 0L)
    }
    // per user, features are monotone in seq (prefix frames only grow)
    fm.groupBy(_.getLong(1)).values.foreach { rs =>
      val s = rs.sortBy(_.getLong(0))
      assert(s.map(_.getLong(2)).sameElements(s.map(_.getLong(2)).sorted))
      assert(s.map(_.getLong(4)).sameElements(s.map(_.getLong(4)).sorted))
    }
  }

  test("target encoding matches an independent DataFrame-side replay") {
    import spark.implicits._
    val te = Insights.targetEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    graft.fixtures.Fixtures.register(spark, sf)
    val base = spark.table("raw")
      .groupBy(($"cents" / 100).cast("long").as("cat"),
        pmod($"seq", lit(5)).as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(te.size === base.length)
    val nAll = base.map(_._3).sum
    val posAll = base.map(_._4).sum
    val prior = posAll * 10000L / nAll
    val byCat = base.groupBy(_._1)
    base.foreach { case (cat, fold, n, pos) =>
      val nOof = byCat(cat).map(_._3).sum - n
      val posOof = byCat(cat).map(_._4).sum - pos
      val r = te((cat, fold))
      assert(r.getLong(2) === nOof, s"cat $cat fold $fold n_oof")
      assert(r.getLong(3) === prior)
      assert(r.getLong(4) === (posOof * 10000L + 100L * prior) / (nOof + 100L),
        s"cat $cat fold $fold enc")
    }
  }

  test("te leakage: the in-fold encoder flatters itself on every fixture fold") {
    import spark.implicits._
    val rows = Insights.queries("events_te_leakage")(spark, sf).collect()
    assert(rows.length === 5)
    graft.fixtures.Fixtures.register(spark, sf)
    val total = spark.table("raw").count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10000L)
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2))
      // memorizing your own labels always LOOKS better on this corpus —
      // the optimism the out-of-fold construction removes
      assert(r.getLong(4) <= 0L, s"fold ${r.getLong(0)}")
    }
  }

  test("streaming dq gate flags a dirty batch mid-stream, exactly") {
    import spark.implicits._
    val dir = SparkSpec.fixtureDirExcept("events")
    graft.fixtures.Fixtures.register(spark, sf)
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("value",
        when($"event_id" < 2, lit(-5.0)).otherwise($"value"))
      .withColumn("event_type",
        when($"event_id" === 2, "bogus").otherwise($"event_type"))
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    val rows = graft.queries.StreamReplay.queries("streaming_dq_replay")(
      spark, dir.toString).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows("value_nonneg")._2 === 2L)
    assert(rows("type_domain")._2 === 1L)
    // every check saw the whole stream
    assert(rows.values.map(_._1).toSet.size === 1)
  }

  test("scd2 intervals partition each user's observed days, one current row") {
    import spark.implicits._
    val rows = Insights.queries("events_scd2_tiers")(spark, sf).collect()
    graft.fixtures.Fixtures.register(spark, sf)
    val userDays = spark.table("raw")
      .select($"user_id", expr("(block_number - 1000) * 120 DIV 86400").as("day"))
      .distinct().groupBy($"user_id").agg(count(lit(1)).as("d"), max($"day").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      // n_days over a user's intervals sums to their observed-day count
      assert(rs.map(_.getLong(4)).sum === userDays(u)._1, s"user $u")
      // intervals are ordered and non-overlapping
      val sorted = rs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) < b.getLong(2), s"user $u overlap")
          assert(a.getString(1) != b.getString(1), s"user $u un-merged islands")
        case _ =>
      }
      // exactly one current interval, and it ends on the user's last day
      val cur = rs.filter(_.getLong(5) == 1L)
      assert(cur.length === 1, s"user $u current count")
      assert(cur.head.getLong(3) === userDays(u)._2, s"user $u current end")
    }
  }

  test("dq profile matches a driver-side replay on one column of each kind") {
    import spark.implicits._
    val rows = DataQuality.profile(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.size === DataQuality.profileCols.length)
    graft.fixtures.Fixtures.register(spark, sf)

    // num100 lane: lineitem.l_quantity
    val q = spark.table("lineitem")
      .select(expr("CAST(FLOOR(l_quantity * 100) AS BIGINT)").as("c"),
        $"l_quantity")
      .agg(count(lit(1)), min($"c"), max($"c"), sum($"c"),
        countDistinct($"l_quantity")).collect().head
    val pq = rows(("lineitem", "l_quantity"))
    assert(pq.getLong(2) === q.getLong(0))   // n_rows
    assert(pq.getLong(3) === 0L)             // n_null
    assert(pq.getLong(4) === q.getLong(4))   // n_distinct
    assert(pq.getLong(5) === q.getLong(1))   // lo
    assert(pq.getLong(6) === q.getLong(2))   // hi
    assert(pq.getLong(7) === q.getLong(3))   // total

    // str lane: documents.lang — distincts count strings, measures lengths
    val pl = rows(("documents", "lang"))
    assert(pl.getLong(4) === 5L)
    assert(pl.getLong(5) === 2L && pl.getLong(6) === 2L)
    assert(pl.getLong(7) === 2L * pl.getLong(2))

    // every row of one table reports the same n_rows
    rows.values.groupBy(_.getString(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(2)).toSet.size === 1)
    }
  }

  test("dq drift: stationary halves read near-zero, an injected shift is loud") {
    val base = DataQuality.drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(base.size === 6)
    base.values.foreach { r =>
      assert(r.getLong(5) >= 0L, r.getString(1)) // psi never negative
      assert(r.getLong(3) > 0L && r.getLong(4) > 0L)
    }
    // the hash-generated corpus is stationary: every feature under 0.5 bits
    base.values.foreach { r =>
      assert(r.getLong(5) < 500000L,
        s"${r.getString(1)}: psi ${r.getLong(5)} on a stationary corpus")
    }

    // inject drift: the second half of documents flips entirely to 'de'
    import spark.implicits._
    val dir = SparkSpec.fixtureDirExcept("documents")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mx = docs.agg(max($"doc_id")).collect().head.getLong(0)
    docs.withColumn("lang",
        when($"doc_id" * 2 > mx, "de").otherwise($"lang"))
      .write.mode("overwrite").parquet(dir.resolve("documents.parquet").toString)
    val shifted = DataQuality.drift(spark, dir.toString).collect()
      .map(r => (r.getString(1), r.getLong(5))).toMap
    assert(shifted("lang") > 1000000L, s"lang psi ${shifted("lang")}")
    // untouched features stay quiet
    assert(shifted("source") < 500000L)
    assert(shifted("event_type") < 500000L)
  }
}
