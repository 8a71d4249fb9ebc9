package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.RollupRefresher

/** T6 incremental-refresh law for ALL FOUR hourly rollups: a
  * [[RollupRefresher]] tick rewrites only the `hour >= since` partitions,
  * and the maintained table stays hash-equal to the full recompute. */
class RollupIncrementalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val fullBuilders: Seq[(String, () => DataFrame)] = Seq(
    ("hourly_volume_by_token", () => graft.queries.Rollups.hourlyVolumeByToken(spark, sfDir)),
    ("hourly_revenue_by_token", () => graft.queries.Rollups.hourlyRevenueByToken(spark, sfDir)),
    ("hourly_price_data", () => graft.queries.Rollups.hourlyPriceData(spark, sfDir)),
    ("hourly_tvl_delta_by_token", () => graft.queries.Rollups.hourlyTvlDeltaByToken(spark, sfDir)))

  /** data files per hour-partition directory (name → sorted file names);
    * rewritten partitions get fresh part-file UUIDs, untouched ones keep
    * byte-identical listings. */
  private def partitionFiles(tableDir: String): Map[String, Seq[String]] = {
    val dirs = Option(new File(tableDir).listFiles()).getOrElse(Array.empty)
    dirs.filter(f => f.isDirectory && f.getName.startsWith("hour="))
      .map(d => d.getName ->
        d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq)
      .toMap
  }

  test("refresh tick rewrites only hour >= since partitions, result equals full recompute") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val outRoot = SparkSpec.tempDir("graft-rollups").toString
    val refresher = new RollupRefresher(spark, sfDir, outRoot, lookBackHours = 2L)

    // tick 1: no watermark -> full materialization
    assert(refresher.refresh() == Long.MinValue)
    val before = fullBuilders.map { case (name, _) =>
      name -> partitionFiles(s"$outRoot/$name")
    }.toMap
    assert(before.values.forall(_.nonEmpty))

    // tick 2: incremental — only the 2h look-back window may rewrite
    val since = refresher.refresh()
    val watermark = refresher.currentWatermark.get
    assert(since == watermark - 2 * 3600L)

    fullBuilders.foreach { case (name, _) =>
      val after = partitionFiles(s"$outRoot/$name")
      assert(after.keySet == before(name).keySet, s"$name partition set changed")
      after.foreach { case (part, files) =>
        val hour = part.stripPrefix("hour=").toLong
        if (hour < since)
          assert(files == before(name)(part),
            s"$name/$part is outside the window but was rewritten")
        else
          assert(files != before(name)(part),
            s"$name/$part is inside the window but was not rewritten")
      }
      // at least one partition on each side, or the test proves nothing
      assert(after.keys.exists(_.stripPrefix("hour=").toLong < since))
      assert(after.keys.exists(_.stripPrefix("hour=").toLong >= since))
    }

    // the maintained tables equal the full recompute (partition read-back
    // narrows epoch-second hours to INT — normalize before diffing)
    fullBuilders.foreach { case (name, full) =>
      val want = full()
      val got = refresher.table(name).withColumn("hour", col("hour").cast("long"))
        .select(want.columns.map(col).toSeq: _*)
      assert(got.count() == want.count(), s"$name row count")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$name incremental != full recompute")
    }
  }

  test("refresher plugs into StreamDriver's analytical tier") {
    graft.fixtures.Fixtures.register(spark, sfDir)
    val outRoot = SparkSpec.tempDir("graft-rollups-hook").toString
    val refresher = new RollupRefresher(spark, sfDir, outRoot)
    val hook: Long => Unit = refresher.hook // the onAnalyticalRefresh slot
    hook(0L)
    assert(refresher.currentWatermark.nonEmpty)
    assert(refresher.table("hourly_volume_by_token").count() > 0)
  }
}
