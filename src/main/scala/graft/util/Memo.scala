package graft.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for shared sub-plans.
  *
  * Several catalog views are consumed by other views (pool_states feeds the
  * twamm/limit views, the hourly rollups feed the 24h stats, the exploded
  * embedding elements feed all three similarity queries). Without a memo each
  * downstream query re-plans and re-executes the whole upstream tree; with it
  * the first use persists the (dimension-sized) intermediate and later uses
  * are cache scans — the batch analogue of the reference's materialized-view
  * tiers (dao.ts:1798-1807).
  */
object Memo {

  private val frames = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def cached(spark: SparkSession, sfDir: String, name: String)(build: => DataFrame): DataFrame =
    frames.getOrElseUpdate((spark, sfDir, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))
}
