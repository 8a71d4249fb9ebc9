package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout helpers: the co-located join story for fact⋈fact
  * at 100 TB.
  *
  * A shuffle join on two 100 TB fact tables moves both sides over the
  * network every time the join runs. Writing both tables bucketed (and
  * sorted) by the join key moves that shuffle to WRITE TIME, once: each
  * bucket file holds exactly the rows whose `hash(key) % numBuckets`
  * matches, so a later join (or groupBy) on the key reads matching buckets
  * pairwise and merges them with NO exchange and NO sort in the query plan —
  * the same trick the reference gets from Postgres indexes on `pool_key_hash`
  * (dao.ts pool-state lookups), re-expressed as a Spark physical layout.
  *
  * Rules that make it work (spec-enforced in BucketedJoinSpec):
  *   - both sides bucketed by the SAME columns into the SAME bucket count
  *     (or an integer multiple, with `spark.sql.bucketing.coalesceBucketsInJoin`);
  *   - `sortBy` the key too, so SortMergeJoin skips its sort;
  *   - bucket pruning: an equality filter on the bucket column reads 1 of N
  *     buckets (`Bucketed: true, SelectedBucketsCount: 1 out of N` in the scan).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed table (Parquet). Overwrites. */
  def write(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket keys; with matching
    * layouts Catalyst plans this with zero Exchange operators. */
  def join(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
