package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of selected
  * catalog queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * joins, and whole-stage-codegen spans can be checked per change.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_pricing_summary", "hourly_volume_by_token", "pool_states",
        "dedup_minhash_lsh", "sim_ann_lsh")

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      println(s"\n======== $name ========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
