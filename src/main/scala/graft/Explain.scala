package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of selected
  * catalog queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * joins, and whole-stage-codegen spans can be checked per change.
  *
  * Usage: runMain graft.Explain [--time] [sfDir] [queryName ...]
  * With --time, runs each query three times and prints cold/warm seconds
  * instead of plans (warm isolates steady-state plan cost from codegen
  * compile + IO first-touch).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val time = args.headOption.contains("--time")
    val rest = if (time) args.tail else args
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (rest.length > 1) rest.tail.toSeq
      else Seq("q1_pricing_summary", "hourly_volume_by_token", "pool_states",
        "dedup_minhash_lsh", "sim_ann_lsh")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      if (time) {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-30s cold ${runs.head}%6.2f  warm ${runs.drop(1).min}%6.2f")
      } else {
        println(s"\n======== $name ========")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
