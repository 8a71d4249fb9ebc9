package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // neutral JVM/scheduler warmup (no query or fixture work) so the first
    // timed query doesn't absorb session start-up cost
    spark.range(1000).count()

    // stable (sorted) execution order so per-query timings are comparable
    // across runs; shared-plan cache fills land on the same first consumer
    var failures = List.empty[String]
    def runAll(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query must surface as a FAILURE, never as a fast timing
        // (pre-round-1 commit bfe8d10 was exactly this bug): the elapsed time
        // is still recorded honestly, the name lands in "failures", and the
        // process exits nonzero so the driver can't mistake the run for clean
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          failures ::= name
          System.err.println(s"[bench] $name FAILED: $e")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // SPARK_GRAFT_REPEAT=N runs the catalog N times and reports the LAST
    // pass: earlier passes absorb one-time costs (janino codegen compile,
    // parquet footer reads, memo fills), isolating steady-state plan cost
    // from session warmup when profiling. Default 1 = the driver's protocol.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val results = (1 to repeat).map { i =>
      val r = runAll()
      if (i < repeat) System.err.println(
        s"[bench] pass $i/$repeat total ${r.map(_._2).sum}")
      r
    }.last
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failed = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
