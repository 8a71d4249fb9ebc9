package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main for the streaming replay floor (VERDICT r15 #2): runs
  * the named streaming_* catalog entries and prints, per micro-batch, the
  * engine's own duration breakdown (triggerExecution and its children:
  * latestOffset / getBatch / queryPlanning / walCommit / addBatch /
  * commitOffsets) plus per-entry wall time. Attribution tool only — not
  * part of the bench protocol, never timed by Bench.
  *
  * Usage: runMain graft.ReplayProbe [sfDir] [entry ...]
  */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("streaming_hll_replay", "streaming_sessions_replay")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.noDataMicroBatches.enabled",
        sys.env.getOrElse("PROBE_NODATA", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        import scala.jdk.CollectionConverters._
        val parts = d.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} $parts")
      }
    }
    spark.streams.addListener(listener)

    names.foreach { name =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[probe] $name pass $pass wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
