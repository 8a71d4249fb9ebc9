package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan of selected
  * catalog queries so scan pushdown (PushedFilters/ReadSchema), broadcast
  * joins, and whole-stage-codegen spans can be checked per change.
  *
  * Usage: runMain graft.Explain [--time|--stages] [sfDir] [queryName ...]
  *  - --time: runs each query three times, prints cold/warm seconds (warm
  *    isolates steady-state plan cost from codegen compile + IO first-touch).
  *  - --stages: runs each query once with a stage-metrics listener and
  *    prints wall seconds plus summed task runTime/cpuTime. runTime much
  *    greater than cpuTime means tasks were BLOCKED (lock/init/IO), the
  *    signature that exposed the ICU collation static-init stall (round 7);
  *    wall much greater than runTime means the time went to the driver
  *    (planning, broadcast collect, janino compile).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.filter(_.startsWith("--")).getOrElse("")
    val rest = if (mode.nonEmpty) args.tail else args
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

    mode match {
      case "--time" =>
        names.foreach { name =>
          val runs = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"$name%-30s cold ${runs.head}%6.2f  warm ${runs.drop(1).min}%6.2f")
        }

      case "--stages" =>
        val acc = new java.util.concurrent.atomic.AtomicLongArray(3) // run, cpu, tasks
        // every completed stage (run ms, tasks, name) — listener-bus thread
        // writes, main reads after the drain below
        val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val m = sc.stageInfo.taskMetrics
            acc.addAndGet(0, m.executorRunTime)
            acc.addAndGet(1, m.executorCpuTime / 1000000L)
            acc.addAndGet(2, sc.stageInfo.numTasks.toLong)
            stages.add((m.executorRunTime, sc.stageInfo.numTasks, sc.stageInfo.name))
          }
        }
        spark.sparkContext.addSparkListener(listener)
        println(f"${"query"}%-34s ${"wall_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s ${"tasks"}%6s  top stages run_s/tasks@site")
        names.foreach { name =>
          (0 to 2).foreach(acc.set(_, 0L)); stages.clear()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events are async; block until the bus has drained.
          // listenerBus is private[spark] in Scala but public in bytecode —
          // reflection reaches waitUntilEmpty(); fall back to a sleep if a
          // Spark upgrade reshapes it (dev tool, best-effort)
          try {
            val sc = spark.sparkContext
            val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
            bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
          } catch { case scala.util.control.NonFatal(_) => Thread.sleep(300) }
          import scala.jdk.CollectionConverters._
          val top = stages.asScala.toSeq.sortBy(-_._1).take(3)
            .map { case (r, n, nm) => f"${r / 1e3}%.2f/$n@${nm.take(46)}" }
            .mkString("  ")
          println(f"$name%-34s $wall%7.2f ${acc.get(0) / 1e3}%7.2f ${acc.get(1) / 1e3}%7.2f ${acc.get(2)}%6d  $top")
        }

      case _ =>
        names.foreach { name =>
          println(s"\n======== $name ========")
          SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        }
    }
    spark.stop()
  }
}
