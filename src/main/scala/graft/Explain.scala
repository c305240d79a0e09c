package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: `runMain graft.Explain <queryKey> [sfDir]`
  * prints the formatted physical plan of one declared query — the
  * `.explain("formatted")` loop the build rule asks for, runnable
  * without a REPL (sbt console swallows forked stdout). */
object Explain {
  def main(args: Array[String]): Unit = {
    // --time <queryKey> [sfDir] [n]: per-sample wall times (bench
    // prints only the trimmed mean — regressions hide in the spread)
    val timeMode = args.headOption.contains("--time")
    val jobsMode = args.headOption.contains("--jobs")
    val rest = if (timeMode || jobsMode) args.drop(1) else args
    val name = rest.headOption.getOrElse(
      sys.error("usage: Explain [--time|--jobs] <queryKey> [sfDir] [n]"))
    val sfDir =
      if (rest.length > 1) rest(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (jobsMode) {
      // --jobs <queryKey> [sfDir]: per-job wall/stage/task/shuffle
      // profile of ONE timed execution (after one warm-up) — the
      // measurement the optimization guide §1 asks for: where does a
      // multi-job query actually spend its wall, fixed job overhead or
      // data movement?
      import org.apache.spark.scheduler._
      import java.util.concurrent.ConcurrentHashMap
      final case class J(var desc: String = "", var t0: Long = 0L,
        var t1: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
        var shufW: Long = 0L, var shufR: Long = 0L, var recW: Long = 0L)
      val jobs = new ConcurrentHashMap[Int, J]()
      val stage2job = new ConcurrentHashMap[Int, Int]()
      var enabled = false
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit =
          if (enabled) {
            val j = new J(Option(js.properties)
              .map(_.getProperty("spark.job.description")).map(String.valueOf)
              .getOrElse(""), js.time)
            jobs.put(js.jobId, j)
            js.stageIds.foreach(sid => stage2job.put(sid, js.jobId))
            ()
          }
        override def onJobEnd(je: SparkListenerJobEnd): Unit = {
          val j = jobs.get(je.jobId)
          if (j != null) j.t1 = je.time
        }
        override def onStageCompleted(
            sc0: SparkListenerStageCompleted): Unit = {
          val jid = stage2job.getOrDefault(sc0.stageInfo.stageId, -1)
          val j = jobs.get(jid)
          if (j != null) {
            j.stages += 1
            j.tasks += sc0.stageInfo.numTasks
            val m = sc0.stageInfo.taskMetrics
            if (m != null) {
              j.shufW += m.shuffleWriteMetrics.bytesWritten
              j.recW += m.shuffleWriteMetrics.recordsWritten
              j.shufR += m.shuffleReadMetrics.totalBytesRead
            }
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // comma-separated query keys share one JVM (amortizes sbt/JVM
      // startup across a profiling sweep)
      name.split(',').map(_.trim).filter(_.nonEmpty).foreach { qn =>
        def exec(): Unit = SparkEntry.queries(qn)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        exec() // warm
        jobs.clear(); stage2job.clear()
        enabled = true
        val t0 = System.nanoTime()
        exec()
        val wall = (System.nanoTime() - t0) / 1e9
        enabled = false
        org.apache.spark.graftlistener.drain(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.sortBy(_._1)
        println(f"=== JOBS $qn wall=$wall%.3f s njobs=${rows.size} ===")
        var acc = 0.0
        rows.foreach { case (id, j) =>
          val dt = (j.t1 - j.t0) / 1e3
          acc += dt
          println(f"job $id%3d ${dt}%7.3f s stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d shufW=${j.shufW}%9d shufR=${j.shufR}%9d " +
            f"recW=${j.recW}%8d  ${j.desc.take(90)}")
        }
        println(
          f"=== sum-of-jobs ${acc}%.3f s (gaps = ${wall - acc}%.3f s) ===")
      }
      spark.stop(); return
    }
    if (timeMode) {
      val n = if (rest.length > 2) rest(2).toInt else 5
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      (1 to n).foreach(i => println(f"TIME $name sample $i: ${once()}%.3f s"))
      spark.stop(); return
    }
    // comma-separated keys share one JVM; split the output on the
    // marker lines (plans/r19 capture loop)
    name.split(',').map(_.trim).filter(_.nonEmpty).foreach { qn =>
      val df = SparkEntry.queries(qn)(spark, sfDir)
      // stdout arrives bare (build.sbt StdoutOutput), greppable by marker
      println("=== EXPLAIN " + qn + " ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("=== END EXPLAIN " + qn + " ===")
    }
    spark.stop()
  }
}
