package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Execution-metric capture: how many bytes/records a query actually
  * shuffled. This is the number the scale claims rest on — "the
  * exchange carries |groups|, not |rows|" is checkable, not rhetoric:
  * [[ScaleProbe]] records it at 1× and N× and reports the ratio.
  */
object Metrics {

  final case class ShuffleStats(bytesWritten: Long, recordsWritten: Long)

  /** Run `action` and return the total shuffle write across the stages
    * it triggered. The measurement is scoped to a unique job group, so
    * concurrent jobs on the same session (parallel test suites, other
    * measurements) do not pollute the counters; the async listener bus
    * is drained before reading them. */
  def shuffleOf(spark: SparkSession)(action: => Unit): ShuffleStats = {
    val sc = spark.sparkContext
    val group = s"graft-metrics-${java.util.UUID.randomUUID()}"
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    val ourStages = ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == group) js.stageIds.foreach { id =>
          ourStages.add(id); ()
        }
      }
      override def onStageCompleted(sc0: SparkListenerStageCompleted): Unit =
        if (ourStages.contains(sc0.stageInfo.stageId)) {
          val m = sc0.stageInfo.taskMetrics
          if (m != null) {
            bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            ()
          }
        }
    }
    sc.addSparkListener(listener)
    sc.setJobGroup(group, "graft Metrics.shuffleOf", interruptOnCancel = false)
    try {
      action
      org.apache.spark.graftlistener.drain(sc)
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
    ShuffleStats(bytes.get(), records.get())
  }
}
