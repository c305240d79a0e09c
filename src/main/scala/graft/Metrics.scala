package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Execution-metric capture: how many bytes/records a query actually
  * shuffled. This is the number the scale claims rest on — "the
  * exchange carries |groups|, not |rows|" is checkable, not rhetoric:
  * [[ScaleProbe]] records it at 1× and N× and reports the ratio.
  */
object Metrics {

  final case class ShuffleStats(bytesWritten: Long, recordsWritten: Long)

  /** Run `action` and return the total shuffle write across every stage
    * it triggered. Uses a dedicated listener; the async listener bus is
    * drained before reading the counters. Not re-entrant (one
    * measurement at a time per session). */
  def shuffleOf(spark: SparkSession)(action: => Unit): ShuffleStats = {
    val bytes = new AtomicLong(0)
    val records = new AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      org.apache.spark.graftlistener.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    ShuffleStats(bytes.get(), records.get())
  }
}
