package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** The one task-metrics accumulator the evidence generators share
  * ([[Scaling]], [[SkewScaling]], [[IncrementalScaling]]): sums
  * input/shuffle counters across task ends, plus the per-task
  * shuffle-read maximum (the skew signal). Each generator logs the
  * subset it cares about; keeping one implementation means a fix to
  * the accumulation discipline lands everywhere at once.
  */
class TaskMetricsListener extends SparkListener {
  var inputRecords = 0L
  var shuffleWriteBytes = 0L
  var shuffleWriteRecords = 0L
  var shuffleReadBytes = 0L
  var shuffleReadRecords = 0L
  var maxTaskShuffleReadRecords = 0L
  var maxTaskRunMillis = 0L

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
    val m = te.taskMetrics
    if (m != null) {
      inputRecords += m.inputMetrics.recordsRead
      shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
      shuffleWriteRecords += m.shuffleWriteMetrics.recordsWritten
      shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
      shuffleReadRecords += m.shuffleReadMetrics.recordsRead
      maxTaskShuffleReadRecords = math.max(maxTaskShuffleReadRecords,
        m.shuffleReadMetrics.recordsRead)
      // the TIME-skew signal (the straggler bound a hot key sets on
      // the whole stage — see AsofScaling's skew tier)
      maxTaskRunMillis = math.max(maxTaskRunMillis, m.executorRunTime)
    }
  }

  def reset(): Unit = synchronized {
    inputRecords = 0; shuffleWriteBytes = 0; shuffleWriteRecords = 0
    shuffleReadBytes = 0; shuffleReadRecords = 0
    maxTaskShuffleReadRecords = 0; maxTaskRunMillis = 0
  }
}
