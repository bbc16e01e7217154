package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Per-query shuffle/spill/memory metrics for the bench artifact, so a
  * plan regression (new shuffle, spill onset, memory blow-up) is
  * visible quantitatively even when shared-tenant wall-clock noise
  * hides it.
  *
  * Attribution: Bench wraps each timed run in a Spark job group named
  * after the query; `onJobStart` maps the job's stage ids to that
  * group and `onTaskEnd` accumulates task metrics under it. Task-end
  * events can trail the blocking `count()` only by listener-bus
  * delivery, and Bench re-`reset`s a query just before re-running it
  * (so the recorded values are the LAST pass's, by which time the
  * prior pass's events have long drained) and sleeps briefly before
  * the final snapshot. Metrics are per-pass totals: shuffle bytes
  * written/read, disk/memory bytes spilled, and the max per-task peak
  * execution memory. */
final class BenchMetricsListener extends SparkListener {
  private val stageToGroup = new ConcurrentHashMap[Int, String]()
  private val byGroup = new ConcurrentHashMap[String, Array[AtomicLong]]()

  /** Drop any previously-recorded pass for `name` (called right before
    * each timed run, so the surviving numbers are the last pass's). */
  def reset(name: String): Unit = byGroup.remove(name)

  private def acc(g: String): Array[AtomicLong] =
    byGroup.computeIfAbsent(g, _ => Array.fill(5)(new AtomicLong))

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val g =
      if (js.properties == null) null
      else js.properties.getProperty("spark.jobGroup.id")
    if (g != null)
      js.stageInfos.foreach(si => stageToGroup.put(si.stageId, g))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val g = stageToGroup.get(te.stageId)
    val m = te.taskMetrics
    if (g != null && m != null) {
      val a = acc(g)
      a(0).addAndGet(m.shuffleWriteMetrics.bytesWritten)
      a(1).addAndGet(m.shuffleReadMetrics.totalBytesRead)
      a(2).addAndGet(m.diskBytesSpilled)
      a(3).addAndGet(m.memoryBytesSpilled)
      a(4).getAndAccumulate(m.peakExecutionMemory, math.max)
    }
  }

  /** JSON object string `{"<q>":{"shuffle_write":..},...}` over all
    * recorded groups (bytes; `peak_task_mem` is max per-task peak
    * execution memory). */
  def snapshotJson: String = {
    import scala.jdk.CollectionConverters._
    byGroup.asScala.toSeq.sortBy(_._1).map { case (g, a) =>
      s""""$g":{"shuffle_write":${a(0).get},"shuffle_read":${a(1).get},""" +
        s""""spill_disk":${a(2).get},"spill_mem":${a(3).get},""" +
        s""""peak_task_mem":${a(4).get}}"""
    }.mkString("{", ",", "}")
  }
}
