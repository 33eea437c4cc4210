package graft.ops

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Run-level progress reporting (reference `progress.py`: Rich per-file
  * progress bars around sync/process/embed).
  *
  * Spark's unit of visible work is the task, not the file, so the engine's
  * analogue is a listener that tallies task completions across every stage a
  * run submits and emits a line at percentage steps. This is intentionally
  * log-line (not TTY-bar) output: a 1000-executor job's progress belongs in
  * driver logs next to the Spark UI, which already carries the per-stage
  * detail.
  */
final class ProgressReporter(
    label: String,
    sink: String => Unit,
    everyPct: Int = 25
) extends SparkListener {

  private val tasksTotal = new AtomicLong(0)
  private val tasksDone = new AtomicLong(0)
  private val lastStep = new AtomicInteger(-1)

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    tasksTotal.addAndGet(e.stageInfo.numTasks.toLong)
    ()
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val done = tasksDone.incrementAndGet()
    val total = math.max(tasksTotal.get(), 1L)
    val pct = ((done * 100) / total).toInt
    val step = pct / everyPct
    // total grows as later stages are submitted, so pct can move backwards;
    // only ever report forward steps
    if (step > lastStep.getAndUpdate(prev => math.max(prev, step))) {
      sink(s"[$label] $pct% ($done/$total tasks)")
    }
  }

  def summary(): String = s"[$label] done (${tasksDone.get()} tasks)"
}

object ProgressReporter {

  /** Run `body` with task-level progress reported to `sink` (default:
    * stderr). The listener is always removed afterwards, and a final
    * summary line is emitted.
    */
  def withProgress[T](
      spark: SparkSession,
      label: String,
      sink: String => Unit = s => Console.err.println(s),
      everyPct: Int = 25
  )(body: => T): T = {
    val listener = new ProgressReporter(label, sink, everyPct)
    spark.sparkContext.addSparkListener(listener)
    try body
    finally {
      spark.sparkContext.removeSparkListener(listener)
      sink(listener.summary())
    }
  }
}
