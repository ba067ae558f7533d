package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/**
 * Shared task-metrics plumbing for the measurement mains ([[Bench]],
 * [[graft.tools.SfSweep]]): one registered listener accumulating
 * shuffle-WRITE bytes across all tasks, plus the listener-bus drain
 * that makes per-rep deltas attributable (see
 * [[org.apache.spark.graftmetrics.BusDrain]]).
 *
 * Why shuffle-write bytes is the headline scale metric (VERDICT r13
 * #1): the bench box's session tax was measured at up to 4.2× on wall
 * clock, which exceeds any real per-query drift the 2× gate could
 * catch — two consecutive rounds were spent re-adjudicating noise.
 * Bytes written to shuffle are a DETERMINISTIC function of the plan
 * and the data (modulo compression jitter, single-digit %), so a plan
 * regression (a lost broadcast, a new exchange, a wider shuffle key)
 * moves bytes loudly even when wall clock drowns in scheduler noise —
 * and a noisy session moves bytes not at all.
 */
object BenchMetrics {
  private val shuffleWrite = new AtomicLong()
  @volatile private var installed = false

  /** Register the accumulator listener once per JVM. */
  def install(sc: SparkContext): Unit = synchronized {
    if (!installed) {
      sc.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null)
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
      installed = true
    }
  }

  /** Dispatch all queued listener events before reading the counter. */
  def drain(sc: SparkContext): Unit =
    org.apache.spark.graftmetrics.BusDrain.drain(sc)

  /** Current cumulative shuffle-write byte count (drain first). */
  def shuffleBytes: Long = shuffleWrite.get()

  /** Run `body` bracketed by drains; returns (seconds, shuffleBytes)
    * for exactly the jobs `body` ran. */
  def timed(sc: SparkContext)(body: => Unit): (Double, Long) = {
    drain(sc)
    val before = shuffleWrite.get()
    val t0 = System.nanoTime()
    body
    val dt = (System.nanoTime() - t0) / 1e9
    drain(sc)
    (dt, shuffleWrite.get() - before)
  }
}
