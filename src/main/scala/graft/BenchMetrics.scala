package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/**
 * Shared task-metrics plumbing for the measurement mains ([[Bench]],
 * [[graft.tools.SfSweep]]): one registered listener accumulating
 * shuffle-WRITE bytes, jobs launched, and summed task run time across
 * all tasks, plus the listener-bus drain that makes per-rep deltas
 * attributable (see [[org.apache.spark.graftmetrics.BusDrain]]).
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
 *
 * Why jobs + summed task time are the SECOND metric (VERDICT r14 #3):
 * iterative operators (tracking gap rounds, star-CC rounds, stream
 * harnesses) are many tiny jobs whose cost is scheduler/driver
 * overhead — nearly zero shuffle, so the bytes metric cannot see
 * them, and the r14 driver run left a 0.93-vs-3.75 s `ome_track_gap`
 * question open. Jobs launched is exactly deterministic per
 * plan+data; summed task run time excludes the driver-side
 * scheduling gaps that dominate the session tax, so together they
 * adjudicate the job-count-bound operators the same way bytes
 * adjudicate the data-bound ones.
 */
object BenchMetrics {
  private val shuffleWrite = new AtomicLong()
  private val taskTimeMs = new AtomicLong()
  private val jobsLaunched = new AtomicLong()
  // keyed by SparkContext identity (ADVICE r14): a JVM-global boolean
  // left a second context (after stop/restart) with no listener, so
  // byte deltas read 0 and looked like a plan improvement
  private val installedOn: java.util.Set[SparkContext] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkContext, java.lang.Boolean]()))

  /** One rep's paired measurements: wall seconds plus the three
    * deterministic counters for exactly the jobs the rep ran. */
  final case class Rep(sec: Double, shuffleBytes: Long, jobs: Long,
      taskMs: Long)

  /** Register the accumulator listener once per SparkContext. */
  def install(sc: SparkContext): Unit = synchronized {
    if (installedOn.add(sc)) {
      sc.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            taskTimeMs.addAndGet(m.executorRunTime)
          }
        }
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobsLaunched.incrementAndGet(): Unit
      })
    }
  }

  /** Dispatch all queued listener events before reading the counters. */
  def drain(sc: SparkContext): Unit =
    org.apache.spark.graftmetrics.BusDrain.drain(sc)

  /** Current cumulative shuffle-write byte count (drain first). */
  def shuffleBytes: Long = shuffleWrite.get()

  /** Run `body` bracketed by drains; returns the wall time and the
    * counter deltas for exactly the jobs `body` ran. */
  def timed(sc: SparkContext)(body: => Unit): Rep = {
    drain(sc)
    val b0 = shuffleWrite.get(); val t0 = taskTimeMs.get()
    val j0 = jobsLaunched.get()
    val w0 = System.nanoTime()
    body
    val dt = (System.nanoTime() - w0) / 1e9
    drain(sc)
    Rep(dt, shuffleWrite.get() - b0, jobsLaunched.get() - j0,
      taskTimeMs.get() - t0)
  }
}
