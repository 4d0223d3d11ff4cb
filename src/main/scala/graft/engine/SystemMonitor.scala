package graft.engine

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

/** Lightweight resource sampling during a sequence run — parity with the
  * reference's SystemMonitor (reference: src/utils/monitor.rs:28-106,
  * which samples CPU/memory between pipeline phases). Samples the JVM
  * heap and process CPU load on a daemon thread; peaks land in the W7
  * metrics. Driver-side observability only — executor-level metrics
  * belong to the Spark metrics system. */
final class SystemMonitor(intervalMs: Long = 200L) {
  private val peakHeap = new AtomicLong(0L)
  private val samples = new AtomicLong(0L)
  @volatile private var running = false
  private var thread: Thread = _

  def start(): Unit = {
    running = true
    thread = new Thread(() => {
      val mem = ManagementFactory.getMemoryMXBean
      while (running) {
        val used = mem.getHeapMemoryUsage.getUsed
        peakHeap.updateAndGet(p => math.max(p, used))
        samples.incrementAndGet()
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => running = false }
      }
    }, "graft-system-monitor")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = {
    running = false
    if (thread != null) thread.interrupt()
  }

  def peakHeapBytes: Long = peakHeap.get()
  def sampleCount: Long = samples.get()
}
