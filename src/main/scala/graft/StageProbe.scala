package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level CPU/wall attribution — the per-STAGE complement of
  * [[ThreadProbe]] (threads) and PhaseLog (process totals): a listener
  * records every completed stage's executor run/CPU time so a "this rep
  * burned 7× the CPU of the identical previous rep" mystery can be
  * pinned to the stage that actually burned it, from the log alone.
  * Used by [[RunOne]] between reps; harmless (one queue append per
  * stage) if installed anywhere else.
  */
object StageProbe {

  private final case class Entry(
    stageId: Int, name: String, tasks: Int, runMs: Long, cpuNs: Long,
    spillMem: Long, spillDisk: Long)

  private val entries =
    new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
  // Installation is tracked PER SparkContext (weakly, so a stopped
  // context doesn't pin memory): a JVM-global boolean silently left a
  // second context in the same JVM without a listener (ADVICE r10).
  private val installedOn =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())
  @volatile private var lastEventNs = System.nanoTime()

  /** Stage-completed events arrive on Spark's ASYNC listener bus, so the
    * final (often heaviest) stage of a just-finished job may still be in
    * flight when the action returns — wait for the bus to go quiet
    * before reading or clearing, or per-rep attribution silently drops
    * or misassigns it (r10 review). Bounded: quiet for 300 ms or 2 s
    * total, whichever first. */
  private def settle(): Unit = {
    val deadline = System.nanoTime() + 2_000_000_000L
    while (System.nanoTime() < deadline &&
        System.nanoTime() - lastEventNs < 300_000_000L)
      Thread.sleep(50)
  }

  def install(sc: SparkContext): Unit = synchronized {
    if (installedOn.putIfAbsent(sc, java.lang.Boolean.TRUE) == null) {
      // nanoTime origin is arbitrary — seed the quiet-window clock at
      // install so settle() never compares against 0 (ADVICE r10)
      lastEventNs = System.nanoTime()
      sc.addSparkListener(new SparkListener {
        override def onStageCompleted(
            ev: SparkListenerStageCompleted): Unit = {
          val si = ev.stageInfo
          val m = si.taskMetrics
          entries.add(Entry(si.stageId, si.name.takeWhile(_ != '\n'),
            si.numTasks, m.executorRunTime, m.executorCpuTime,
            m.memoryBytesSpilled, m.diskBytesSpilled)): Unit
          lastEventNs = System.nanoTime()
        }
      })
    }
  }

  def reset(): Unit = { settle(); entries.clear() }

  /** Print the top-`n` stages since the last [[reset]] by executor CPU. */
  def printTop(tag: String, n: Int = 8): Unit = {
    settle()
    val all = entries.asScala.toVector
    val totCpu = all.map(_.cpuNs).sum / 1e9
    val totRun = all.map(_.runMs).sum / 1e3
    println(f"[stageprobe] $tag: stages=${all.size} " +
      f"executor_cpu=$totCpu%.1f s executor_run=$totRun%.1f s")
    all.sortBy(-_.cpuNs).take(n).foreach { e =>
      val spill = if (e.spillMem > 0 || e.spillDisk > 0)
        f" SPILL mem=${e.spillMem / 1e6}%.0fMB disk=${e.spillDisk / 1e6}%.0fMB"
        else ""
      println(f"[stageprobe]   stage ${e.stageId}%4d cpu=${e.cpuNs / 1e9}%7.1f s " +
        f"run=${e.runMs / 1e3}%7.1f s tasks=${e.tasks}%3d  ${e.name.take(110)}$spill")
    }
  }
}
