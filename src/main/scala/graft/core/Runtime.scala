package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.storage.StorageLevel

/** The one SparkSession recipe for every entrypoint (Bench / Verify /
  * Explain / RunOne) — the four mains used to copy-paste this block and
  * drifted (cpu defaults, and briefly a cache-partitioning conf whose
  * rationale turned out backwards for this Spark version: with AQE the
  * default already constrains cached plans to keep their partitioning,
  * while enabling `canChangeCachedPlanOutputPartitioning` licenses AQE
  * to coalesce the deliberately-partitioned staged caches and can add
  * an extra shuffle to read them — measured no gain here, reverted). */
object Sessions {
  def local(cpus: String): org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS), which Spark 4 rejects by
      // default; read as long ns and convert explicitly (see queries.Rel)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // checkpoint-file checksums OFF (round-5 verdict #3): Spark 4.1's
      // ChecksumCheckpointFileManager spins a small thread pool per
      // manager instance (one per metadata log / state-store provider)
      // and nothing closes them when a streaming query stops — measured
      // +32 live threads per sessionize-sink run, linear growth to ~1,030
      // by bench end. The checksums exist to detect checkpoint corruption
      // on unreliable stores; these entrypoints write checkpoints to
      // local scratch deleted after each run, so the feature buys nothing
      // here. A durable production deployment should leave it at default.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // stage-materialization pools capped at the core count (round-6
      // verdict #4): shuffle-exchange / result-stage / broadcast pools
      // are CACHED (60 s keep-alive) with defaults of 1024/1024/128, so
      // a ~100-query bench accumulates an ~800-thread high-water of idle
      // workers. In a single JVM, more concurrent stage-materialization
      // threads than cores buys nothing — the pool threads only submit
      // and await stage jobs whose tasks run on the executor pool. The
      // remaining floor is the two hardcoded 100-thread block-manager
      // pools + netty/dispatcher pools (no conf exposes them).
      .config("spark.sql.shuffleExchange.maxThreadThreshold", cpus)
      .config("spark.sql.resultQueryStage.maxThreadThreshold", cpus)
      .config("spark.sql.broadcastExchange.maxThreadThreshold", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Shared phase-timing log: one format, one stream (stdout — the driver's
  * bench harness captures the process tail, so diagnostics printed here
  * survive into the round artifacts; see VERDICT r2 "what's missing" #2).
  *
  * Each line carries wall + PROCESS-CPU + GC-time deltas since the
  * previous line (round-4 verdict #1a): wall-only phases could not
  * distinguish GC thrash from shuffle recompute when a phase inflated —
  * cpu ≫ wall×cores means spin/GC, gc ≈ the inflation means heap
  * pressure, cpu ≈ flat means host contention. */
object PhaseLog {
  /** Process CPU time in ns, or −1 when the JVM's bean doesn't carry it
    * (the HotSpot-specific com.sun interface; getProcessCpuTime itself
    * may also return −1 on unsupported platforms). THE one copy of this
    * probe — Bench and DegradeProbe call it too. */
  def cpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum
  }

  /** Returns a logger stamping wall since start plus per-phase
    * wall/cpu/gc deltas since the previous log call. */
  def start(prefix: String): String => Unit = {
    val t0 = System.nanoTime()
    var lastT = t0
    var lastC = cpuNanos()
    var lastG = gcMillis()
    tag => {
      val (t, c, g) = (System.nanoTime(), cpuNanos(), gcMillis())
      val dCpu = if (c < 0 || lastC < 0) -1.0 else (c - lastC) / 1e9
      println(f"[graft] $prefix $tag at ${(t - t0) / 1e9}%.2f s " +
        f"(phase wall=${(t - lastT) / 1e9}%.2f cpu=$dCpu%.2f " +
        f"gc=${(g - lastG) / 1e3}%.2f s)")
      lastT = t; lastC = c; lastG = g
    }
  }
}

/** Materialization barrier with an explicit storage handle — the pattern
  * `Dedup.connectedComponents` proved out for iterative plans:
  *
  *  - the result is wrapped as a LEAF DataFrame, so downstream consumers
  *    analyze/plan O(1) instead of re-walking the full upstream lineage
  *    (a multi-branch consumer of a merely-persisted stage re-analyzes
  *    the whole chain per branch — measured ~3 s of driver-side Catalyst
  *    work for the blind-zone pipeline at sf0.1);
  *  - the returned RDD handle lets the caller RELEASE the blocks
  *    deterministically when the stage is consumed. `localCheckpoint`
  *    gives the same leaf plan but leaves reclamation to weak-reference
  *    cleaning, which a large fixed heap may never trigger (NOTES.md).
  *
  * RDD lineage still reaches the upstream plan, so an evicted block
  * recomputes rather than failing.
  */
object Stage {
  def materialize(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val store = df.queryExecution.toRdd.map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val frame = org.apache.spark.sql.graft.Bridge
      .ofInternalRows(df.sparkSession, store, df.schema)
    (frame, store)
  }
}

/** Scratch-directory management for queries that round-trip through the
  * filesystem (CSV sink/source, streaming sink). JVM-scoped stable paths
  * + overwrite semantics keep disk BOUNDED across repeated invocations
  * (a fresh createTempDirectory per call leaked a full table copy per
  * bench/verify rep), while the per-JVM tag keeps concurrent processes
  * from racing on one path (the round-2 ADVICE defect).
  *
  * CONTRACT: within one JVM, at most one invocation per (tag, key) at a
  * time — the registered round-trip queries satisfy this (Bench/Verify
  * run them sequentially), and the stable path is what makes the reuse
  * bounded. Concurrent same-key callers would need per-call dirs and a
  * lifecycle to reclaim them. */
object Tmp {
  /** Per-JVM disambiguator — also the right suffix for catalog-level
    * names (temp tables) that must not collide across processes. */
  lazy val jvmTag: String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  // every handed-out scratch path, reclaimed at JVM exit: the per-JVM
  // tag means no LATER process can ever reuse this JVM's dirs, so
  // anything still on disk at shutdown is garbage by construction
  // (within the JVM, callers may keep dirs alive for cross-query reuse
  // — the sessionize staging — or delete eagerly; both are safe here).
  // On an abnormal exit this hook can race Spark's own shutdown (active
  // checkpoint/state-store writers in these dirs), so deletion errors
  // are swallowed per path — reclamation is best-effort and must never
  // bury the primary failure under secondary noise (round-4 ADVICE)
  private val issued = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      issued.forEach { p =>
        try deleteRecursively(p)
        catch { case _: Throwable => () }
      }))
  }

  /** Stable within this JVM for a given (tag, key); distinct across JVMs.
    * Keys are md5-hashed — a 32-bit `hashCode` would let two distinct sf
    * dirs collide onto one scratch path. */
  def jvmScopedDir(tag: String, key: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    val p = System.getProperty("java.io.tmpdir") +
      s"/graft_${tag}_${jvmTag}_$digest"
    issued.add(p): Unit
    p
  }

  def deleteRecursively(path: String): Unit = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(walk))
      f.delete(): Unit
    }
    if (root.exists()) walk(root)
  }
}
