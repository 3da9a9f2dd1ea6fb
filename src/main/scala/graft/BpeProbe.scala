package graft

/** Throwaway phase-level probe of the in-driver BPE trainer rounds:
  * replays trainMergesList's exact mechanics on the real collected type
  * table and attributes time to (count, sort, elect, replace) per the
  * whole run. `runMain graft.BpeProbe [sfDir]`. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    val D = ""
    def cpuS = graft.core.PhaseLog.cpuNanos() / 1e9
    (1 to 3).foreach { i =>
      val (c0, t0) = (cpuS, System.nanoTime())
      val n = graft.queries.Ext.bpeUnitsForProbe(spark, sfDir).collect().length
      println(f"[bpeprobe] units collect $i: n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s cpu=${cpuS - c0}%.2f s")
    }
    val units = graft.queries.Ext.bpeUnitsForProbe(spark, sfDir).collect()
    def wrapStr(u: String): String = u.iterator.map(c => D + c + D).mkString
    def cmpUtf8(a: String, b: String): Int = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0; var c = 0
      while (i < n && c == 0) { c = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (c != 0) c else x.length - y.length
    }
    (1 to 3).foreach { rep =>
      var vocab: Array[(String, Long)] =
        units.map(r => (wrapStr(r.getString(0)), r.getLong(1)))
      var tCount = 0L; var tSort = 0L; var tReplace = 0L
      var made = 0; var done = false
      while (made < 500 && !done) {
        var t0 = System.nanoTime()
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        for ((seg, cnt) <- vocab) {
          val sym = seg.split(D).filter(_.nonEmpty)
          var i = 0
          while (i < sym.length - 1) {
            val k = (sym(i), sym(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + cnt)
            i += 1
          }
        }
        tCount += System.nanoTime() - t0
        if (counts.isEmpty) done = true
        else {
          t0 = System.nanoTime()
          val pool = counts.toSeq
            .sortWith { case ((pa, na), (pb, nb)) =>
              if (na != nb) na > nb
              else {
                val c1 = cmpUtf8(pa._1, pb._1)
                if (c1 != 0) c1 < 0 else cmpUtf8(pa._2, pb._2) < 0
              }
            }
            .take(256)
          tSort += System.nanoTime() - t0
          val used = scala.collection.mutable.Set.empty[String]
          val picked = pool.iterator
            .map { case ((a, b), n) => (a, b, n) }
            .filter { case (a, b, _) =>
              if (used(a) || used(b)) false
              else { used += a; used += b; true }
            }
            .take(math.min(32, 500 - made))
            .toVector
          made += picked.size
          t0 = System.nanoTime()
          vocab = vocab.map { case (seg, cnt) =>
            (picked.foldLeft(seg) { case (sg, (a, b, _)) =>
              sg.replace(D + a + D + D + b + D, D + a + b + D)
            }, cnt)
          }
          tReplace += System.nanoTime() - t0
        }
      }
      println(f"[bpeprobe] rep $rep count=${tCount / 1e9}%.3f s sort=${tSort / 1e9}%.3f s replace=${tReplace / 1e9}%.3f s")
    }
    spark.stop()
  }
}
