package graft.queries

import scala.collection.mutable

/** The INDEPENDENT reference BPE trainer (the Round9OpsSpec twin,
  * factored out so the oracle-capture tool and the spec share ONE
  * implementation — two copies would drift). Deliberately different
  * mechanics from `Ext.textBpeTrain` (symbol-VECTOR walk vs the
  * engine's delimiter-wrapped string replace) so the two remain
  * independent evidence about the same batched-election contract.
  *
  * Test scope on purpose: this is verification machinery, never a
  * production path. `tools.CaptureBpe` runs it at the driver-gate SF
  * to derive the literal table `ExtOracle` pins for `text_bpe_train`
  * (the `pipeline_blindzone` digest precedent — the literal comes from
  * the independent implementation, not from the engine under test). */
object BpeRef {

  /** UTF-8 byte order — matches Spark's UTF8String sort; Java String
    * compare would diverge on non-ASCII ties. */
  def cmpUtf8(a: String, b: String): Int = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) { c = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
    if (c != 0) c else x.length - y.length
  }

  /** Independently rebuild the engine's training units from raw doc
    * texts: per-doc whitespace tokens, grouped into chunkTokens-token
    * chunks joined by the ▁ boundary marker, type-counted, capped by
    * (cnt desc, unit) in UTF-8 binary order. */
  def unitsFromTexts(texts: Seq[String], chunkTokens: Int,
      cap: Int): Seq[(String, Long)] =
    texts
      .flatMap(t => t.split(" ").filter(_.nonEmpty)
        .grouped(chunkTokens).map(_.mkString("▁")))
      .groupBy(identity).map { case (u, g) => (u, g.size.toLong) }.toSeq
      .sortBy { case (u, n) => (-n, u) }(
        Ordering.Tuple2(Ordering.Long,
          (a: String, b: String) => cmpUtf8(a, b)))
      .take(cap)

  /** Independent ladder ENCODER for the trained-apply twin: start from
    * the unit's character vector and apply every merge in ladder order
    * as one leftmost non-overlapping pass (the refBpe applyMerge walk —
    * vector mechanics vs the engine's delimiter-wrapped replace). */
  def encode(unit: String,
      ladder: Seq[(String, String)]): Vector[String] = {
    var sym = unit.map(_.toString).toVector
    for ((p1, p2) <- ladder) {
      val merged = Vector.newBuilder[String]
      var i = 0
      while (i < sym.length) {
        if (i + 1 < sym.length && sym(i) == p1 && sym(i + 1) == p2) {
          merged += p1 + p2; i += 2
        } else { merged += sym(i); i += 1 }
      }
      sym = merged.result()
    }
    sym
  }

  /** Reference BPE trainer — the BATCHED contract textBpeTrain
    * documents: per round, order pairs by (count desc, UTF-8 byte-order
    * lexicographic), scan the top-candPool pairs, elect up to batchK
    * whose symbol sets are disjoint from every earlier election this
    * round, apply them in election order (greedy leftmost
    * non-overlapping merge each), then recount. */
  def refBpe(words: Seq[(String, Long)], target: Int,
      batchK: Int, candPool: Int): Seq[(Int, String, String, Long)] = {
    implicit val utf8Order: Ordering[String] = (a, b) => cmpUtf8(a, b)
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    def applyMerge(p1: String, p2: String): Unit =
      vocab = vocab.map { case (sym, c) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == p1 && sym(i + 1) == p2) {
            merged += p1 + p2; i += 2
          } else { merged += sym(i); i += 1 }
        }
        merged.result() -> c
      }
    var made = 0
    var done = false
    while (made < target && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((sym, c) <- vocab; i <- 0 until sym.length - 1)
        counts((sym(i), sym(i + 1))) += c
      if (counts.isEmpty) done = true
      else {
        val pool = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.take(candPool)
        val used = mutable.Set.empty[String]
        val picked = pool.iterator
          .filter { case ((a, b), _) =>
            if (used(a) || used(b)) false
            else { used += a; used += b; true }
          }
          .take(math.min(batchK, target - made))
          .toVector
        for (((p1, p2), n) <- picked) {
          made += 1
          out += ((made, p1, p2, n))
          applyMerge(p1, p2)
        }
      }
    }
    out.result()
  }
}
