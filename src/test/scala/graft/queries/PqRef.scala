package graft.queries

/** INDEPENDENT reference implementation of the PQ and IVF-PQ search
  * lifecycles (extends [[IvfRef]]'s discipline to the codebook family):
  * plain-collections Lloyd sub-codebook training with the fixed-point
  * mean contract, per-block L2-nearest encode (argmax of
  * `dot(x,c) − ‖c‖²/2`, strict-greater so the lowest code wins ties),
  * ADC scoring, orthogonal-block / full-walk reconstruction norms, and
  * the oversample → exact-re-rank tail. Never calls the engine;
  * `CapturePq` asserts engine == twin before printing oracle literals.
  */
object PqRef {

  type Books = Array[Array[Array[Double]]]

  /** Generic element access: the raw corpus is float, the IVF-PQ
    * residuals are double — both widen per element like SeqDot. */
  private def at(v: Array[AnyVal], i: Int): Double = v(i) match {
    case f: Float => f.toDouble
    case d: Double => d
    case other => other.asInstanceOf[Number].doubleValue()
  }

  private def norms2(books: Books): Array[Array[Double]] =
    books.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  /** PqMath.encode parity. Returns null codes for a mis-sized vector. */
  def encode(vec: Array[AnyVal], books: Books, subDim: Int): Option[Array[Int]] = {
    val m = books.length
    if (vec == null || vec.length != m * subDim) return None
    val n2 = norms2(books)
    val out = new Array[Int](m)
    var b = 0
    while (b < m) {
      val cb = books(b)
      val off = b * subDim
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var acc = 0.0
        var j = 0
        while (j < subDim) { acc += at(vec, off + j) * cv(j); j += 1 }
        val score = acc - n2(b)(c) / 2.0
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(b) = best
      b += 1
    }
    Some(out)
  }

  /** PqMath.adcDot parity: `Σ_b dot(q_block, codebook(b)(code_b))`. */
  def adcDot(qvec: Array[Float], codes: Array[Int], books: Books,
      subDim: Int): Double = {
    var acc = 0.0
    var b = 0
    while (b < books.length) {
      val cv = books(b)(codes(b))
      val off = b * subDim
      var j = 0
      while (j < subDim) { acc += qvec(off + j).toDouble * cv(j); j += 1 }
      b += 1
    }
    acc
  }

  /** PqMath.reconNorm parity (orthogonal blocks). */
  def reconNorm(codes: Array[Int], books: Books): Double = {
    val n2 = norms2(books)
    var acc = 0.0
    var b = 0
    while (b < books.length) { acc += n2(b)(codes(b)); b += 1 }
    math.sqrt(acc)
  }

  /** PqMath.reconNormPlus parity: ‖base + decode(codes)‖, full walk. */
  def reconNormPlus(base: Array[Double], codes: Array[Int], books: Books,
      subDim: Int): Double = {
    var acc = 0.0
    var b = 0
    while (b < books.length) {
      val cv = books(b)(codes(b))
      val off = b * subDim
      var j = 0
      while (j < subDim) {
        val x = base(off + j) + cv(j)
        acc += x * x
        j += 1
      }
      b += 1
    }
    math.sqrt(acc)
  }

  /** Similarity.trainPq parity, fixed-point means ([[IvfRef.MeanScale]]):
    * seeds = `nlist` lowest-id clean vectors sliced per block; each
    * iteration encodes every clean vector and recomputes each
    * (block, code) mean as `Σ floor(x·2²⁴) / (n·2²⁴)` per sub-dim. */
  def trainPq(corpus: Seq[(Long, Array[AnyVal])], m: Int, subDim: Int,
      nlist: Int, iters: Int): Books = {
    val dim = m * subDim
    val clean = corpus.filter(v => v._2 != null && v._2.length == dim)
      .sortBy(_._1)
    var books: Books = {
      val seeds = clean.take(nlist)
        .map(v => Array.tabulate(dim)(i => at(v._2, i)))
      Array.tabulate(m)(b =>
        seeds.map(v => v.slice(b * subDim, (b + 1) * subDim)).toArray)
    }
    (0 until iters).foreach { _ =>
      val sums = new java.util.HashMap[(Int, Int), (Array[Long], Long)]()
      clean.foreach { case (_, v) =>
        encode(v, books, subDim).foreach { codes =>
          var b = 0
          while (b < m) {
            val key = (b, codes(b))
            val cur = sums.getOrDefault(key, (new Array[Long](subDim), 0L))
            val off = b * subDim
            var j = 0
            while (j < subDim) {
              cur._1(j) +=
                math.floor(at(v, off + j) * IvfRef.MeanScale).toLong
              j += 1
            }
            sums.put(key, (cur._1, cur._2 + 1L))
            b += 1
          }
        }
      }
      books = Array.tabulate(m)(b => books(b).zipWithIndex.map {
        case (c, code) =>
          Option(sums.get((b, code))) match {
            case Some((s, n)) =>
              s.map(_.toDouble / (n.toDouble * IvfRef.MeanScale))
            case None => c
          }
      })
    }
    books
  }

  private def dotFF(a: Array[Float], b: Array[Float]): Double =
    IvfRef.dotFF(a, b)

  /** Shared exact-re-rank tail (Similarity.exactRerank parity): rank the
    * shortlist by exact cosine, row_number ≤ k on (cos desc, vec_id). */
  private def rerank(qid: Long, qv: Array[Float], qn: Double,
      shortlist: Seq[Long], corpus: Map[Long, Array[Float]], k: Int)
      : Seq[(Long, Int, Long, Double)] =
    shortlist.flatMap { vid =>
      corpus.get(vid).map { cv =>
        val cn = math.sqrt(dotFF(cv, cv))
        (vid, dotFF(qv, cv) / (qn * cn))
      }
    }.sortWith { case ((id1, c1), (id2, c2)) =>
      val d = java.lang.Double.compare(c1, c2)
      if (d != 0) d > 0 else id1 < id2
    }.take(k).zipWithIndex.map { case ((vid, cos), i) => (qid, i + 1, vid, cos) }

  /** Similarity.pqTopK parity over an encoded corpus. */
  def pqTopK(queries: Seq[(Long, Array[Float])],
      codes: Seq[(Long, Array[Int])], corpus: Map[Long, Array[Float]],
      k: Int, oversample: Int, books: Books, subDim: Int)
      : Seq[(Long, Int, Long, Double)] =
    queries.sortBy(_._1).flatMap { case (qid, qv) =>
      val qn = math.sqrt(dotFF(qv, qv))
      val shortlist = codes.filter(_._1 != qid)
        .map { case (vid, cs) =>
          (vid, adcDot(qv, cs, books, subDim) / (qn * reconNorm(cs, books)))
        }
        .sortWith { case ((id1, c1), (id2, c2)) =>
          val d = java.lang.Double.compare(c1, c2)
          if (d != 0) d > 0 else id1 < id2
        }.take(k * oversample).map(_._1)
      rerank(qid, qv, qn, shortlist, corpus, k)
    }

  /** Similarity.ivfPqTopK parity over a residual-coded inverted file. */
  def ivfPqTopK(queries: Seq[(Long, Array[Float])],
      index: Seq[(Long, Int, Array[Int], Double)], // (vec_id, cid, codes, recon_norm)
      cents: Seq[(Int, Array[Double])],
      resBooks: Books, subDim: Int,
      corpus: Map[Long, Array[Float]],
      k: Int, oversample: Int, nprobe: Int): Seq[(Long, Int, Long, Double)] = {
    val byCell = index.groupBy(_._2)
    val centOf = cents.toMap
    queries.sortBy(_._1).flatMap { case (qid, qv) =>
      IvfRef.topCids(qv, cents, nprobe) match {
        case None => Nil
        case Some(probes) =>
          val qn = math.sqrt(dotFF(qv, qv))
          val shortlist = probes.flatMap { cid =>
            val cent = centOf(cid)
            // dot(qvec float, centroid double) — SeqDot FD fold
            var qc = 0.0
            var i = 0
            while (i < qv.length) { qc += qv(i).toDouble * cent(i); i += 1 }
            byCell.getOrElse(cid, Nil).filter(_._1 != qid).map {
              case (vid, _, cs, rn) =>
                (vid, (qc + adcDot(qv, cs, resBooks, subDim)) / (qn * rn))
            }
          }.sortWith { case ((id1, c1), (id2, c2)) =>
            val d = java.lang.Double.compare(c1, c2)
            if (d != 0) d > 0 else id1 < id2
          }.take(k * oversample).map(_._1)
          rerank(qid, qv, qn, shortlist, corpus, k)
      }
    }
  }
}
