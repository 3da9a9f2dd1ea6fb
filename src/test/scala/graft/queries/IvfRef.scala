package graft.queries

/** INDEPENDENT reference implementation of the IVF lifecycle (the
  * [[SketchRef]] discipline): plain-collections Lloyd training with the
  * fixed-point mean contract and an in-memory inverted-file search,
  * written against the PUBLIC contracts only — sequential left-fold dot
  * products with per-element float→double widening, cosine tie-breaks
  * toward the lowest centroid id / vector id, `floor(x·2²⁴)` integer
  * mean accumulators (exact in any order — the r12 determinism rewrite),
  * nprobe cell probing, exact in-cell ranking. Never calls the engine;
  * `CaptureIvf` asserts engine == twin before printing oracle literals.
  */
object IvfRef {

  val MeanScale: Long = 1L << 24 // = graft.ext.Similarity.MeanScale

  /** Sequential left-fold dot, floats widened per element (SeqDot FF). */
  def dotFF(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** Vector-against-centroid fold (CentroidMath parity: float widened,
    * centroid already double). */
  private def dotFD(v: Array[Float], c: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < v.length) { acc += v(j).toDouble * c(j); j += 1 }
    acc
  }

  /** Centroid L2 norm — `c.map(x => x*x).sum` left fold, the
    * broadcastModel order. */
  private def cNorm(c: Array[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < c.length) { s += c(j) * c(j); j += 1 }
    math.sqrt(s)
  }

  /** Top-`topn` centroid ids by cosine, best first; ties toward the
    * LOWEST cid; zero-norm centroids score -∞; null for a
    * length-mismatched vector (CentroidMath.topCids parity). */
  def topCids(vec: Array[Float], cents: Seq[(Int, Array[Double])],
      topn: Int): Option[Seq[Int]] = {
    val m = cents.size
    val scores = new Array[Double](m)
    val cids = cents.map(_._1).toArray
    var c = 0
    while (c < m) {
      val cv = cents(c)._2
      if (cv.length != vec.length) return None
      val nrm = cNorm(cv)
      scores(c) =
        if (nrm == 0.0) Double.NegativeInfinity else dotFD(vec, cv) / nrm
      c += 1
    }
    val k = math.min(topn, m)
    val picked = new Array[Boolean](m)
    val out = new Array[Int](k)
    var r = 0
    while (r < k) {
      var best = -1
      var c2 = 0
      while (c2 < m) {
        if (!picked(c2)) {
          val cmp =
            if (best < 0) 1
            else {
              val d = java.lang.Double.compare(scores(c2), scores(best))
              if (d != 0) d else cids(best) - cids(c2)
            }
          if (cmp > 0) best = c2
        }
        c2 += 1
      }
      picked(best) = true
      out(r) = cids(best)
      r += 1
    }
    Some(out.toSeq)
  }

  /** Lloyd training, fixed-point means: seeds = `nlist` lowest-id
    * vectors; each iteration assigns by [[topCids]] and recomputes every
    * non-empty cell's mean as `Σ floor(x·2²⁴) / (n·2²⁴)` per dimension
    * (empty cells keep their centroid). Vectors whose assignment is
    * null (length mismatch) train nothing. */
  def trainCentroids(corpus: Seq[(Long, Array[Float])], nlist: Int,
      iters: Int): Seq[(Int, Array[Double])] = {
    val clean = corpus.filter(_._2 != null).sortBy(_._1)
    var cents: Seq[(Int, Array[Double])] = clean.take(nlist).zipWithIndex
      .map { case ((_, v), i) => i -> v.map(_.toDouble) }
    (0 until iters).foreach { _ =>
      val sums = new java.util.HashMap[Int, (Array[Long], Long)]()
      clean.foreach { case (_, v) =>
        topCids(v, cents, 1).foreach { cid =>
          val d = v.length
          val cur = sums.getOrDefault(cid.head, (new Array[Long](d), 0L))
          var j = 0
          while (j < d) {
            cur._1(j) += math.floor(v(j).toDouble * MeanScale).toLong
            j += 1
          }
          sums.put(cid.head, (cur._1, cur._2 + 1L))
        }
      }
      cents = cents.map { case (cid, c) =>
        Option(sums.get(cid)) match {
          case Some((s, n)) =>
            cid -> s.map(_.toDouble / (n.toDouble * MeanScale))
          case None => cid -> c
        }
      }
    }
    cents
  }

  /** IVF search (ivfTopKWithCentroids parity): corpus cells by nearest
    * centroid, queries probe their `nprobe` cells, exact cosine ranking
    * within candidates, row_number ≤ k by (cos desc, vec_id asc).
    * Queries with null/null-element vectors drop (probe explode);
    * corpus vectors with null cid never join. */
  def ivfTopK(queries: Seq[(Long, Array[Float])],
      corpus: Seq[(Long, Array[Float])], k: Int,
      cents: Seq[(Int, Array[Double])], nprobe: Int)
      : Seq[(Long, Int, Long, Double)] = {
    val cells = corpus.filter(_._2 != null).flatMap { case (id, v) =>
      topCids(v, cents, 1).map(c =>
        (id, v, c.head, math.sqrt(dotFF(v, v))))
    }
    val byCell = cells.groupBy(_._3)
    queries.filter(_._2 != null).sortBy(_._1).flatMap { case (qid, qv) =>
      topCids(qv, cents, nprobe) match {
        case None => Nil
        case Some(probes) =>
          val qn = math.sqrt(dotFF(qv, qv))
          val cands = probes.flatMap(p => byCell.getOrElse(p, Nil))
            .filter(_._1 != qid)
            .map { case (vid, v, _, cn) => (vid, dotFF(qv, v) / (qn * cn)) }
          cands.sortWith { case ((id1, c1), (id2, c2)) =>
            val d = java.lang.Double.compare(c1, c2)
            if (d != 0) d > 0 else id1 < id2
          }.take(k).zipWithIndex.map { case ((vid, cos), i) =>
            (qid, i + 1, vid, cos)
          }
      }
    }
  }
}
