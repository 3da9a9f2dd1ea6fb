package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value gates for the round-11 operators that the sf0.01 DuckDB gate
  * alone can't cover at a second scale: the trained-table BPE apply
  * (its literal oracle is pinned to the gate corpus, so the second SF
  * is twin territory, exactly like text_bpe_train itself).
  */
class Round11OpsSpec extends SparkSpec {
  import sqlImplicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("text_bpe_apply_trained matches an independent train+encode at sf0.001") {
    // independent lifecycle: BpeRef trains the ladder (vector-walk
    // trainer) and BpeRef.encode applies it (vector-walk encoder) —
    // neither shares mechanics with the engine's delimiter-wrapped
    // string replace
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val units = BpeRef.unitsFromTexts(texts.map(_._2),
      Ext.BpeChunkTokens, Ext.BpeSampleCap)
    val ladder = BpeRef.refBpe(units,
      Ext.BpeTargetMerges, Ext.BpeBatchK, Ext.BpeCandPool)
      .map { case (_, a, b, _) => (a, b) }
    val expected = texts.map { case (id, text) =>
      val chunks = text.split(" ").filter(_.nonEmpty)
        .grouped(Ext.BpeChunkTokens).map(_.mkString("▁")).toArray
      val subw = chunks.map(u => BpeRef.encode(u, ladder).mkString(" "))
      (id, chunks.length.toLong,
        subw.iterator.map(w => w.count(_ == ' ') + 1L).sum,
        md5hex(subw.mkString(" / ")))
    }.sortBy(_._1)
    val got = Ext.textBpeApplyTrained(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.size == expected.size)
    val firstDiff = got.zip(expected).indexWhere(p => p._1 != p._2)
    assert(got == expected,
      s"trained-apply diverges at index $firstDiff: " +
        s"got=${got.lift(firstDiff)} expected=${expected.lift(firstDiff)}")
  }

  test("trained-apply conservation: merges only ever reduce the subword count") {
    // n_subwords per doc is bounded above by the doc's character count
    // per unit and below by the unit count; total subwords across the
    // corpus must be positive whenever any doc has tokens
    val r = Ext.textBpeApplyTrained(spark, sf0001)
      .agg(sum(col("n_subwords")).cast("long"),
        sum(col("n_units")).cast("long"))
      .as[(Long, Long)].head()
    assert(r._1 >= r._2, "fewer subwords than units is impossible")
    assert(r._1 > 0)
  }

  test("geo_simplify_dp: endpoints kept, real compression, and every final segment meets the eps bound") {
    // the DP fixpoint property, brute-forced: between any two CONSECUTIVE
    // kept points, every dropped original point must sit within eps of
    // the chord (a segment only dies when its max deviation fails the
    // cross-multiplied test) — checked with the same IEEE arithmetic
    val kept = Ext.geoSimplifyDp(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val pts = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val byUser = pts.groupBy(_._1).map { case (u, a) =>
      u -> a.sortBy(r => (r._2, r._3)).zipWithIndex
        .map { case (r, i) => ((i + 1).toLong, r._3) }
    }
    def x(seq: Long, eid: Long): Double =
      ((seq / 16).toDouble * 0.001 + (eid % 5).toDouble * 0.000001) * 103218.0
    def y(seq: Long): Double = (seq.toDouble * 0.0001) * 111320.0
    assert(kept.length < pts.length / 2, "no real compression")
    val keptBy = kept.groupBy(_._1)
    var checked = 0
    for ((u, traj) <- byUser) {
      val eidBySeq = traj.toMap
      val ks = keptBy(u).map(_._2).sorted
      assert(ks.head == 1L && ks.last == traj.length.toLong,
        s"user $u endpoints not kept")
      for (pair <- ks.sliding(2) if pair.length == 2 && pair(1) > pair(0) + 1) {
        val (a, b) = (pair(0), pair(1))
        val ax = x(a, eidBySeq(a)); val ay = y(a)
        val dx = x(b, eidBySeq(b)) - ax; val dy = y(b) - ay
        var q = a + 1
        while (q < b) {
          val cr = dx * (y(q) - ay) - dy * (x(q, eidBySeq(q)) - ax)
          assert(cr * cr <= 25.0 * (dx * dx + dy * dy),
            s"user $u dropped point $q deviates more than eps from ($a,$b)")
          checked += 1; q += 1
        }
      }
    }
    assert(checked > 0, "property never exercised")
  }

  test("graph_kcore matches an independent set-based peel at sf0.001") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val wcount = scala.collection.mutable.Map[(Long, Long), Int]()
    for ((_, rows) <- li.groupBy(_._1)) {
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length) {
        val k = (parts(i), parts(j))
        wcount(k) = wcount.getOrElse(k, 0) + 1
      }
    }
    val und = wcount.filter(_._2 >= 2).keys.toSeq
    var edges: Set[(Long, Long)] = und.toSet ++ und.map(e => (e._2, e._1))
    var last = edges
    for (_ <- 1 to 8) {
      last = edges
      val deg = edges.toSeq.groupBy(_._1).map { case (v, es) => v -> es.size }
      edges = edges.filter { case (a, b) => deg(a) >= 2 && deg(b) >= 2 }
    }
    val expDeg = edges.toSeq.groupBy(_._1)
      .map { case (v, es) => v -> es.size.toLong }
    val expConv = edges.size == last.size
    val got = Warehouse.graphKcore(spark, sf0001)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => r._1 -> r._2).toMap == expDeg)
    assert(got.nonEmpty && got.forall(_._3 == expConv))
  }

  test("geo_staypoints: every emitted dwell satisfies the d/tau contract at sf0.001") {
    // defining properties, brute-forced: all dwell points within d of
    // the anchor, the dwell ends at the FIRST out-of-range ping, the
    // span meets tau, and the emitted integers are self-consistent
    val sp = Ext.geoStaypoints(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(sp.nonEmpty)
    val pts = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val byUser = pts.groupBy(_._1)
      .map { case (u, a) => u -> a.sortBy(r => (r._2, r._3)) }
    def coords(arr: Array[(Long, Long, Long)], i: Int): (Double, Double) = {
      val blk = i / 16; val inb = i % 16
      if (blk % 3 == 2) (blk.toDouble * 200.0 + inb.toDouble * 40.0,
        inb.toDouble * 25.0)
      else (blk.toDouble * 200.0 + (arr(i)._3 % 5).toDouble * 0.5,
        (arr(i)._3 % 7).toDouble * 0.5)
    }
    for ((u, s0, e0, np, dur, sev) <- sp) {
      val arr = byUser(u)
      val s = s0.toInt - 1; val e = e0.toInt - 1
      assert(np == e0 - s0 + 1 && arr(s)._3 == sev)
      assert(dur == arr(e)._2 - arr(s)._2 && dur >= 3600000000L)
      val (xs, ys) = coords(arr, s)
      var q = s
      while (q <= e) {
        val (xq, yq) = coords(arr, q)
        assert((xq - xs) * (xq - xs) + (yq - ys) * (yq - ys) <= 100.0,
          s"in-dwell point out of range u=$u q=$q")
        q += 1
      }
      if (e + 1 < arr.length) {
        val (xn, yn) = coords(arr, e + 1)
        assert((xn - xs) * (xn - xs) + (yn - ys) * (yn - ys) > 100.0,
          s"dwell did not end at the first out-of-range ping u=$u")
      }
    }
  }

  test("sketch twins: engine minhash-LSH and simhash pairs match SketchRef at sf0.001") {
    // the same independent implementations CaptureSketches pins the
    // sf0.01 literal oracles with, asserted here at a second scale so
    // the captured literals can't silently rot against the engine
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val mh = SketchRef.minhashLshPairs(docs)
    val gotMh = Ext.dedupMinhashLsh(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(gotMh == mh, s"minhash diverges: engine=${gotMh.size} twin=${mh.size}")
    assert(mh.nonEmpty)
    val sh = SketchRef.simhashPairs(docs)
    val gotSh = Ext.dedupSimhash(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSeq
    assert(gotSh == sh, s"simhash diverges: engine=${gotSh.size} twin=${sh.size}")
    assert(sh.nonEmpty)
  }

  test("ts_lttb: selections are actual data points, first/last kept, m per series") {
    val got = Warehouse.tsLttb(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    val pts = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val byUser = pts.groupBy(_._1)
      .map { case (u, a) => u -> a.sortBy(r => (r._2, r._3)) }
    val gotBy = got.groupBy(_._1)
    for ((u, arr) <- byUser) {
      val n = arr.length
      val ks = gotBy(u).sortBy(_._2)
      assert(ks.length == math.min(n, 10), s"user $u kept ${ks.length}")
      assert(ks.head._2 == 1L && ks.last._2 == n.toLong)
      for ((_, seq, eid, x, y) <- ks) {
        val p = arr(seq.toInt - 1)
        assert(p._3 == eid && x == p._2 - arr(0)._2 && y == p._4,
          s"user $u seq $seq is not the original point")
      }
    }
  }

  test("mix_gini_concentration matches hand-computed rank arithmetic at sf0.001") {
    val per = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), col("source"),
        graft.ext.Text.tokenCount(col("text")).cast("long").as("ntok"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("ntok")).as("x"))
      .as[(String, String, Long)].collect()
    val expected = per.groupBy(_._1).map { case (lang, rows) =>
      val xs = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong; val t = xs.sum
      val six = xs.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
      val spp = xs.map { v => val sp = 1000000L * v / t; sp * sp }.sum
      lang -> ((n, t, xs.max, 2 * six - (n + 1) * t, n * t, spp / 1000000L))
    }
    val got = Ext.mixGiniConcentration(spark, sf0001).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got == expected)
  }
}
