package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent recomputation checks for the [[Warehouse]] operators —
  * the DuckDB gate proves cross-engine parity; these prove the SEMANTICS
  * against hand-computable or brute-force references. */
class WarehouseSpec extends SparkSpec {

  test("graph_pagerank: matches a driver-side reference PageRank on the real graph") {
    // brute-force the same fixed-point iteration in plain Scala from the
    // same edge relation, then require bit-equality
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keys.toSeq.sorted
    var rank = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(n => n -> (150000000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = Warehouse.graphPagerank(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == nodes.length)
    got.foreach { case (n, r) => assert(r == rank(n), s"node $n") }
  }

  test("pagerank mass conservation: total rank stays within rounding of N*SCALE") {
    val ranks = Warehouse.graphPagerank(spark, sf0001)
      .agg(sum(col("rank")), count(lit(1))).collect()(0)
    val (total, n) = (ranks.getLong(0), ranks.getLong(1))
    // each node loses < 100 units to the two integer divisions per
    // iteration; 5 iterations bound the total drift
    assert(total <= n * 1000000000L)
    assert(total >= n * 1000000000L - n * 5L * (100L + deg2loss(n)))
  }
  private def deg2loss(n: Long): Long = 1000L // slack for div truncation chains

  test("graph_triangles: matches a brute-force adjacency-set count") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triOf = adj.map { case (u, nbrs) =>
      u -> nbrs.toSeq.combinations(2).count {
        case Seq(v, w) => adj(v).contains(w); case _ => false }.toLong
    }
    val got = Warehouse.graphTriangles(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == adj.size)
    got.foreach { case (n, deg, tri, cc) =>
      assert(deg == adj(n).size.toLong, s"deg of $n")
      assert(tri == triOf(n), s"triangles of $n")
      if (deg >= 2)
        assert(cc == BigDecimal(2.0 * tri / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else assert(cc == 0.0)
    }
  }

  test("geo_radius_join: blocking loses nothing — equals the brute-force O(n^2) pair set") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pts = ev.map { case (eid, uid) =>
      (eid, 22.0 + (eid % 9973) * 0.00001, 114.0 + ((uid * 7919) % 9973) * 0.00001)
    }
    val want = (for {
      (i1, la1, lo1) <- pts; (i2, la2, lo2) <- pts
      if i1 < i2
      dx = (lo2 - lo1) * 103218.0; dy = (la2 - la1) * 111320.0
      if dx * dx + dy * dy <= 625.0
    } yield (i1, i2)).toSet
    val got = graft.queries.Ext.geoRadiusJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("events_funnel: stages are strictly ordered and depth is monotone-consistent") {
    val rows = Warehouse.eventsFunnel(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t1 = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val depth = r.getLong(4)
      // a later stage implies every earlier stage, strictly increasing
      if (t3.isDefined) { assert(t2.isDefined && t3.get > t2.get) }
      if (t2.isDefined) { assert(t1.isDefined && t2.get > t1.get) }
      assert(depth == Seq(t1, t2, t3).count(_.isDefined))
    }
  }

  test("ts_resample_grid: LOCF equals brute-force last-event-at-or-before per cell") {
    val cell = 21600000000L
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val c0 = ev.map(_._2).min / cell
    val c1 = ev.map(_._2).max / cell
    val byUser = ev.groupBy(_._1)
    val got = Warehouse.tsResampleGrid(spark, sf0001).collect()
    assert(got.length == byUser.size * (c1 - c0 + 1).toInt)
    got.foreach { r =>
      val (u, ci, sampleUs) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sampleUs == (ci + 1) * cell - 1)
      val eligible = byUser(u).filter(_._2 <= sampleUs)
      if (eligible.isEmpty) assert(r.isNullAt(3))
      else {
        // deterministic last: max by (ts, event_id)
        val want = eligible.maxBy(e => (e._2, e._4))._3
        assert(r.getDouble(3) == want, s"user $u cell $ci")
      }
    }
  }

  test("merge_upsert: updates win, inserts append, base rows pass through") {
    val out = Warehouse.mergeUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val byKey = out.groupBy(_._1)
    // exactly one row per key
    assert(byKey.values.forall(_.length == 1))
    out.foreach {
      case (k, v, "U") => assert(k % 7 == 0 && v == base(k) + 100.0)
      case (k, v, "N") => assert((k - 10000000L) % 97 == 0 && v == base(k - 10000000L))
      case (k, v, "B") => assert(k % 7 != 0 && v == base(k))
      case other => fail(s"unexpected row $other")
    }
    // every base key survives
    assert(base.keys.forall(byKey.contains))
  }

  test("merge_cdc: last op wins per key; deletes remove; brute-force equal") {
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val want = scala.collection.mutable.Map.empty[Long, (Double, String)]
    base.foreach { case (k, p) => want(k) = (p, "B") }
    base.keys.foreach { k =>
      // replay in seq order; within seq 2 the 'D' < 'U' tie-break
      if (k % 5 == 0) want(k) = (base(k) + 10.0, "U")
      if (k % 97 == 0) want(k + 20000000L) = (base(k), "I")
      if (k % 11 == 0) want.remove(k) // seq-2 D beats any seq-2 U on ties
      else if (k % 10 == 0) want(k) = (base(k) + 20.0, "U")
    }
    val got = Warehouse.mergeCdc(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got == want.toMap)
  }

  test("win_pareto_abc: conservation, monotone cumulative, correct class boundaries") {
    val rows = Warehouse.winParetoAbc(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).max == total, "last cumulative equals the total")
    // resort into ranking order and check monotone + exact share math
    val ranked = rows.sortBy(r => (-r._2, r._1))
    ranked.foldLeft(0L) { case (prev, (_, rev, cum, p100k, abc)) =>
      assert(cum == prev + rev, "cumulative is exact cent addition")
      assert(p100k == cum * 100000L / total)
      assert(abc == (if (p100k <= 80000) "A" else if (p100k <= 95000) "B" else "C"))
      cum
    }
  }

  test("diff_snapshots: every emitted row is a real difference, every mutation is emitted") {
    val rows = Warehouse.diffSnapshots(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val keys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    keys.foreach { k =>
      if (k % 17 == 0) assert(rows.get(k).contains("R"), s"removed $k")
      else if (k % 13 == 0) assert(rows.get(k).contains("C"), s"changed $k")
      else assert(!rows.contains(k), s"unchanged $k must not be emitted")
      if (k % 89 == 0) assert(rows.get(k + 30000000L).contains("A"), s"added $k")
    }
  }

  test("win_clamped_balance: the window identity equals the sequential clamped fold") {
    val got = Warehouse.winClampedBalance(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      var b = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, delta, balance) =>
        b = math.max(0L, b + delta)
        assert(balance == b)
      }
    }
    // the clamp must have actually engaged somewhere
    assert(got.exists(_._5 == 0L))
  }

  test("events_attribution: latest prior view/click within the session, none across gaps") {
    val gap = 1800L * 1000000L
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var lastTs = Long.MinValue
      var touch: Option[(String, Long)] = None
      sorted.flatMap { case (_, ts, id, ty) =>
        if (lastTs != Long.MinValue && ts - lastTs > gap) touch = None // new session
        lastTs = ts
        val out = if (ty == "purchase")
          Some(id -> touch.map(t => (t._1, t._2)))
        else None
        if (ty == "view" || ty == "click") touch = Some((ty, id))
        out
      }
    }
    val got = Warehouse.eventsAttribution(spark, sf0001).collect()
      .map(r => r.getLong(2) -> (if (r.getString(3) == "none") None
        else Some((r.getString(3), r.getLong(4))))).toMap
    assert(got == want.toMap)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("mix_quantile_normalize: after the transform every group draws from the same global values") {
    val rows = Warehouse.mixQuantileNormalize(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val globalValues = rows.map(_._3).sorted
    // every normalized value is a real global order statistic
    val gset = globalValues.toSet
    assert(rows.forall(r => gset.contains(r._4)))
    // rank preservation within each group: norm order == value order
    rows.groupBy(_._2).values.foreach { g =>
      val byVal = g.sortBy(r => (r._3, r._1)).map(_._4)
      assert(byVal.sorted.sameElements(byVal), "monotone within group")
    }
    // the max of every group maps to (nearly) the global max position
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.maxBy(r => (r._3, r._1))._4 == globalValues.last)
    }
  }

  test("agg_robust_outliers: matches a brute-force sorted-selection median/MAD") {
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def disc(xs: Seq[(Double, Long)]): Double = {
      val sorted = xs.sortBy(identity)
      sorted((sorted.size + 1) / 2 - 1)._1 // value at ceil(n/2), 1-based
    }
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val med = disc(rows.map(r => (r._2, r._3)).toSeq)
      val devs = rows.map(r => (math.abs(r._2 - med), r._3)).toSeq
      val mad = disc(devs)
      t -> ((rows.length.toLong, med, mad, devs.count(_._1 > mad * 3).toLong))
    }
    val got = Warehouse.aggRobustOutliers(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == want)
    // the report must actually flag something on a uniform-ish feed
    assert(got.values.exists(_._4 > 0))
  }

  test("scd2_history: intervals tile each user's timeline with no gaps or overlaps") {
    val rows = Warehouse.scd2History(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (_, hs) =>
      val sorted = hs.sortBy(_._5)
      sorted.zipWithIndex.foreach { case ((_, _, _, _, v, _), i) =>
        assert(v == i + 1, "versions are dense from 1")
      }
      sorted.sliding(2).foreach {
        case Array((_, ty1, _, to1, _, cur1), (_, ty2, from2, _, _, _)) =>
          assert(to1.contains(from2), "valid_to chains to next valid_from")
          assert(ty1 != ty2, "consecutive versions differ in attribute")
          assert(!cur1, "only the last version is current")
        case _ =>
      }
      assert(sorted.last._4.isEmpty && sorted.last._6, "open current interval")
    }
  }

  test("join_fuzzy_names: equals a brute-force blocked match, and the source is always within 1 edit") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val probes = parts.filter { case (k, n) => k % 5 == 0 && n.length >= 4 }
      .map { case (k, n) => (k, n.substring(0, 2) + n.substring(3)) }
    val want = probes.flatMap { case (pk, pn) =>
      val cands = parts.filter { case (_, n) =>
        n.length >= 2 && n.substring(0, 2) == pn.substring(0, 2) &&
          math.abs(n.length - pn.length) <= 2 && lev(pn, n) <= 2 }
      if (cands.isEmpty) None
      else Some(pk -> cands.map { case (k, n) => (lev(pn, n), k) }.min)
    }.toMap
    val got = Warehouse.joinFuzzyNames(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3).toInt, r.getLong(2)))).toMap
    assert(got == want)
    // deleting one char keeps the source within edit distance 1, and the
    // block key (first 2 chars) is preserved — so every probe matches
    got.values.foreach { case (dist, _) => assert(dist <= 1) }
    assert(got.size == probes.length)
  }

  test("profile_histogram: bins partition the rows and bounds are honest") {
    val rows = Warehouse.profileHistogram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(rows.map(_._2).sum == total, "every row lands in exactly one bin")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    // bin_lo is monotone in bin
    assert(rows.sortBy(_._1).map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a < b; case _ => true })
  }

  test("ts_interpolate: equals brute-force neighbor interpolation, every nulled row repaired") {
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._3)).toIndexedSeq).toMap
    val got = Warehouse.tsInterpolate(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(2), r.getLong(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val nulled = ev.filter(_._3 % 7 == 0)
    assert(got.size == nulled.length, "every nulled reading is repaired")
    nulled.foreach { case (u, ts, eid, _) =>
      val series = byUser(u)
      val i = series.indexWhere(e => e._2 == ts && e._3 == eid)
      val prev = series.take(i).reverse.find(_._3 % 7 != 0)
      val next = series.drop(i + 1).find(_._3 % 7 != 0)
      val want = (prev, next) match {
        case (Some(p), Some(n)) =>
          Some(p._4 + (n._4 - p._4) *
            ((ts - p._2).toDouble / (n._2 - p._2).toDouble))
        case (Some(p), None) => Some(p._4)
        case (None, Some(n)) => Some(n._4)
        case _ => None
      }
      assert(got((u, ts, eid)) == want, s"user $u event $eid")
    }
  }

  test("agg_incremental_merge: merged partials equal a direct full aggregate") {
    val merged = Warehouse.aggIncrementalMerge(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val full = graft.core.Tables.eventsTsUs(spark, sf001)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(merged.keySet == full.keySet)
    merged.foreach { case (k, (n, sv)) =>
      assert(full(k)._1 == n)
      assert(math.abs(full(k)._2 - sv) <= 0.011, s"group $k") // one post-round ulp
    }
  }

  test("ts_decompose equals the naive dense-spine recomputation") {
    val daily = graft.core.Tables.eventsTsUs(spark, sf0001)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = daily.keySet.groupBy(_._1).toSeq.flatMap { case (tpe, ks) =>
      val (d0, d1) = (ks.map(_._2).min, ks.map(_._2).max)
      val dense = (d0 to d1).map(d => d -> daily.getOrElse((tpe, d), 0L))
      val det = dense.zipWithIndex.collect {
        case ((d, c), i) if i >= 3 && i + 3 < dense.size =>
          (d % 7, c * 7 - dense.slice(i - 3, i + 4).map(_._2).sum)
      }
      det.groupBy(_._1).toSeq.map { case (wd, rs) =>
        val n = rs.size.toLong
        val s7 = (rs.map(_._2).sum + n * 1099511627776L) / n - 1099511627776L
        (tpe, wd, n, s7, rs.map(r => math.abs(r._2 - s7)).sum,
          rs.map(r => math.abs(r._2 - s7)).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("ts_decompose")(spark, sf0001)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got == expect)
  }
}
