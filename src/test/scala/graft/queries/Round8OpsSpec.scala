package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the round-8 operator family — properties the
  * DuckDB hash gate cannot see (it proves value parity, not that the
  * values mean what the scaladoc claims). */
class Round8OpsSpec extends SparkSpec {

  test("zorder interleave is a bijection: decoding zval recovers (sx, sy) exactly") {
    // decode in plain Scala (independent of the SQL fragment under test)
    def compact(z: Long): Long = {
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0x0000FFFFL
    }
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    val b = li.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val rows = Warehouse.zorderCoded(li, b.getLong(0), b.getLong(1),
        b.getLong(2), b.getLong(3))
      .select(col("sx"), col("sy"), col("zval")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sx, sy, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sx >= 0 && sx < 1024 && sy >= 0 && sy < 1024, s"grid out of range: $sx $sy")
      assert(compact(z) == sx, s"x decode: z=$z sx=$sx got ${compact(z)}")
      assert(compact(z >> 1) == sy, s"y decode: z=$z sy=$sy got ${compact(z >> 1)}")
    }
  }

  test("agg_winsorize: bounds hold and only out-of-band values move") {
    val out = Warehouse.aggWinsorize(spark, sf0001).collect()
    val bounds = out.groupBy(_.getString(1)).map { case (t, rs) =>
      // within each type the clamped column must lie inside [min, max]
      // of the clamped values AND every untouched row keeps its value
      val moved = rs.filter(r => r.getDouble(2) != r.getDouble(3))
      val kept = rs.filter(r => r.getDouble(2) == r.getDouble(3))
      (t, rs.size, moved.size, kept.size)
    }
    bounds.foreach { case (t, n, moved, kept) =>
      assert(moved + kept == n)
      // a 5%/95% clamp moves roughly 10% of rows — never most of them
      assert(moved < n / 2, s"$t: $moved of $n rows clamped")
      assert(moved > 0, s"$t: clamp moved nothing — degenerate bounds")
    }
    // clamped values are order statistics: every value_w must appear as
    // some raw value of the same type (selection, not interpolation)
    val byType = out.groupBy(_.getString(1))
    byType.foreach { case (_, rs) =>
      val raw = rs.map(_.getDouble(2)).toSet
      rs.foreach(r => assert(raw.contains(r.getDouble(3)),
        s"value_w ${r.getDouble(3)} is not a data value"))
    }
  }

  test("profile_skew: internal consistency (p50 <= p99 <= max, totals add up)") {
    val r = Warehouse.profileSkew(spark, sf0001).head()
    val (nKeys, nRows, maxS, p50, p99, ppm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(p50 <= p99 && p99 <= maxS)
    assert(nKeys > 0 && nRows >= nKeys)
    assert(ppm == maxS * 1000000L / nRows)
    // cross-check totals against a direct count
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
    assert(nRows == ev.count())
    assert(nKeys == ev.select(col("user_id")).distinct().count())
  }

  test("profile_join_card predicts the materialized join size exactly") {
    val pred = Warehouse.profileJoinCard(spark, sf0001).head()
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val or = spark.read.parquet(s"$sf0001/orders.parquet")
    val real = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
    assert(pred.getLong(1) == real, s"predicted ${pred.getLong(1)} real $real")
  }

  test("win_rolling_wau: wau >= dau every day, and wau(d) is the exact distinct over [d-6, d]") {
    val out = Warehouse.winRollingWau(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (d, dau, wau) => assert(wau >= dau, s"day $d: wau $wau < dau $dau") }
    // brute-force cross-check on three sampled days
    val ud = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = out.map(_._1)
    Seq(days.head, days(days.length / 2), days.last).foreach { d =>
      val expect = ud.filter { case (_, day) => day >= d - 6 && day <= d }
        .map(_._1).distinct.length.toLong
      val got = out.find(_._1 == d).get._3
      assert(got == expect, s"day $d: wau $got expected $expect")
    }
  }

  test("sample_reservoir_group: exactly k per source and rerun-identical") {
    val a = Ext.sampleReservoirGroup(spark, sf0001).collect()
    val perSource = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    perSource.foreach { case (s, n) => assert(n == 20, s"$s: $n rows") }
    val b = Ext.sampleReservoirGroup(spark, sf0001).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted),
      "reservoir is not rerun-stable")
  }

  test("agg_weighted_median equals the brute-force weighted selection") {
    val out = Ext.aggWeightedMedian(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // independent reference: collect (source, ntok, q), sort, scan
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", graft.ext.Text.tokens(col("text")))
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast("long").as("ntok"),
        graft.ext.Text.qualityScore(col("toks")).as("q"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getLong(1)))
    docs.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4)) // (q, doc_id)
      val tw = sorted.map(_._2).sum
      def sel(num: Long, den: Long): Double = {
        var cw = 0L
        sorted.find { r => cw += r._2; cw * den >= tw * num }.get._3
      }
      val (gotTw, gotM, gotP) = out(src)
      assert(gotTw == tw, s"$src total")
      assert(gotM == sel(1, 2), s"$src median: got $gotM want ${sel(1, 2)}")
      assert(gotP == sel(9, 10), s"$src p90: got $gotP want ${sel(9, 10)}")
    }
  }

  test("dedup_apply_priority keeps the quality argmax of each duplicate component") {
    val kept = Ext.dedupApplyPriority(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    val minIdKept = Ext.dedupApply(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    // same corpus, same pair graph ⇒ identical survivor COUNT — only the
    // per-component election differs
    assert(kept.size == minIdKept.size,
      s"priority kept ${kept.size}, min-id kept ${minIdKept.size}")
    // the election must actually differ somewhere at this SF (a vacuous
    // pass would mean the policy is dead weight)
    assert(kept != minIdKept, "priority election never diverged from min-id")
    // independent check: within every component the kept member has the
    // max quality (ties → min id) among the component's members
    val pairs = Ext.jaccardPairs08(spark, sf001)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val q = Ext.docsTok(spark, sf001)
      .select(col("doc_id"), graft.ext.Text.qualityScore(col("toks")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    members.groupBy(find).foreach { case (_, ms) =>
      val winner = ms.minBy(id => (-q(id), id))
      assert(kept.contains(winner), s"winner $winner dropped")
      ms.filterNot(_ == winner).foreach(m =>
        assert(!kept.contains(m), s"loser $m kept"))
    }
  }

  test("split_domain_disjoint: each source lands in exactly one split") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val nSources = docs.select(col("source")).distinct().count()
    val nDocs = docs.count()
    val out = Ext.splitDomainDisjoint(spark, sf001).collect()
    assert(out.map(_.getLong(1)).sum == nSources,
      "per-split source counts must sum to the distinct-source total " +
        "(a source in two splits would double-count)")
    assert(out.map(_.getLong(2)).sum == nDocs)
    // independent disjointness check: split label per source is single
    val perSource = docs
      .withColumn("split", graft.ext.Text.splitLabel(col("source")))
      .groupBy(col("source"))
      .agg(countDistinct(col("split")).as("k")).collect()
    perSource.foreach(r => assert(r.getLong(1) == 1L,
      s"source ${r.getString(0)} spans ${r.getLong(1)} splits"))
  }

  test("text_dedup_spans_apply: untouched docs keep their exact text, and removal agrees with the span-share audit") {
    val out = Ext.textDedupSpansApply(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    out.values.foreach { case (n, rem, _) =>
      assert(rem >= 0 && rem <= n, s"removed $rem of $n")
    }
    // n_removed = 0 ⇔ clean_md5 is the md5 of the full token join
    val full = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        md5(concat_ws(" ", graft.ext.Text.tokens(col("text")))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, (_, rem, m)) =>
      if (rem == 0) assert(m == full(id), s"doc $id: untouched but md5 moved")
      else assert(m != full(id), s"doc $id: $rem tokens removed but md5 kept")
    }
    // cross-op pin: a doc has removed tokens iff the span-share audit
    // counts a duplicated position for it (both build on the same
    // positional 3-gram counts)
    val share = Ext.textDupSpanShare(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    share.foreach { case (id, dupPos) =>
      assert((dupPos > 0) == (out(id)._2 > 0),
        s"doc $id: dup positions $dupPos vs removed ${out(id)._2}")
    }
  }

  test("mix_importance equals an independent Scala recompute and ranks the target language up") {
    val out = Ext.mixImportance(spark, sf0001).collect()
    assert(out.length == 100)
    // independent recompute: md5-bucket unigrams, integer ratios, per-doc sums
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16) % 4096
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).map(bucket)))
    val cr = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    val ct = new scala.collection.mutable.HashMap[Long, Long]().withDefaultValue(0L)
    docs.foreach { case (_, lang, bs) => bs.foreach { b =>
      cr(b) += 1; if (lang == "en") ct(b) += 1 } }
    val scores = docs.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      val s = bs.map(b => ((ct(b) + 1) * 1000000L) / (cr(b) + 1)).sum
      (id, s, s / bs.length)
    }.sortBy { case (id, _, per) => (-per, id) }.take(100)
      .map { case (id, s, per) => id -> ((s, per)) }.toMap
    out.foreach { r =>
      val (id, impSum, perTok) = (r.getLong(0), r.getLong(4), r.getLong(5))
      val (es, ep) = scores(id)
      assert(impSum == es && perTok == ep, s"doc $id: $impSum/$perTok vs $es/$ep")
    }
    // semantic sanity: the en target slice dominates the importance head
    val enShare = out.count(_.getString(2) == "en")
    assert(enShare > 50, s"only $enShare/100 top docs are lang=en")
  }

  test("events_rfm: segments partition the purchaser set and conserve cents") {
    val out = Warehouse.eventsRfm(spark, sf001).collect()
    out.foreach { r =>
      (1 to 3).foreach(i => assert(r.getLong(i - 1) >= 1 && r.getLong(i - 1) <= 5))
    }
    val p = graft.core.Tables.eventsTsUs(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(countDistinct(col("user_id")),
        sum(floor(col("value") * 100).cast("long"))).head()
    assert(out.map(_.getLong(3)).sum == p.getLong(0),
      "segment user counts must partition the purchaser set")
    assert(out.map(_.getLong(4)).sum == p.getLong(1),
      "segment cents must sum to total purchase cents")
  }

  test("profile_expectations: counts match independent recomputation") {
    val out = Warehouse.profileExpectations(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.size == 6)
    out.values.foreach { case (_, v, pass) => assert(pass == (v == 0)) }
    val l = spark.read.parquet(s"$sf001/lineitem.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val badQty = l.filter(col("l_quantity") < 1 || col("l_quantity") > 45).count()
    assert(out("range:l_quantity[1,45]") == ((l.count(), badQty, badQty == 0)))
    assert(badQty > 0, "the audit must be exercised, not vacuous")
    val dups = o.count() - o.select(col("o_orderkey")).distinct().count()
    assert(out("unique:o_orderkey")._2 == dups)
    val orphans = l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti").count()
    assert(out("ref:l_orderkey->o_orderkey")._2 == orphans)
  }

  test("sim_kmeans_step equals a brute-force Scala Lloyd iteration") {
    val out = Ext.simKmeansStep(spark, sf0001).collect()
    assert(out.length == 8 * 64, s"expected 8 clusters x 64 dims, got ${out.length}")
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100).toLong).toArray)
      .sortBy(_._1)
    val seeds = vecs.filter(_._1 < 8)
    val assign = vecs.map { case (_, q) =>
      seeds.map { case (cid, c) =>
        (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
    }
    val expect = vecs.map(_._2).zip(assign).flatMap { case (q, cid) =>
      q.zipWithIndex.map { case (v, d) => (cid, d.toLong) -> v }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.length.toLong, vs.map(_._2).sum))
    }
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val (n, ssum) = expect(k)
      assert(r.getLong(2) == n && r.getLong(3) == ssum,
        s"cluster-dim $k: got (${r.getLong(2)}, ${r.getLong(3)}), want ($n, $ssum)")
      assert(r.getLong(4) == ssum / n)
    }
  }

  test("text_bpe_merge equals a brute-force pair count") {
    val out = Ext.textBpeMerge(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val counts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(out.toSeq == expect)
  }

  test("text_novelty: earliest doc is all-novel, and novelty matches brute force") {
    val out = Ext.textNovelty(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.length >= 3)
    val tri = docs.flatMap { case (id, ts) =>
      ts.sliding(3).map(s => (s.mkString(" "), id))
    }
    val firstDoc = tri.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    docs.foreach { case (id, ts) =>
      val pos = ts.sliding(3).map(_.mkString(" ")).toSeq
      val novel = pos.count(s => firstDoc(s) == id).toLong
      assert(out(id) == ((pos.length.toLong, novel)), s"doc $id")
    }
    val firstId = docs.map(_._1).min
    assert(out(firstId)._1 == out(firstId)._2, "earliest doc must be all-novel")
  }

  test("merge_delete_cascade: the erasure reaches every dependent row and only those") {
    val out = Warehouse.mergeDeleteCascade(spark, sf001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out.foreach { case (t, (b, d, a)) =>
      assert(b == d + a, s"$t: $b != $d + $a")
    }
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val l = spark.read.parquet(s"$sf001/lineitem.parquet")
    val forget = c.filter(col("c_custkey") % 97 === 0)
    assert(out("customer")._2 == forget.count())
    val delO = o.join(forget, o("o_custkey") === forget("c_custkey"), "left_semi")
    assert(out("orders")._2 == delO.count())
    val delL = l.join(delO.select(col("o_orderkey")),
      l("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(out("lineitem")._2 == delL.count())
    assert(out("lineitem")._2 > 0, "the cascade must actually erase something")
  }

  test("mix_allocation_lrm: quotas sum to the budget exactly and bumps go to the largest remainders") {
    val out = Ext.mixAllocationLrm(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._5).sum == 1000L, "Hamilton must conserve the budget")
    out.foreach { case (src, _, fq, _, q) =>
      assert(q == fq || q == fq + 1, s"$src: quota $q vs floor $fq")
    }
    // the +1 set must be exactly the rem_rank prefix
    val bumped = out.filter(r => r._5 == r._3 + 1).map(_._4).sorted
    assert(bumped.sameElements(1L to bumped.length),
      s"bumps not a remainder-rank prefix: ${bumped.mkString(",")}")
    // independent proportionality check: floor_q = (1000*ntok) div total
    val total = out.map(_._2).sum
    out.foreach { case (src, ntok, fq, _, _) =>
      assert(fq == 1000L * ntok / total, s"$src floor")
    }
  }

  test("text_cooccurrence equals a brute-force skip-gram count") {
    val out = Ext.textCooccurrence(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2),
        r.getLong(3), r.getLong(4))))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val uni = docs.flatten.groupBy(identity).map { case (w, xs) =>
      w -> xs.length.toLong }
    val pc = new scala.collection.mutable.HashMap[(String, String), Long]()
      .withDefaultValue(0L)
    docs.foreach { ts =>
      for (i <- ts.indices; j <- (i + 1) to math.min(i + 2, ts.length - 1)) {
        val k = if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
        pc(k) += 1
      }
    }
    val expect = pc.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(20)
      .map { case (k, c) => (k, (c, uni(k._1), uni(k._2))) }
    assert(out.toSeq == expect)
  }

  test("events_anomaly_days: trailing sums and flags match a brute-force recompute over the dense day spine") {
    val out = Warehouse.eventsAnomalyDays(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // the spine makes zero-DAU days first-class: default 0 over the range
    val observed = graft.core.Tables.eventsTsUs(spark, sf001)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (lo, hi) = (observed.keys.min, observed.keys.max)
    def dau(d: Long): Long = observed.getOrElse(d, 0L)
    assert(out.keySet == (lo + 7 to hi).toSet,
      "every spine day with full history must be reported, exactly once")
    out.foreach { case (d, (got, t7, flag)) =>
      assert(got == dau(d))
      val t7w = (d - 7L until d).map(dau).sum
      assert(t7 == t7w, s"day $d trailing sum")
      assert(flag == (100L * math.abs(7L * got - t7) >= 50L * t7))
    }
    (lo until lo + 7L).foreach(d =>
      assert(!out.contains(d), s"day $d lacks history but was reported"))
  }

  test("sql_correlated_exists: the SQL text de-correlates (no cartesian) and partitions the orders") {
    val df = Rel.sqlCorrelatedExists(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"correlated subquery failed to de-correlate:\n$p")
    val out = df.collect()
    val nOrders = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(out.map(_.getLong(3)).sum == nOrders,
      "bands must partition the orders")
    assert(out.map(_.getString(1)).distinct.sorted.sameElements(
      Seq("deep", "shallow")), "both bands must be populated")
    assert(out.map(_.getBoolean(2)).distinct.length == 2,
      "the NOT EXISTS band must split both ways")
  }

  test("sample_coreset picks the true medoid of every cluster") {
    val out = Ext.sampleCoreset(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 8)
    // brute-force: same quantization, assignment, truncated centroid
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100).toLong).toArray)
      .sortBy(_._1)
    val seeds = vecs.filter(_._1 < 8)
    val byCluster = vecs.groupBy { case (_, q) =>
      seeds.map { case (cid, c) =>
        (q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
    }
    byCluster.foreach { case (cid, members) =>
      val dims = members.head._2.length
      val mc = (0 until dims).map { d =>
        members.map(_._2(d)).sum / members.length
      }
      val (bestId, bestDist) = members.map { case (id, q) =>
        (id, q.zip(mc).map { case (v, m) => (v - m) * (v - m) }.sum)
      }.minBy { case (id, dd) => (dd, id) }
      assert(out(cid) == ((bestId, bestDist)),
        s"cluster $cid: got ${out(cid)}, want ($bestId, $bestDist)")
    }
  }

  test("profile_contingency: marginals reconcile and ppm fields match a recompute") {
    val out = Warehouse.profileContingency(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(out.map(_._3).sum == n, "cell counts must sum to the corpus")
    out.groupBy(_._2).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._4, "lang marginal")
    }
    out.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.map(_._3).sum == cells.head._5, "source marginal")
    }
    out.foreach { case (src, lang, o, rt, ct, e, lift) =>
      assert(e == rt * ct * 1000000L / n, s"$src/$lang e_ppm")
      assert(lift == o * n * 1000000L / (rt * ct), s"$src/$lang lift_ppm")
    }
    // the audit must see real skew somewhere (synthetic corpus is not uniform)
    assert(out.exists(c => c._7 > 1100000L || c._7 < 900000L),
      "no cell deviates >10% from independence — audit is vacuous here")
  }

  test("events_lifecycle: the growth-accounting identities reconcile") {
    val out = Warehouse.eventsLifecycle(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    out.foreach { case (d, (dau, nw, rt, rs, _)) =>
      assert(dau == nw + rt + rs, s"day $d: dau decomposition")
    }
    // churned(d) = dau(d-1) - retained(d) on consecutive reported days
    out.keys.filter(d => out.contains(d - 1)).foreach { d =>
      val (_, _, rt, _, _) = out(d)
      assert(out(d - 1)._1 - rt == out(d)._5, s"day $d churn identity")
    }
    // every user is new exactly once
    val users = graft.core.Tables.eventsTsUs(spark, sf001)
      .select(col("user_id")).distinct().count()
    assert(out.values.map(_._2).sum == users)
  }

  test("events_time_to_convert equals a brute-force selection") {
    val r = Warehouse.eventsTimeToConvert(spark, sf0001).head()
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_us")).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val v1 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val lat = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, ts) =>
        v1.get(u).filter(ts > _).map(v => (u, ts - v))
      }
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).min) }
      .toSeq.sortBy { case (u, l) => (l, u) }.map(_._2)
    val n = lat.length
    def sel(num: Int, den: Int) =
      lat((n * num + den - 1) / den - 1) // value at rank ceil(p*n)
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == sel(1, 2), s"p50: ${r.getLong(1)} vs ${sel(1, 2)}")
    assert(r.getLong(2) == sel(9, 10), s"p90: ${r.getLong(2)} vs ${sel(9, 10)}")
  }

  test("join_asof_nearest equals a brute-force nearest-neighbor scan") {
    val W = 600000000L
    val out = Ext.joinAsofNearest(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val errsByUser = ev.filter(_._2 == "error").groupBy(_._1)
    ev.filter(_._2 == "click").foreach { case (u, _, cts, cid) =>
      val cand = errsByUser.getOrElse(u, Array.empty)
        .map { case (_, _, ets, eid) => (math.abs(ets - cts), ets, eid) }
        .filter(_._1 <= W)
      val want = if (cand.isEmpty) (-1L, -1L)
        else { val m = cand.min; (m._1, m._3) }
      assert(out(cid) == want, s"click $cid: ${out(cid)} vs $want")
    }
  }

  test("win_session_bounce: session population matches win_sessionize, ratios bounded") {
    val out = Ext.winSessionBounce(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.foreach { case (d, ns, nb, ppm) =>
      assert(nb <= ns, s"day $d: more bounces than sessions")
      assert(ppm == nb * 1000000L / ns, s"day $d ppm")
    }
    // cross-op: same gap rule => same total session count as win_sessionize
    val sessions = Rel.winSessionize(spark, sf001).count()
    assert(out.map(_._2).sum == sessions,
      "bounce rollup lost or invented sessions vs win_sessionize")
  }

  test("events_cohort_ltv: revenue conserved, cumulative curve monotone") {
    val out = Warehouse.eventsCohortLtv(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalCents = graft.core.Tables.eventsTsUs(spark, sf001)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).head().getLong(0)
    assert(out.map(_._4).sum == totalCents,
      "cohort cells must conserve total purchase revenue")
    out.groupBy(_._1).foreach { case (cd, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._5 == a._5 + b._4, s"cohort $cd: cumsum broken at ${b._2}")
        case _ =>
      }
      assert(sorted.head._5 == sorted.head._4)
      sorted.foreach { case (_, off, _, _, _) => assert(off >= 0) }
    }
  }

  test("graph_bfs_levels equals a brute-force BFS") {
    val out = Warehouse.graphBfsLevels(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] = li.toSeq.groupBy(_._1).values.toSeq
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }
      .distinct.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val seeds = adj.keys.toSeq.sorted.take(5)
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = h.toLong)
    }
    assert(out == dist.toMap, s"BFS mismatch: ${out.size} vs ${dist.size} nodes")
  }

  test("events_seq_support equals a brute-force sequence scan") {
    val out = Warehouse.eventsSeqSupport(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = ev.map(_._2).distinct.sorted
    val byUser = ev.groupBy(_._1)
    val expect = (for (a <- types; b <- types) yield {
      val sup = byUser.values.count { es =>
        val as = es.filter(_._2 == a).map(_._3)
        val bs = es.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      }.toLong
      (a, b) -> sup
    }).filter(_._2 > 0).toMap
    assert(out == expect)
  }

  test("win_interval_union equals a brute-force interval merge") {
    val pad = 900000000L
    val out = Warehouse.winIntervalUnion(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    ev.groupBy(_._1).foreach { case (u, es) =>
      val iv = es.map(_._2).sorted.map(t => (t - pad, t + pad))
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (st, en)) => acc match {
          case (a, b) :: rest if st <= b => (a, math.max(b, en)) :: rest
          case _ => (st, en) :: acc
        }
      }
      val want = (merged.length.toLong, merged.map(i => i._2 - i._1).sum)
      assert(out(u) == want, s"user $u: ${out(u)} vs $want")
    }
  }

  test("events_concurrency_peak equals a brute-force sweep") {
    val pad = 900000000L
    val r = Warehouse.eventsConcurrencyPeak(spark, sf0001).head()
    val ts = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("ts_us"), col("event_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val bounds = ts.flatMap { case (t, id) =>
      Seq((t - pad, 1L, id), (t + pad, -1L, id))
    }.sortBy { case (t, d, id) => (t, d, id) }
    var c = 0L; var peak = 0L; var at = Long.MinValue
    bounds.foreach { case (t, d, _) =>
      c += d
      if (c > peak) { peak = c; at = t }
    }
    assert(r.getLong(0) == ts.length.toLong)
    assert(r.getLong(1) == peak, s"peak ${r.getLong(1)} vs $peak")
    assert(r.getLong(2) == at, s"at ${r.getLong(2)} vs $at")
  }

  test("events_funnel_windowed: partitions the users and never converts deeper than the unbounded funnel") {
    val out = Warehouse.eventsFunnelWindowed(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unbounded = Warehouse.eventsFunnel(spark, sf001).collect()
      .groupBy(_.getLong(4)).view.mapValues(_.length.toLong).toMap
    assert(out.values.sum == unbounded.values.sum,
      "windowed funnel must partition the same user set")
    // windowing can only shrink the set reaching depth >= k
    (1L to 3L).foreach { k =>
      val w = out.filter(_._1 >= k).values.sum
      val u = unbounded.filter(_._1 >= k).values.sum
      assert(w <= u, s"depth>=$k: windowed $w > unbounded $u")
    }
  }

  test("win_mau_stickiness: mau is the exact 28-day distinct and bounds hold") {
    val out = Warehouse.winMauStickiness(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val ud = graft.core.Tables.eventsTsUs(spark, sf001)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (d, dau, mau, ppm) =>
      assert(dau <= mau && ppm <= 1000000L)
      val exact = ud.filter { case (_, dd) => dd >= d - 27 && dd <= d }
        .map(_._1).distinct.length.toLong
      assert(mau == exact, s"day $d: mau $mau vs exact $exact")
      assert(ppm == dau * 1000000L / mau)
    }
  }

  test("dedup_cross_source: matrix is triangular and conserves the pair population") {
    val out = Ext.dedupCrossSource(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    out.foreach { case (a, b, _, within) =>
      assert(a <= b, "matrix must be triangular")
      assert(within == (a == b))
    }
    val totalPairs = Ext.jaccardPairs08(spark, sf001).count()
    assert(out.map(_._3).sum == totalPairs,
      "matrix cells must conserve the pair population")
  }

  test("scd2_asof: per-state user counts sum to the users alive at T") {
    val out = Warehouse.scd2Asof(spark, sf0001).collect()
    val total = out.map(_.getLong(1)).sum
    // every user with any event before-or-at T is in exactly one state
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
    val r = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val tAt = (r.getLong(0) + r.getLong(1)) / 2
    val alive = ev.filter(col("ts_us") <= tAt)
      .select(col("user_id")).distinct().count()
    assert(total == alive, s"state rows sum $total, users alive at T $alive")
  }
}
