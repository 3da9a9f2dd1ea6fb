package graft.queries

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value gates and structural invariants of the round-9 operator family —
  * properties the DuckDB hash gate cannot see (or, for the iterative BPE
  * trainer, the value gate itself, since an argmax-dependent fixpoint is
  * not SQL-expressible).
  */
class Round9OpsSpec extends SparkSpec {
  import sqlImplicits._

  // Reference BPE trainer + unit rebuild live in the shared test-scope
  // [[BpeRef]] object since r11 (the oracle-capture tool reuses them —
  // one twin implementation, no drift).
  private def cmpUtf8Outer(a: String, b: String): Int = BpeRef.cmpUtf8(a, b)
  private def refBpe(words: Seq[(String, Long)], target: Int,
      batchK: Int, candPool: Int): Seq[(Int, String, String, Long)] =
    BpeRef.refBpe(words, target, batchK, candPool)

  test("trajectory pair-prune lower bound never exceeds the true distance") {
    import graft.ops.TrajectoryDistance
    // deterministic pseudo-random sweep over realistic AND adversarial
    // coordinate ranges (prune soundness = the bound is NEVER above the
    // true distance; one violation would flip a DBSCAN edge)
    val rnd = new scala.util.Random(7)
    def coord(span: Double, base: Double) = base + rnd.nextDouble() * span
    for (trial <- 0 until 20000) {
      val (baseLng, baseLat, span) =
        if (trial % 3 == 0) (114.0, 22.5, 0.2) // the fleet's real window
        else if (trial % 3 == 1) (-179.0, -80.0, 3.0) // high-lat wide
        else (0.0, 0.0, 90.0) // adversarially wide
      val v = Array.fill(8)(0.0)
      for (k <- 0 until 8)
        v(k) = if (k % 2 == 0) coord(span, baseLng) else coord(span, baseLat)
      val tr1 = IndexedSeq(TrajectoryDistance.P(v(0), v(1)), TrajectoryDistance.P(v(2), v(3)))
      val tr2 = IndexedSeq(TrajectoryDistance.P(v(4), v(5)), TrajectoryDistance.P(v(6), v(7)))
      val d = TrajectoryDistance.totalWithLengths(tr1, tr2,
        TrajectoryDistance.lengthKm(tr1), TrajectoryDistance.lengthKm(tr2))
      val lb = TrajectoryDistance.lowerBoundKm(
        v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7))
      assert(lb <= d + 1e-9,
        s"UNSOUND prune bound: lb=$lb > d=$d for ${v.toSeq}")
    }
    // non-finite coordinates must never prune (their true distance is
    // NaN and belongs to the downstream clamp rule)
    assert(!(TrajectoryDistance.lowerBoundKm(Double.NaN, 0, 0, 0, 1, 1, 2, 2) > 0.0))
    assert(!(TrajectoryDistance.lowerBoundKm(
      Double.PositiveInfinity, 0, 0, 0, 1, 1, 2, 2) > 0.0))
  }

  test("text_bpe_train matches the brute-force reference trainer on real data") {
    // independently rebuild the engine's training units: per-doc
    // whitespace tokens, grouped into BpeChunkTokens-token chunks
    // joined by the ▁ boundary marker, type-counted, capped by
    // (cnt desc, unit) in UTF-8 binary order (Spark's string order)
    val units = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq
      .flatMap(t => t.split(" ").filter(_.nonEmpty)
        .grouped(Ext.BpeChunkTokens).map(_.mkString("▁")))
      .groupBy(identity).map { case (u, g) => (u, g.size.toLong) }.toSeq
      .sortBy { case (u, n) => (-n, u) }(
        Ordering.Tuple2(Ordering.Long,
          (a: String, b: String) => cmpUtf8Outer(a, b)))
      .take(Ext.BpeSampleCap)
    assert(units.nonEmpty)
    val expected = refBpe(units,
      Ext.BpeTargetMerges, Ext.BpeBatchK, Ext.BpeCandPool)
    assert(expected.length == Ext.BpeTargetMerges,
      s"corpus saturated at ${expected.length} merges — unit shape regressed")
    val got = Ext.textBpeTrain(spark, sf0001)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == expected, s"merge tables diverge:\nengine=${got.take(30)}…" +
      s"\nref=${expected.take(30)}… (first diff at " +
      s"${got.zip(expected).indexWhere(p => p._1 != p._2)})")
  }

  test("text_bpe_train: greedy merge semantics on a crafted corpus (overlap + adjacency)") {
    // two ≤4-token docs → one ▁-joined unit each: "ab▁ab" and "ab▁aa".
    // Hand-computed ladder pinning the disjointness gate, greedy
    // leftmost application, the UTF-8 tie order ('▁' sorts after ASCII),
    // and boundary-crossing merges (the SentencePiece move):
    //   round 1: pairs (a,b)3 (b,▁)2 (▁,a)2 (a,a)1 — only (a,b)
    //            elected, every other pair shares a or b
    //   round 2: (ab,▁)2 elected; (a,a)1 is symbol-disjoint → ALSO
    //            elected this round ((▁,a)/(▁,ab) share ▁/ab);
    //            "ab▁aa"'s tail [a,a] merges greedily leftmost
    //   round 3: ties at n=1: (ab▁,aa) < (ab▁,ab) by p2 — (ab▁,aa)
    //            elected, (ab▁,ab) shares ab▁ and waits
    //   round 4: (ab▁,ab)1 — both units now single symbols
    //   round 5: no pairs left, loop stops early
    val dir = java.nio.file.Files.createTempDirectory("bpe9").toString
    Seq((1L, "ab ab"), (2L, "ab aa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Ext.textBpeTrain(spark, dir)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 3L), (2, "ab", "▁", 2L),
      (3, "a", "a", 1L), (4, "ab▁", "aa", 1L),
      (5, "ab▁", "ab", 1L)), s"got $got")
  }

  test("text_bpe_apply matches an independent greedy merge walker") {
    // independent semantics: symbol VECTOR walk (single left-to-right
    // non-overlapping pass per merge, in ladder order) — no string
    // replace, so a false boundary match in the wrap encoding would
    // diverge here
    def applyMerges(word: String): Seq[String] = {
      var syms = word.map(_.toString).toVector
      for ((a, b) <- Ext.bpeMerges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
      .map { case (id, text) =>
        val words = text.split("\\s+").toSeq.filter(_.nonEmpty)
        val subw = words.map(w => applyMerges(w).mkString(" "))
        (id, words.size.toLong, subw.map(_.split(" ").length.toLong).sum,
          md5hex(subw.mkString(" / ")))
      }.toSeq
    val got = Ext.textBpeApply(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // non-degenerate: the ladder actually merged (fewer subwords than
    // characters), and multi-level rules fired ("scan"/"the" encode
    // to ONE token each)
    val totalChars = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).as[String].collect()
      .map(_.count(!_.isWhitespace).toLong).sum
    assert(expected.map(_._3).sum < totalChars, "no merge ever fired")
    assert(applyMerges("scan") == Seq("scan") &&
      applyMerges("the") == Seq("the") &&
      applyMerges("order") == Seq("order"), "multi-level ladder broken")
  }

  test("events_pattern_regex: crafted ladders pin the leftmost-non-overlapping run count") {
    // user 1: v c p v p      → runs "vcp","vp" = 2; no 'ep'
    // user 2: v c v p        → start 0 fails (v blocks [cs]*), "vp" = 1
    // user 3: e p v s p      → 'ep' flag set, one run "vsp"
    // user 4: p v c s        → no completed run, no flag
    val rows = Seq(
      (1L, "view"), (1L, "click"), (1L, "purchase"), (1L, "view"), (1L, "purchase"),
      (2L, "view"), (2L, "click"), (2L, "view"), (2L, "purchase"),
      (3L, "error"), (3L, "purchase"), (3L, "view"), (3L, "signup"), (3L, "purchase"),
      (4L, "purchase"), (4L, "view"), (4L, "click"), (4L, "signup"))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong + 1, new Timestamp((1700000000000L + i * 60000L)),
          u, t, 0.0, "{}")
      }
    val dir = java.nio.file.Files.createTempDirectory("pregex9").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Warehouse.eventsPatternRegex(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L, false), (2L, 4L, 1L, false),
      (3L, 5L, 1L, true), (4L, 4L, 0L, false)), s"got $got")
  }

  test("src_gzip_roundtrip actually writes gzip members (codec engaged, not silently plain)") {
    Ext.all("src_gzip_roundtrip")(spark, sf0001).collect(): Unit
    val out = new java.io.File(
      graft.core.Tmp.jvmScopedDir("gzip_roundtrip", sf0001))
    val parts = out.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty, "no part files written")
    assert(parts.forall(_.getName.endsWith(".csv.gz")),
      s"uncompressed parts: ${parts.map(_.getName).toSeq}")
    // gzip magic bytes in the first member
    val in = new java.io.FileInputStream(parts.head)
    val magic = Array.fill(2)(in.read()); in.close()
    assert(magic.toSeq == Seq(0x1f, 0x8b), s"not gzip: $magic")
  }

  test("events_attribution_shapley matches a brute-force Shapley and obeys efficiency") {
    val ev = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[(Long, String, Long)].collect()
    val chans = Seq("click", "error", "signup", "view")
    val byUser = ev.groupBy(_._1)
    val users = byUser.toSeq.flatMap { case (_, rows) =>
      val purch = rows.filter(_._2 == "purchase")
      val convTs = if (purch.isEmpty) Long.MaxValue else purch.map(_._3).min
      val conv = if (purch.length >= 14) 1 else 0
      val pre = rows.filter(_._3 < convTs)
      if (pre.isEmpty) None
      else {
        val mask = pre.map(r => chans.indexOf(r._2))
          .filter(_ >= 0).map(1 << _).fold(0)(_ | _)
        Some((mask, conv))
      }
    }
    val v = (0 until 16).map { m =>
      val g = users.filter(_._1 == m)
      m -> (if (g.isEmpty) 0.0 else g.map(_._2).sum.toDouble / g.size)
    }.toMap
    def fact(n: Int): Int = (1 to n).product
    val expected = chans.zipWithIndex.map { case (c, i) =>
      val phi = (0 until 16).filter(m => (m & (1 << i)) == 0)
        .sortBy(identity)
        .map { m =>
          val k = Integer.bitCount(m)
          fact(k).toDouble * fact(3 - k) / 24.0 * (v(m | (1 << i)) - v(m))
        }
        .foldLeft(0.0)(_ + _)
      (c, phi)
    }
    val got = Warehouse.eventsAttributionShapley(spark, sf0001)
      .as[(String, Double)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // efficiency: Σ φ = v(full coalition) − v(∅), within float fold slack
    assert(math.abs(got.map(_._2).sum - (v(15) - v(0))) < 1e-12,
      s"efficiency identity broken: ${got.map(_._2).sum} vs ${v(15) - v(0)}")
  }

  test("sim_mmr_rerank matches a brute-force greedy over exact integer scores") {
    def quant(v: Seq[Float]): Array[Long] = {
      val m = v.map(x => math.abs(x.toDouble)).max
      v.map(x => math.floor(x.toDouble * 127.0 / m).toLong).toArray
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> quant(v) }
      .sortBy(_._1)
    val byId = vecs.toMap
    val qids = vecs.map(_._1).filter(_ % 50 == 0).sorted.take(200)
    val expected = qids.flatMap { qid =>
      val rel = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(byId(qid), v)) }
        .sortBy { case (id, r) => (-r, id) }.take(20)
      val relMap = rel.toMap
      var picks = Vector(rel.head._1)
      while (picks.size < 10) {
        val best = rel.map(_._1).filterNot(picks.contains)
          .map { c =>
            val msim = picks.map(s => dot(byId(c), byId(s))).max
            (c, 2 * relMap(c) - msim)
          }
          .minBy { case (c, sc) => (-sc, c) }._1
        picks = picks :+ best
      }
      picks.zipWithIndex.map { case (v, i) => (qid, v, i.toLong + 1) }
    }.toSeq
    val got = Ext.simMmrRerank(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("sim_hybrid_rrf: every fused row carries at least one leg; both legs contribute somewhere") {
    val rows = Ext.simHybridRrf(spark, sf0001)
      .select(col("rank_v"), col("rank_t"))
      .as[(Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1.nonEmpty || r._2.nonEmpty),
      "a fused row with NO source rank")
    assert(rows.exists(_._1.nonEmpty) && rows.exists(_._2.nonEmpty),
      "one leg never contributed — fusion degenerate")
  }

  test("geo_geofence_count matches a brute-force ray cast") {
    val dxs = Array(3, 1, 0, -1, -3, -1, 0, 1)
    val dys = Array(0, 1, 3, 1, 0, -1, -3, -1)
    val pts = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"), col("user_id")).as[(Long, Long)]
      .collect()
      .map { case (eid, uid) =>
        (eid, uid, 114.0 + (uid * 7919 % 9973) * 0.00001,
          22.0 + (eid % 9973) * 0.00001)
      }
    val expected = (0 until 6).map { f =>
      val cx = 114.0 + (f.toLong * 37 % 100) * 0.001 + 0.003
      val cy = 22.0 + f * 0.015 + 0.005
      val inside = pts.filter { case (_, _, px, py) =>
        val crossings = (0 until 8).count { i =>
          val (x1, y1) = (cx + dxs(i) * 0.004, cy + dys(i) * 0.004)
          val (x2, y2) =
            (cx + dxs((i + 1) % 8) * 0.004, cy + dys((i + 1) % 8) * 0.004)
          ((y1 > py) != (y2 > py)) &&
            px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        }
        crossings % 2 == 1
      }
      (f.toLong, inside.length.toLong,
        inside.map(_._2).distinct.length.toLong)
    }.filter(_._2 > 0)
    val got = Ext.geoGeofenceCount(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(expected.map(_._2).sum > 0, "degenerate fixture: no point in any fence")
  }

  test("geo_geofence_dwell matches a brute-force per-user sweep") {
    val dxs = Array(3, 1, 0, -1, -3, -1, 0, 1)
    val dys = Array(0, 1, 3, 1, 0, -1, -3, -1)
    def inside(f: Int, px: Double, py: Double): Boolean = {
      val cx = 114.0 + (f.toLong * 37 % 100) * 0.001 + 0.003
      val cy = 22.0 + f * 0.015 + 0.005
      (0 until 8).count { i =>
        val (x1, y1) = (cx + dxs(i) * 0.004, cy + dys(i) * 0.004)
        val (x2, y2) =
          (cx + dxs((i + 1) % 8) * 0.004, cy + dys((i + 1) % 8) * 0.004)
        ((y1 > py) != (y2 > py)) &&
          px < x1 + (py - y1) * (x2 - x1) / (y2 - y1)
      } % 2 == 1
    }
    val pings = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .as[(Long, Long, Long)].collect()
      .map { case (eid, uid, ts) =>
        (uid, ts, eid, 114.0 + (uid * 7919 % 9973) * 0.00001,
          22.0 + (eid % 9973) * 0.00001)
      }
      .sortBy { case (uid, ts, eid, _, _) => (uid, ts, eid) }
    val expected = (0 until 6).map { f =>
      var dwell = 0L
      val dwellers = mutable.Set.empty[Long]
      pings.iterator.sliding(2).withPartial(false).foreach {
        case Seq((u1, t1, e1, px1, py1), (u2, t2, e2, px2, py2)) =>
          if (u1 == u2 && inside(f, px1, py1) && inside(f, px2, py2)) {
            dwell += t2 - t1
            dwellers += u2
          }
        case _ =>
      }
      (f.toLong, dwell, dwellers.size.toLong)
    }
    val got = Ext.geoGeofenceDwell(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    assert(expected.map(_._2).sum > 0, "degenerate fixture: zero dwell everywhere")
  }
}
