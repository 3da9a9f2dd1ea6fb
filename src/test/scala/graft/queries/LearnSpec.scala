package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Independent plain-Scala twins for the [[Learn]] family at sf0.001 —
  * the oracle gate proves Spark == DuckDB; these prove both equal the
  * DEFINITION computed a third way (naive collections code, BigInt
  * where the engines use DECIMAL(38,0)/HUGEINT). */
class LearnSpec extends SparkSpec {

  private def rowsOf(name: String): Seq[org.apache.spark.sql.Row] =
    graft.SparkEntry.queries(name)(spark, sf0001).collect().toSeq

  test("ml_auc_exact equals the O(n^2) pairwise AUC") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2) % 10 < 3))
    val got = rowsOf("ml_auc_exact")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      val pos = rows.filter(_._3).map(_._2)
      val neg = rows.filterNot(_._3).map(_._2)
      // 2·(wins + ties/2) as an integer, then one BigInt floor division
      val w2 = BigInt(pos.iterator.map(p =>
        2L * neg.count(p > _) + neg.count(p == _)).sum)
      val expected = (w2 * 1000000) / (2L * pos.size * neg.size)
      val (n, npos, nneg, aucPpm) = got(tpe)
      assert(n == rows.size && npos == pos.size && nneg == neg.size)
      assert(BigInt(aucPpm) == expected, s"type=$tpe got=$aucPpm want=$expected")
    }
  }

  test("ml_stump_split equals the BigInt-rational argmax") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_quantity"), col("l_discount"), col("l_returnflag"))
      .collect().map(r => (math.floor(r.getDouble(0)).toLong,
        math.floor(r.getDouble(1) * 100).toLong, r.getString(2) == "R"))
    def gain(nl: Long, pl: Long, nr: Long, pr: Long): (BigInt, BigInt) =
      (BigInt(pl) * pl * nr + BigInt(pr) * pr * nl, BigInt(nl) * nr) // num/den
    val cands = Seq("qty" -> li.map(x => (x._1, x._3)),
        "disc" -> li.map(x => (x._2, x._3)))
      .flatMap { case (f, rows) =>
        val n = rows.size.toLong
        val post = rows.count(_._2).toLong
        rows.map(_._1).distinct.sorted.flatMap { t =>
          val nl = rows.count(_._1 <= t).toLong
          val pl = rows.count(x => x._1 <= t && x._2).toLong
          if (nl < n) Some((f, t, nl, pl, n - nl, post - pl)) else None
        }
      }
    def beats(x: (String, Long, Long, Long, Long, Long),
        y: (String, Long, Long, Long, Long, Long)): Boolean = {
      val (gx, gy) = (gain(x._3, x._4, x._5, x._6), gain(y._3, y._4, y._5, y._6))
      val c = (gy._1 * gx._2).compare(gx._1 * gy._2)
      c > 0 || (c == 0 && (y._1 < x._1 || (y._1 == x._1 && y._2 < x._2)))
    }
    val expect = Seq("disc", "qty").map { f =>
      val fc = cands.filter(_._1 == f)
      fc.find(c => !fc.exists(o => beats(c, o))).get
    }
    val globalBest = expect.find(c => !cands.exists(o => beats(c, o))).get
    val got = rowsOf("ml_stump_split").map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(got.size == 2)
    got.zip(expect).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4, g._5, g._6) == e, s"got=$g want=$e")
      assert(g._7 == (e == globalBest))
    }
  }

  test("ml_target_encode equals the naive LOO recomputation") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1) == "1-URGENT"))
    val seg = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val oc = orders.map { case (ck, y) => (seg(ck), if (y) 1L else 0L) }
    val cat = oc.groupBy(_._1).map { case (s0, rs) =>
      s0 -> (rs.size.toLong, rs.map(_._2).sum) }
    val (gn, gpos) = (oc.size.toLong, oc.map(_._2).sum)
    val priorPpm = 1000000L * gpos / gn
    val expect = oc.groupBy(identity).toSeq.map { case ((s0, y), rs) =>
      val (nc, pc) = cat(s0)
      (s0, y, rs.size.toLong, nc, pc, priorPpm,
        (1000000L * (pc - y) + 10L * priorPpm) / (nc + 9))
    }.sortBy(t => (t._1, t._2))
    val got = rowsOf("ml_target_encode").map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == expect)
  }

  test("ml_centroid_classify equals the integer nearest-centroid twin") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).collect().toSeq
      .flatMap { r =>
        if (r.isNullAt(2)) None
        else {
          val s = r.getSeq[Any](2)
          if (s.contains(null) || s.size != 64) None
          else Some((r.getLong(0), r.getInt(1),
            s.map(x => math.floor(x.asInstanceOf[Float].toDouble * 16777216).toLong).toArray))
        }
      }
    val (train, test0) = vecs.partition(_._1 % 5 != 0)
    val cents = train.groupBy(_._2).map { case (l, rs) =>
      l -> Array.tabulate(64) { i =>
        val sx = rs.map(_._3(i)).sum
        val cnt = rs.size.toLong
        (sx + cnt * 1073741824L) / cnt - 1073741824L
      }
    }
    val expect = test0.map { case (_, l, v) =>
      val pred = cents.toSeq.map { case (cl, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cl)
      }.min._2
      (l, pred)
    }.groupBy(identity).map { case ((l, p), rs) => (l, p, rs.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = rowsOf("ml_centroid_classify")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(got == expect)
  }

  test("ml_calibration_bins equals the naive recomputation") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_totalprice"), col("o_orderkey"), col("o_orderpriority"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getString(2) == "1-URGENT"))
      .sortBy(x => (x._1, x._2))
    val n = o.size.toLong
    val scored = o.zipWithIndex.map { case ((_, _, y), i) =>
      val ppm = i.toLong * 1000000L / math.max(n - 1, 1)
      (math.min(ppm / 100000, 9), if (y) 1L else 0L, ppm)
    }
    val expect = scored.groupBy(_._1).toSeq.map { case (b, rs) =>
      val (cnt, pos, ssum) = (rs.size.toLong, rs.map(_._2).sum, rs.map(_._3).sum)
      (b, cnt, pos, 1000000L * pos / cnt, ssum / cnt,
        1000000L * pos / cnt - ssum / cnt)
    }.sortBy(_._1)
    val got = rowsOf("ml_calibration_bins").map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got == expect)
  }

  test("ml_pr_curve equals the naive confusion sweep") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_totalprice"), col("o_orderkey"), col("o_orderpriority"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getString(2) == "1-URGENT"))
      .sortBy(x => (x._1, x._2))
    val n = o.size.toLong
    val scored = o.zipWithIndex.map { case ((_, _, y), i) =>
      (i.toLong * 1000000L / math.max(n - 1, 1), y)
    }
    val posAll = scored.count(_._2).toLong
    val expect = (0L to 9L).map { b =>
      val t = b * 100000
      val pred = scored.filter(_._1 / 100000 >= b)
      val tp = pred.count(_._2).toLong
      val fp = pred.size - tp
      (t, tp, fp, posAll - tp, n - pred.size - posAll + tp,
        1000000L * tp / pred.size, 1000000L * tp / math.max(posAll, 1))
    }
    val got = rowsOf("ml_pr_curve").map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == expect)
  }

  test("ml_bootstrap_ci equals the naive replicate recomputation") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        r.getLong(2) % 1048576L))
    val expect = ev.groupBy(_._1).toSeq.map { case (tpe, rows) =>
      val means = (0L to 31L).map { b =>
        val ws = rows.map { case (_, c, hid) =>
          val w = (0 to 2).count(j =>
            (hid * 2654435761L + b * 1000003L + j * 97L) % 1024 < 341).toLong
          (w * c, w)
        }
        (1000L * ws.map(_._1).sum / math.max(ws.map(_._2).sum, 1L), b)
      }.sorted
      (tpe, rows.size.toLong, 1000L * rows.map(_._2).sum / rows.size,
        means(1)._1, means(30)._1)
    }.sortBy(_._1)
    val got = rowsOf("ml_bootstrap_ci").map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got == expect)
    // the 90% interval should bracket the full-sample mean
    got.foreach(t => assert(t._4 <= t._3 && t._3 <= t._5, s"CI misses mean: $t"))
  }

  test("graph_mst == the independent Kruskal twin at two scales") {
    for (dir <- Seq(sf0001, sf001)) {
      val op = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      val edges = op.groupBy(_._1).values.toSeq
        .flatMap { grp =>
          val ps = grp.map(_._2).distinct.sorted
          for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
        }
        .groupBy(identity).toSeq
        .collect { case ((u, v), hits) if hits.size >= 2 =>
          (u, v, hits.size.toLong) }
      val want = MstRef.maxSpanningForest(edges)
      val got = graft.SparkEntry.queries("graph_mst")(spark, dir)
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
      assert(got.forall(_._6), s"$dir: Borůvka did not converge in bound")
      // every tree spans: edges = nodes − 1
      assert(got.forall(t => t._3 == t._2 - 1), s"$dir: non-tree component")
      assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == want,
        s"$dir: engine=${got.size} twin=${want.size} " +
          s"firstDiff=${got.map(t => (t._1, t._2, t._3, t._4, t._5))
            .zip(want).find(p => p._1 != p._2)}")
    }
  }

  test("text_readability equals the Java-regex recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def groups(s0: String, re: String): Long =
      re.r.findAllIn(s0).size.toLong
    val expect = docs.map { case (id, text) =>
      val w = math.max(text.split(" ", -1).count(_.nonEmpty).toLong, 1L)
      val s0 = math.max(groups(text, "[.!?]+"), 1L)
      val syl = groups(text.toLowerCase, "[aeiouy]+")
      val fre = math.max(206835L * s0 * w - 1015L * w * w - 84600L * syl * s0, 0L) /
        (s0 * w)
      val band =
        if (fre >= 90000) "very_easy" else if (fre >= 70000) "easy"
        else if (fre >= 50000) "medium" else if (fre >= 30000) "hard"
        else "very_hard"
      (id, w, s0, syl, fre, band)
    }.sortBy(_._1).toSeq
    val got = rowsOf("text_readability").map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got == expect)
  }
}
