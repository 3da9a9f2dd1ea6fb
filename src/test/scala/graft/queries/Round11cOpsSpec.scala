package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Brute-force twins for the round-11 third-session operators: each test
  * recomputes the operator's contract directly (plain Scala collections,
  * independent of the engine's window/array mechanics) and compares row
  * sets at sf0.001. The DuckDB oracles are the primary gate; these pin
  * the SEMANTICS (the recursion, the order statistics, the ranking)
  * against an implementation that shares no code with the queries.
  */
class Round11cOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("ts_mad_anomaly flags match a direct sliding-window median/MAD") {
    val events = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .as[(String, Long)].collect()
    val daily = events.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((t, d), c) => (t, d, c) }
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.indices.drop(6).map { i =>
        val win = (i - 6 to i).map(k => sorted(k)._3).sorted
        val med = win(3) // n = 7 exact median
        val mad2 = win.map(v => math.abs(2 * v - 2 * med)).sorted.apply(3)
        val dev2 = math.abs(2 * sorted(i)._3 - 2 * med)
        (t, sorted(i)._2, sorted(i)._3, 2 * med, mad2, dev2, dev2 > 3 * mad2)
      }
    }.toSet
    val got = Warehouse.all("ts_mad_anomaly")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == expected)
  }

  test("win_rolling_regression moments match a BigInt per-window recompute") {
    val hourly = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_type"), expr("ts_us div 3600000000").as("h"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      .toSeq.map { case ((t, h), y) => (t, h, y) }
    val expected = hourly.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val h0 = sorted.map(_._2).min
      sorted.indices.drop(23).map { i =>
        val win = (i - 23 to i).map(k => (sorted(k)._2 - h0, sorted(k)._3))
        val n = BigInt(24)
        val sx = win.map(w => BigInt(w._1)).sum
        val sy = win.map(w => BigInt(w._2)).sum
        val sxy = win.map(w => BigInt(w._1) * w._2).sum
        val sx2 = win.map(w => BigInt(w._1) * w._1).sum
        val num = n * sxy - sx * sy
        val den = n * sx2 - sx * sx
        (t, sorted(i)._2, sorted(i)._3, num.toLong, den.toLong,
          num.toDouble / den.toDouble)
      }
    }.toSet
    val got = Warehouse.all("win_rolling_regression")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    // compare the exact integer moments; the slope is one division of them
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      expected.map(r => (r._1, r._2, r._3, r._4, r._5)))
    assert(got == expected)
  }

  test("win_cusum equals the direct max(0, S+d) recursion") {
    val daily = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum)
      .toSeq.map { case ((t, d), c) => (t, d, c) }
    val expected = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val vals = sorted.map(_._3).sorted
      val n = vals.length
      val med2 = vals((n + 1) / 2 - 1) + vals(n / 2)
      val devs = vals.map(v => math.abs(2 * v - med2)).sorted
      val mad4 = devs((n + 1) / 2 - 1) + devs(n / 2)
      var s2 = 0L // the recursion the prefix identity must reproduce
      sorted.map { case (_, d, c) =>
        val d2 = 2 * c - med2
        s2 = math.max(0L, s2 + d2)
        (t, d, c, d2, s2, s2 > 6 * mad4)
      }
    }.toSet
    val got = Warehouse.all("win_cusum")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == expected)
  }

  test("graph_label_prop equals 4 brute-force synchronous LPA rounds") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
    val byOrder = li.toSeq.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val weights = byOrder.values.toSeq.flatMap { parts =>
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    // NB iterator first: Map.collect to pair values would re-key and
    // collapse every (a, *) to one entry
    val pairs = weights.iterator
      .collect { case ((a, b), w) if w >= 2 => (a, b) }.toSeq
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lbl = nbrs.map { case (n, ns) =>
        val votes = ns.groupBy(lbl).view.mapValues(_.size).toSeq
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Warehouse.all("graph_label_prop")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == lbl)
  }

  test("ts_seasonal_naive equals a direct lag-7/lag-1 backtest") {
    val daily = graft.core.Tables.eventsTsUs(spark, sf0001)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((t, d), c) => (t, d, c) }
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val cnt = rows.sortBy(_._2).map(_._3)
      val scored = cnt.indices.drop(7).map { i =>
        (math.abs(cnt(i) - cnt(i - 7)), math.abs(cnt(i) - cnt(i - 1)))
      }
      val (aeS, aeN) = (scored.map(_._1).sum, scored.map(_._2).sum)
      (t, scored.size.toLong, aeS, aeN, aeS < aeN,
        if (aeN > 0) Some(aeS.toDouble / aeN) else None)
    }.toSet
    val got = Warehouse.all("ts_seasonal_naive")(spark, sf0001)
      .as[(String, Long, Long, Long, Boolean, Option[Double])]
      .collect().toSet
    assert(got == expected)
  }

  test("graph_rw_sample equals brute-force deterministic walks") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
    val byOrder = li.toSeq.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val weights = byOrder.values.toSeq.flatMap { parts =>
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    val pairs = weights.iterator
      .collect { case ((a, b), w) if w >= 2 => (a, b) }.toSeq
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val expected = nbrs.keys.toSeq.flatMap { s =>
      var node = s
      (s, 0L, s) +: (1 to 4).map { t =>
        val ns = nbrs(node)
        node = ns(((s * 31 + t * 17 + node) % ns.size).toInt)
        (s, t.toLong, node)
      }
    }.toSet
    val got = Warehouse.all("graph_rw_sample")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("graph_edge_jaccard equals brute-force neighbor-set Jaccard top-2") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
    val byOrder = li.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct).toMap
    val edges = byOrder.values.toSeq.flatMap { parts =>
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val scored = edges.toSeq.map { case (u, v) =>
      val common = (nbrs(u) & nbrs(v)).size.toLong
      val jppm = common * 1000000 / (nbrs(u).size + nbrs(v).size - common)
      (u, v, common, jppm)
    }
    val kept = scored.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (-r._4, -r._3, r._2)).take(2)
    }.map(r => (math.min(r._1, r._2), math.max(r._1, r._2), r._3, r._4)).toSet
    val got = Warehouse.all("graph_edge_jaccard")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == kept)
  }
}
