package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BlindZoneSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (linenumber, cluster, id, patternID, lng, lat, t) — two vehicles, one
  // cluster, plus a noise row. Speed belongs to the hop's origin row.
  private def fixture = Seq(
    // cluster 1, vehicle A: row1 is the fast hop origin (~30 m/s)
    ("L1", 1, "A", "1", 114.000, 22.500, ts("2019-02-01 08:00:00")),
    ("L1", 1, "A", "1", 114.001, 22.500, ts("2019-02-01 08:00:10")),
    ("L1", 1, "A", "1", 114.010, 22.500, ts("2019-02-01 08:00:40")),
    ("L1", 1, "A", "1", 114.011, 22.500, ts("2019-02-01 08:01:40")),
    // cluster 1, vehicle B: fastest hop also > 10 m/s (~20.5 m/s)
    ("L1", 1, "B", "1", 114.000, 22.510, ts("2019-02-01 09:00:00")),
    ("L1", 1, "B", "1", 114.012, 22.510, ts("2019-02-01 09:01:00")),
    ("L1", 1, "B", "1", 114.013, 22.510, ts("2019-02-01 09:02:00")),
    // DBSCAN noise row
    ("L1", -1, "A", "2", 114.5, 22.9, ts("2019-02-01 10:00:00"))
  ).toDF("linenumber", "cluster", "id", "patternID", "lng", "lat", "t")

  test("noise rows dropped; argmax-speed row graded") {
    val out = BlindZone.run(fixture)
    assert(out.filter($"cluster" === -1).count() == 0)
    val a = out.filter($"id" === "A").orderBy($"t")
      .select($"signal").collect().map(r => Option(r.get(0)))
    assert(a(1).nonEmpty, "argmax-speed row (fast hop origin) must be graded")
  }

  test("full upgrade chain: every vehicle fast → 1.0") {
    val out = BlindZone.run(fixture)
    val graded = out.filter($"signal".isNotNull)
      .select($"signal").as[Double].collect().toSet
    assert(graded == Set(1.0), s"got $graded")
  }

  test("one-step propagation: fills exactly the row after a graded row") {
    val out = BlindZone.run(fixture).filter($"id" === "A").orderBy($"t")
      .select($"signal").collect().map(r => Option(r.get(0)))
    // row1 graded (argmax), row2 inherits, row3 does NOT (single lag, not
    // a running fill — reference semantics, BZ-S:153–160)
    assert(out(1).contains(1.0), s"argmax row: ${out.toSeq}")
    assert(out(2).contains(1.0), s"one-step fill: ${out.toSeq}")
    assert(out(3).isEmpty, s"no running fill: ${out.toSeq}")
  }

  test("slow cluster stays at 0.5") {
    val slow = Seq(
      ("L1", 7, "C", "1", 114.000, 22.500, ts("2019-02-01 08:00:00")),
      ("L1", 7, "C", "1", 114.0001, 22.500, ts("2019-02-01 08:01:00")),
      ("L1", 7, "C", "1", 114.0002, 22.500, ts("2019-02-01 08:02:00"))
    ).toDF("linenumber", "cluster", "id", "patternID", "lng", "lat", "t")
    val out = BlindZone.run(slow)
    val graded = out.filter($"signal".isNotNull).select($"signal")
      .as[Double].collect().toSet
    assert(graded == Set(0.5))
  }

  test("coverage filter drops clusters below threshold") {
    // 4 vehicles on L1; cluster 9 covers only 1 of 4 (< floor(0.75*4)=3)
    val rows = Seq(
      ("L1", 8, "V1", "1", 114.0, 22.5, ts("2019-02-01 08:00:00")),
      ("L1", 8, "V2", "1", 114.0, 22.5, ts("2019-02-01 08:00:00")),
      ("L1", 8, "V3", "1", 114.0, 22.5, ts("2019-02-01 08:00:00")),
      ("L1", 8, "V4", "1", 114.0, 22.5, ts("2019-02-01 08:00:00")),
      ("L1", 9, "V1", "2", 114.1, 22.6, ts("2019-02-01 09:00:00"))
    ).toDF("linenumber", "cluster", "id", "patternID", "lng", "lat", "t")
    val out = BlindZone.run(rows)
    assert(out.filter($"cluster" === 9).count() == 0)
    assert(out.filter($"cluster" === 8).count() == 4)
  }

  test("lineScoped=false reproduces the reference's cluster-id collision") {
    // same cluster id 0 on two lines; fleet-wide coverage counts both
    val rows = Seq(
      ("L1", 0, "V1", "1", 114.0, 22.5, ts("2019-02-01 08:00:00")),
      ("L2", 0, "V2", "1", 115.0, 23.5, ts("2019-02-01 08:00:00"))
    ).toDF("linenumber", "cluster", "id", "patternID", "lng", "lat", "t")
    val merged = BlindZone.run(rows, BlindZone.Config(lineScoped = false))
    // bug-compatible: the two lines' cluster-0 merge into one qualified
    // cluster covering 2/2 vehicles
    assert(merged.count() == 2)
    val scoped = BlindZone.run(rows)
    // line-scoped: each line's cluster 0 covers its own 1/1 fleet
    assert(scoped.count() == 2)
    assert(scoped.select($"linenumber").distinct().count() == 2)
  }
}
