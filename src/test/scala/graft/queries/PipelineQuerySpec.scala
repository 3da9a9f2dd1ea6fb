package graft.queries

import graft.SparkSpec

class PipelineQuerySpec extends SparkSpec {

  test("pipeline_blindzone emits per-row clustered+graded output") {
    val df = Pipeline.blindZone(spark, sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty, "no clustered rows")
    assert(df.columns.toSeq == Seq("linenumber", "id", "patternID", "ts_us",
      "cluster", "signal", "row_hash", "patterns_checksum"))
    // the stage-1 checksum pins the full pattern output (constant column)
    assert(rows.map(_.getLong(7)).distinct.length == 1)
    // per-row granularity: at least as many rows as distinct trajectories,
    // and a graded signal only ever appears on a non-noise cluster
    assert(rows.forall(r => r.isNullAt(5) || r.getInt(4) >= 0))
    // at sf0.001 the coverage gate qualifies clusters → some signals graded
    assert(rows.exists(r => !r.isNullAt(5)), "no graded signal at sf0.001")
  }

  /** Invariant-digest gate (r8/r9 verdict stretch — the strongest value
    * pin a DBSCAN+trig pipeline can carry without a cross-engine trig
    * oracle): the FULL canonicalized (line, cluster, signal) histogram
    * at two SFs, hand-captured and pinned literally. Any change to
    * pattern extraction, the pair distance, the prune bound, DBSCAN
    * semantics, cluster-id assignment, the coverage gate, or signal
    * grading moves at least one histogram row; partitioning and row
    * order cannot (the histogram is an unordered rollup). The stage-1
    * patterns_checksum is pinned alongside — together they gate both
    * the coordinates and the clustering decisions. */
  test("pipeline_blindzone invariant digest: cluster/signal histograms pinned at two SFs") {
    def hist(dir: String): (Seq[(String, Int, Option[Double], Long)], Long) = {
      val rows = Pipeline.blindZone(spark, dir).collect()
      val h = rows.groupBy(r => (r.getString(0), r.getInt(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
        .map { case ((l, c, s), g) => (l, c, s, g.length.toLong) }
        .toSeq.sortBy { case (l, c, s, _) => (l, c, s.getOrElse(-1.0)) }
      (h, rows.head.getLong(7))
    }
    val (h1, ck1) = hist(sf0001)
    assert(ck1 == 9939203534L, s"stage-1 checksum moved: $ck1")
    assert(h1 == Seq(
      ("L0", -1, None, 25L), ("L1", -1, None, 24L), ("L2", -1, None, 26L),
      ("L3", -1, None, 28L), ("L4", -1, None, 35L), ("L5", -1, None, 26L),
      ("L6", 0, None, 27L), ("L6", 0, Some(0.5), 4L),
      ("L7", -1, None, 15L)), s"sf0.001 histogram moved:\n$h1")
    val (h2, ck2) = hist("/root/testdata/sf0.01")
    assert(ck2 == -101629825091L, s"stage-1 checksum moved: $ck2")
    assert(h2 == Seq(
      ("L0", 0, None, 130L), ("L0", 1, None, 108L),
      ("L1", -1, None, 26L), ("L1", 0, None, 146L), ("L1", 1, None, 120L),
      ("L2", -1, None, 14L), ("L2", 0, None, 120L), ("L2", 1, None, 28L),
      ("L2", 2, None, 86L),
      ("L3", 0, None, 153L), ("L3", 1, None, 87L),
      ("L4", 0, None, 87L), ("L4", 1, None, 157L),
      ("L5", -1, None, 13L), ("L5", 0, None, 161L), ("L5", 1, None, 81L),
      ("L6", -1, None, 35L), ("L6", 0, None, 143L), ("L6", 0, Some(0.5), 26L),
      ("L6", 1, None, 45L),
      ("L7", -1, None, 12L), ("L7", 0, None, 108L), ("L7", 1, None, 120L)),
      s"sf0.01 histogram moved:\n$h2")
  }

  test("pipeline_pattern_modes: bug-compat mode exactly empty, restored mode pinned") {
    val rows = Pipeline.patternModes(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("reference_as_committed", "restored"))
    val ref = rows(0)
    assert(ref.getLong(1) == 0L && ref.getLong(2) == 0L && ref.getLong(3) == 0L,
      s"the preserved reference bug must drop every row: $ref")
    val restored = rows(1)
    assert(restored.getLong(1) > 0L && restored.getLong(2) > 0L,
      s"restored numbering produced nothing: $restored")
  }

  test("pipeline_blindzone result is stable across shuffle-partition settings") {
    def run(): Array[String] =
      Pipeline.blindZone(spark, sf0001).collect().map(_.toString).sorted
    val base = run()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val other =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        run()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(base.sameElements(other),
      "per-row output (incl. row hashes and stage checksums) must not depend on partitioning")
  }
}
