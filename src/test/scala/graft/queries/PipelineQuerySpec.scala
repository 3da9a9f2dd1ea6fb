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
