package graft.queries

import graft.SparkSpec

class PipelineQuerySpec extends SparkSpec {

  test("pipeline_blindzone runs end-to-end on sf0.001 and reports all stages") {
    val rows = Pipeline.blindZone(spark, sf0001).collect()
    assert(rows.length == 3)
    val byStage = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStage("1_patterns")._1 > 0, s"no patterns: $byStage")
    assert(byStage("1_patterns")._2 > 0)
    // clustering and grading must at least run; groups may be sparse
    assert(byStage.contains("2_clustered") && byStage.contains("3_signals"))
  }
}
