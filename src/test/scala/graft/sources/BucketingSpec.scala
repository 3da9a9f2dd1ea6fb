package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: the co-located-join storage layout — both sides pre-hashed
  * into the same bucket count on the join key, so the join plans with NO
  * shuffle exchange (at 100 TB: the difference between re-shuffling the
  * fact table per join and reading it join-ready). */
class BucketingSpec extends SparkSpec {
  import sqlImplicits._

  test("bucketed-by-key tables sort-merge join with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 1000).map(i => (i.toLong, s"left$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bspec_left")
      (1 to 1000).filter(_ % 3 == 0).map(i => (i.toLong, s"right$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bspec_right")

      val joined = spark.table("bspec_left").join(spark.table("bspec_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.lines().anyMatch(_.trim.startsWith("Exchange")),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 333)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
    }
  }

  test("bucket pruning: equality filter reads one bucket's files") {
    (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").saveAsTable("bspec_prune")
    // the planner auto-disables bucketed scans when no operator needs the
    // distribution; force it on to observe filter-time bucket pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("bspec_prune").filter($"k" === 42L)
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("Bucketed: true"), scan)
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"), scan)
      assert(q.count() == 1)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bspec_prune")
    }
  }
}
