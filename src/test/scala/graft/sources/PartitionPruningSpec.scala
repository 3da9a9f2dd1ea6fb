package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-layout pruning: a date/key-partitioned parquet lake must turn
  * equality predicates into PartitionFilters (directories never read), not
  * data filters — at 100 TB the difference between scanning one day and
  * scanning three years. */
class PartitionPruningSpec extends SparkSpec {
  import sqlImplicits._

  test("hive-layout write + partition filter prunes directories") {
    val dir = Files.createTempDirectory("prune").toString + "/lake"
    (1 to 300).map(i => (i.toLong, s"d${i % 3}", i * 1.0))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter($"day" === "d1")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("day"), s"no partition filter:\n$plan")
    assert(q.count() == 100)
    // non-partition predicates still push down as data filters
    val q2 = spark.read.parquet(dir).filter($"day" === "d1" && $"id" > 250)
    val plan2 = q2.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,250)]"),
      plan2)
  }
}
