package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import sqlImplicits._

  // 1 hot key (90% of rows) + a tail
  private def skewed = (
    (1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))
    ).toDF("k", "v")

  test("saltedCountSum equals the direct aggregation") {
    val direct = skewed.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").as[(String, Long, Double)].collect().toSeq
    val salted = Skew.saltedCountSum(skewed, Seq($"k"), $"v",
        Skew.saltOf(8, $"v"))
      .orderBy($"k").as[(String, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("saltedJoin equals the direct join, no duplicates or drops") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val direct = skewed.join(dim, Seq("k")).groupBy($"k", $"label")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").as[(String, String, Long, Double)].collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8,
        probeSalt = Skew.saltOf(8, $"v"))
      .groupBy($"k", $"label")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .orderBy($"k").as[(String, String, Long, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("left join keeps unmatched probe rows exactly once") {
    val dim = Seq(("k1", "A")).toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 4,
      probeSalt = Skew.saltOf(4, $"v"), joinType = "left")
    assert(salted.count() == skewed.count())
    assert(salted.filter($"label".isNull).count() == skewed.filter($"k" =!= "k1").count())
  }
}
