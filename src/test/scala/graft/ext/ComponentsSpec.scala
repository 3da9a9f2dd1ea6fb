package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import sqlImplicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to its minimum (diameter > 1 needs iterations)") {
    val m = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 8L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("separate cliques stay separate") {
    val m = cc(Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(m(10L) == 10L && m(11L) == 10L && m(12L) == 10L)
    assert(m(20L) == 20L && m(21L) == 20L)
  }

  test("empty edge list yields empty labels") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("star graph converges in one round regardless of id order") {
    val m = cc(Seq((7L, 3L), (7L, 5L), (7L, 9L), (7L, 1L)))
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 3L, 5L, 7L, 9L))
  }

  test("distributed label propagation agrees with the driver union-find") {
    // the hybrid sends every test-sized graph to the union-find; force the
    // distributed path (threshold 0) so the iterative plan stays covered
    val edges = {
      val rnd = new scala.util.Random(41)
      // random graph + a long chain (forces multiple propagation rounds)
      val rand = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      // diameter 12 — needs several rounds but stays safely BELOW the
      // default maxIter=20, so the loop exits on CONVERGENCE, not the cap
      val chain = (100L to 112L).sliding(2).map(s => (s.head, s.last)).toSeq
      (rand ++ chain).distinct
    }
    val viaLoop = Dedup.connectedComponents(
        edges.toDF("id1", "id2"), localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    val viaUnionFind = cc(edges)
    assert(viaLoop == viaUnionFind)
    assert(viaLoop(112L) == 100L) // chain collapsed
  }
}
