package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 optimization pins: implementations swapped for performance
  * must be value-identical to what they replaced.
  *
  *  - [[Warehouse.triSupportByAdjacency]] (broadcast-CSR common-neighbor
  *    counting) vs [[Warehouse.triSupportByWedges]] (the oriented wedge
  *    enumeration it replaced below the cap) on the REAL sf0.001 staged
  *    edge relation, and vs an in-test brute force on a synthetic graph
  *    whose triangles are known by construction.
  */
class Round12PerfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = graft.core.Sessions.local("4")

  private def supportSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("u"), col("v"), col("common")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("adjacency support == brute force on a synthetic graph") {
    val s = spark
    import s.implicits._
    // deterministic sparse random-ish graph: 60 nodes, edges from a
    // fixed arithmetic rule; symmetrized, no self-loops, distinct
    val undirected = (for {
      a <- 0L until 60L
      b <- (a + 1) until 60L
      if ((a * 31 + b * 17) % 7) < 2
    } yield (a, b)).toSeq
    val sym = (undirected ++ undirected.map { case (a, b) => (b, a) }).distinct
    val edges = sym.toDF("src", "dst")
    val got = supportSet(
      Warehouse.triSupportByAdjacency(s, edges, sym.size.toLong))
    // brute force: common neighbors per undirected edge
    val adj = sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val want = undirected.flatMap { case (u, v) =>
      val c = (adj(u) intersect adj(v)).size.toLong
      if (c > 0) Some((u, v, c)) else None
    }.toSet
    assert(want.nonEmpty, "synthetic graph must contain triangles")
    assert(got === want)
  }

  test("adjacency support == wedge-enumeration support on sf0.001") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val edges = Warehouse.stagedEdges(s, dir)
    val nSym = edges.count()
    val fast = supportSet(Warehouse.triSupportByAdjacency(s, edges, nSym))
    val (wedgeDf, bloom) = Warehouse.triSupportByWedges(s, dir, edges)
    val slow = supportSet(wedgeDf)
    bloom.destroy()
    assert(fast.nonEmpty, "sf0.001 co-purchase graph must contain triangles")
    assert(fast === slow)
  }
}
