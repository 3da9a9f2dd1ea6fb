package graft.queries

import scala.collection.mutable

/** Independent maximum-spanning-forest reference — KRUSKAL with a
  * sequential union-find, deliberately a different algorithm than the
  * engine's distributed Borůvka ([[Warehouse.graphMst]]): under the
  * strict composite edge order (−w, u, v) the forest is unique, so the
  * two must agree edge-for-edge. Plain collections, no Spark. */
object MstRef {

  /** edges: (u < v, w). Returns per-tree summaries sorted by component
    * (= min node id): (component, nNodes, nEdges, totalW, digest) with
    * digest = Σ u·1000003 + v·97 + w over the tree's chosen edges. */
  def maxSpanningForest(
      edges: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Boolean = {
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) false
      else { // attach the larger root under the smaller: roots stay minima
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
        true
      }
    }
    val chosen = edges.sortBy { case (u, v, w) => (-w, u, v) }
      .filter { case (u, v, _) => union(u, v) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byTree = nodes.groupBy(find)
    byTree.toSeq.map { case (root, ns) =>
      val es = chosen.filter(e => find(e._1) == root)
      (root, ns.size.toLong, es.size.toLong, es.map(_._3).sum,
        es.map { case (u, v, w) => u * 1000003L + v * 97L + w }.sum)
    }.sortBy(_._1)
  }
}
