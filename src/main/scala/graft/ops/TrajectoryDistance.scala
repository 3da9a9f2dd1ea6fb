package graft.ops

/** TRACLUS-style trajectory distance — scalar math for the clustering
  * stage, ported from `Standalone/Trajectory Clustering.py:58–141` (the
  * reference's only genuinely custom algorithmic code, reachable there
  * only through Python UDFs; native Scala here removes every JVM↔Python
  * crossing).
  *
  * Semantics preserved exactly, including two quirks worth knowing:
  *  - `horizontal_distance` and `vertical_distance` in the reference are
  *    the *identical* computation (TC-S:90–107), so the total is
  *    2 × (mean endpoint→chord-projection distance) + angular term
  *    (TC-S:135–141);
  *  - the chord projection does its dot products on raw lng/lat degrees
  *    (a flat-earth approximation), while the resulting point distances
  *    are great-circle km — both kept.
  *
  * Great-circle radius is geopy's `great_circle` mean earth radius
  * (6371.009 km), which the reference used via `geopy.distance`
  * (TC-S:58–61); distances are in km.
  */
object TrajectoryDistance {

  /** geopy `EARTH_RADIUS` (km). */
  val EarthRadiusKm = 6371.009

  /** A GPS point as (lng, lat) degrees — the reference's tuple order. */
  final case class P(lng: Double, lat: Double)

  /** Great-circle distance in km (TC-S:58–61). */
  def greatCircleKm(a: P, b: P): Double = {
    val dLat = math.toRadians(b.lat - a.lat)
    val dLng = math.toRadians(b.lng - a.lng)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(a.lat)) * math.cos(math.toRadians(b.lat)) *
        math.pow(math.sin(dLng / 2), 2)
    2 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** Project `p` onto segment `s→e` in raw-degree space, clamped to the
    * endpoints (TC-S:64–87). */
  def projectOnSegment(p: P, s: P, e: P): P = {
    if (s == e) return s
    val (vx, vy) = (e.lng - s.lng, e.lat - s.lat)
    val (ux, uy) = (p.lng - s.lng, p.lat - s.lat)
    val t = (ux * vx + uy * vy) / (vx * vx + vy * vy)
    if (t < 0) s
    else if (t > 1) e
    else P(s.lng + t * vx, s.lat + t * vy)
  }

  /** Mean distance of tr1's endpoints to their projections on tr2's
    * chord — the reference's horizontal ≡ vertical component
    * (TC-S:90–107). */
  def endpointProjectionKm(tr1: IndexedSeq[P], tr2: IndexedSeq[P]): Double = {
    val (s2, e2) = (tr2.head, tr2.last)
    val d1 = greatCircleKm(tr1.head, projectOnSegment(tr1.head, s2, e2))
    val d2 = greatCircleKm(tr1.last, projectOnSegment(tr1.last, s2, e2))
    (d1 + d2) / 2.0
  }

  /** Polyline length in km. */
  def lengthKm(tr: IndexedSeq[P]): Double =
    tr.sliding(2).map { case Seq(a, b) => greatCircleKm(a, b) }.sum

  /** Angular component (TC-S:110–132): angle between the two chords in
    * raw-degree space; degenerate chords count as 90°. */
  def angularKm(tr1: IndexedSeq[P], tr2: IndexedSeq[P]): Double =
    angularKmWithLengths(tr1, tr2, lengthKm(tr1), lengthKm(tr2))

  /** [[angularKm]] with the polyline lengths precomputed by the caller —
    * inside an O(T²) pair loop this turns the distance from
    * O(points-per-trajectory) to O(1) per pair. */
  def angularKmWithLengths(
      tr1: IndexedSeq[P], tr2: IndexedSeq[P],
      len1: Double, len2: Double): Double = {
    val (v1x, v1y) = (tr1.last.lng - tr1.head.lng, tr1.last.lat - tr1.head.lat)
    val (v2x, v2y) = (tr2.last.lng - tr2.head.lng, tr2.last.lat - tr2.head.lat)
    val n1 = math.sqrt(v1x * v1x + v1y * v1y)
    val n2 = math.sqrt(v2x * v2x + v2y * v2y)
    val thetaDeg =
      if (n1 == 0.0 || n2 == 0.0) 90.0
      else {
        val cos = math.max(-1.0, math.min(1.0, (v1x * v2x + v1y * v2y) / (n1 * n2)))
        math.toDegrees(math.acos(cos))
      }
    if (thetaDeg > 0 && thetaDeg <= 90)
      math.min(len1, len2) * math.sin(math.toRadians(thetaDeg))
    else if (thetaDeg > 90 && thetaDeg <= 180)
      math.max(len1, len2)
    else 0.0
  }

  /** Total trajectory distance in km (TC-S:135–141): the duplicated
    * horizontal/vertical term counted twice, plus the angular term. */
  def total(tr1: IndexedSeq[P], tr2: IndexedSeq[P]): Double =
    2.0 * endpointProjectionKm(tr1, tr2) + angularKm(tr1, tr2)

  /** [[total]] with caller-precomputed polyline lengths (pair-loop form). */
  def totalWithLengths(
      tr1: IndexedSeq[P], tr2: IndexedSeq[P],
      len1: Double, len2: Double): Double =
    2.0 * endpointProjectionKm(tr1, tr2) +
      angularKmWithLengths(tr1, tr2, len1, len2)
}
