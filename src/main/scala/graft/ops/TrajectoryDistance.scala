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

  /** PROVABLE cheap lower bound on [[totalWithLengths]] — the trig-free
    * prune gate of the O(T²) pair scan. Soundness chain, every step an
    * exact inequality of the haversine formula (no small-angle
    * approximations that could over-prune):
    *
    *  - `total = d1 + d2 + angular ≥ d1 + d2` (angular ≥ 0: both its
    *    branches are products of non-negative terms);
    *  - each `dᵢ = gc(pᵢ, proj)` where proj is a CLAMPED convex
    *    combination of chord2's endpoints, so proj.lat/lng lie inside
    *    chord2's bounding box — `|Δφ| ≥ latGap(pᵢ, box)` and
    *    `|Δλ| ≥ lngGap(pᵢ, box)`;
    *  - `gc ≥ R·|Δφ|`: haversine `h ≥ sin²(Δφ/2)` ⟹ `asin(√h) ≥ |Δφ|/2`;
    *  - `gc ≥ (2/π)·R·cfloor·|Δλ|` for `|Δλ| ≤ π`: `h ≥ cosφ₁cosφ₂·
    *    sin²(Δλ/2)`, `cosφ ≥ cos(maxAbsLat) ≥ 1 − maxAbsLat²/2 = cfloor`
    *    (Taylor bound, exact direction), `asin x ≥ x`, `sin x ≥ (2/π)x`
    *    on [0, π/2].
    *
    * NaN coordinates poison the bound to NaN, and `NaN > eps` is false —
    * a NaN pair is never pruned (its clamp-rule handling is downstream).
    * Cost: ~15 flops, zero trig/alloc. */
  def lowerBoundKm(
      h1lng: Double, h1lat: Double, l1lng: Double, l1lat: Double,
      s2lng: Double, s2lat: Double, e2lng: Double, e2lat: Double): Double = {
    // ANY non-finite coordinate → NaN (never prune): a partially-NaN
    // pair could still yield a finite lat-gap bound here while the true
    // distance evaluates NaN and must reach the clamp rule downstream
    if (!java.lang.Double.isFinite(h1lng + h1lat + l1lng + l1lat +
        s2lng + s2lat + e2lng + e2lat)) return Double.NaN
    val latLo = math.min(s2lat, e2lat); val latHi = math.max(s2lat, e2lat)
    val lngLo = math.min(s2lng, e2lng); val lngHi = math.max(s2lng, e2lng)
    val maxAbsLat = math.toRadians(math.max(
      math.max(math.abs(h1lat), math.abs(l1lat)),
      math.max(math.abs(latLo), math.abs(latHi))))
    val cfloor = 1.0 - maxAbsLat * maxAbsLat / 2.0
    // sin(x/2) monotonicity needs the ACTUAL |Δλ| ≤ π, and proj can sit
    // anywhere inside chord2's bbox, so |Δλ| ≤ gLng + bbox width — gate
    // the via-longitude branch on that SUM, not on gLng alone (ADVICE
    // r9: an antimeridian-wrapping bbox could otherwise push the
    // "provable" bound past the true distance and over-prune)
    val widthLng = math.toRadians(lngHi - lngLo)
    def one(plng: Double, plat: Double): Double = {
      val gLat = math.toRadians(
        math.max(0.0, math.max(latLo - plat, plat - latHi)))
      val gLng = math.toRadians(
        math.max(0.0, math.max(lngLo - plng, plng - lngHi)))
      val viaLat = EarthRadiusKm * gLat
      val viaLng =
        if (gLng + widthLng <= math.Pi && cfloor > 0.0)
          (2.0 / math.Pi) * EarthRadiusKm * cfloor * gLng
        else 0.0
      math.max(viaLat, viaLng)
    }
    one(h1lng, h1lat) + one(l1lng, l1lat)
  }
}
