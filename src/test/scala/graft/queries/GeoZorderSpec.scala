package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoZorderSpec extends SparkSpec {
  import sqlImplicits._

  private def spread8(v: Long): Long = {
    val a = (v | (v << 4)) & 0x0F0FL
    val b = (a | (a << 2)) & 0x3333L
    (b | (b << 1)) & 0x5555L
  }
  private def morton(ix: Long, iy: Long): Long = spread8(ix) | (spread8(iy) << 1)

  test("cell keys are the Morton interleave of the quantized coordinates") {
    val got = Ext.all("geo_zorder_layout")(spark, sf0001)
      .select(col("z"), col("min_lng"), col("min_lat"))
      .as[(Long, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (z, lng, lat) =>
      // the cell's min point must quantize INTO the cell it's keyed to
      val ix = math.min(255L, math.max(0L,
        math.floor((lng - 114.0) / 0.2 * 256.0).toLong))
      val iy = math.min(255L, math.max(0L,
        math.floor((lat - 22.5) / 0.08 * 256.0).toLong))
      assert(morton(ix, iy) == z, s"cell $z bbox corner decodes elsewhere")
    }
    // the interleave is a bijection on the grid: distinct (ix, iy) pairs
    // map to distinct z (checked exhaustively — 65,536 cells)
    val all = for { x <- 0L until 256L; y <- 0L until 256L } yield morton(x, y)
    assert(all.distinct.size == 256 * 256)
  }

  test("z-ordering delivers spatial locality: consecutive-in-z beats arrival order on the ground") {
    val pings = Pipeline.syntheticFleet(spark, sf0001)
      .select(col("lng"), col("lat"), col("t")).as[(Double, Double, java.sql.Timestamp)]
      .collect()
    assert(pings.length > 100)
    def km(a: (Double, Double), b: (Double, Double)): Double =
      graft.core.Geo.haversineM(a._2, a._1, b._2, b._1) / 1000.0
    def meanStep(ps: Seq[(Double, Double)]): Double =
      ps.sliding(2).map(p => km(p.head, p.last)).sum / (ps.length - 1)
    val byArrival = pings.sortBy(_._3.getTime).map(p => (p._1, p._2)).toSeq
    val byZ = pings.map { p =>
      val ix = math.min(255L, math.max(0L,
        math.floor((p._1 - 114.0) / 0.2 * 256.0).toLong))
      val iy = math.min(255L, math.max(0L,
        math.floor((p._2 - 22.5) / 0.08 * 256.0).toLong))
      (morton(ix, iy), (p._1, p._2))
    }.sortBy(_._1).map(_._2).toSeq
    val (za, aa) = (meanStep(byZ), meanStep(byArrival))
    // the whole point of the layout: walking the z curve moves a small
    // fraction of the distance that walking arrival order does
    assert(za < aa * 0.5, f"z-walk $za%.3f km vs arrival-walk $aa%.3f km")
  }
}
