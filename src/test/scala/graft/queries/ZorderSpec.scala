package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical claim behind [[Warehouse.layoutZorder]]: landing a table
  * range-partitioned on the Morton code makes every partition (→ file)
  * NARROW in BOTH interleaved dimensions at once, so min/max footer
  * stats prune scans filtered on either key — where a single-key sort
  * is narrow only in its own key and spans the whole domain of the
  * other. Asserted on actual partition layouts, not on the code map. */
class ZorderSpec extends SparkSpec {

  test("z-order range partitions are narrow in BOTH dimensions; a single-key sort is not") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"))
    val b = li.agg(
      min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pmin, pmax) = (b.getLong(0), b.getLong(1))
    val (smin, smax) = (b.getLong(2), b.getLong(3))
    val gp = (pmax - pmin).toDouble
    val gs = (smax - smin).toDouble

    // avg per-partition (max-min) span of each key under a 16-way
    // range-partitioned layout on `c` — the footer-stats width a file
    // would have after this landing
    def spans(df: DataFrame, c: String): (Double, Double) = {
      val r = df.repartitionByRange(16, col(c))
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg((max(col("l_partkey")) - min(col("l_partkey"))).as("ps"),
          (max(col("l_suppkey")) - min(col("l_suppkey"))).as("ss"))
        .agg(avg(col("ps")), avg(col("ss"))).head()
      (r.getDouble(0), r.getDouble(1))
    }

    val coded = Warehouse.zorderCoded(li, pmin, pmax, smin, smax)
    val (zp, zs) = spans(coded, "zval")
    val (kp, ks) = spans(li, "l_partkey")
    info(f"zorder: pk span ${zp / gp}%.2f of global, sk span ${zs / gs}%.2f")
    info(f"pk sort: pk span ${kp / gp}%.2f of global, sk span ${ks / gs}%.2f")

    // z-order: BOTH dims well under the global span (16 partitions fix
    // ≥4 leading Morton bits → ≤ quarter-tiles, plus range-boundary
    // straddle slack)
    assert(zp < 0.55 * gp, s"zorder partkey span $zp vs global $gp")
    assert(zs < 0.55 * gs, s"zorder suppkey span $zs vs global $gs")
    // single-key sort: razor-thin on its own key, but the OTHER key
    // spans essentially the whole domain — the pruning gap z-order closes
    assert(kp < 0.15 * gp, s"partkey-sort partkey span $kp vs global $gp")
    assert(ks > 0.70 * gs, s"partkey-sort suppkey span $ks vs global $gs")
  }
}
