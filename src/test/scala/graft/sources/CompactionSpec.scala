package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import sqlImplicits._

  test("src_compact_small_files: layout pins TRUE, content digest equals an independent fold") {
    val r = graft.queries.Ext.all("src_compact_small_files")(spark, sf0001).head()
    val (nRows, xor, compacted, balanced) =
      (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3))
    assert(compacted, "file count did not shrink to the planned output count")
    assert(balanced, "an output file exceeded 2x the target size")
    // row count and the order-free content digest recomputed from the
    // SOURCE table (the compactor must be a pure relayout)
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text").cast("string")).as[String].collect()
    assert(nRows == src.length.toLong)
    val wantXor = src.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(d.substring(0, 15), 16)
    }.foldLeft(0L)(_ ^ _)
    assert(xor == wantXor, "compacted content digest diverged from the source")
  }

  test("compaction is idempotent: a second run reproduces the same relation") {
    val a = graft.queries.Ext.all("src_compact_small_files")(spark, sf0001)
      .collect().toSeq.map(_.toSeq)
    val b = graft.queries.Ext.all("src_compact_small_files")(spark, sf0001)
      .collect().toSeq.map(_.toSeq)
    assert(a == b)
  }
}
