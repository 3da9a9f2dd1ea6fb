package graft.queries

/** Oracle-capture for `dedup_minhash_lsh` and `dedup_simhash` (run
  * manually, test scope): computes both sketch pipelines with the
  * INDEPENDENT reference implementations ([[SketchRef]] — public-spec
  * xxHash64 / FNV-1a, collection mechanics), asserts full equality with
  * the engine queries on the same corpus, and prints DuckDB VALUES
  * literals for `ExtOracle` (the CaptureBpe precedent: the literal
  * derives from the independent implementation, never from the engine
  * under test, so the driver gate cross-checks two implementations).
  *
  *   sbt "Test/runMain graft.queries.CaptureSketches /root/testdata/sf0.01"
  */
object CaptureSketches {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val mh = SketchRef.minhashLshPairs(docs)
    val gotMh = Ext.dedupMinhashLsh(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    require(gotMh == mh,
      s"minhash twin diverges: engine=${gotMh.size} twin=${mh.size} " +
        s"firstDiff=${gotMh.zip(mh).find(p => p._1 != p._2)}")

    val sh = SketchRef.simhashPairs(docs)
    val gotSh = Ext.dedupSimhash(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    require(gotSh == sh,
      s"simhash twin diverges: engine=${gotSh.size} twin=${sh.size} " +
        s"firstDiff=${gotSh.zip(sh).find(p => p._1 != p._2)}")

    def fmt(d: Double): String = {
      val s = d.toString
      if (s.contains('.') || s.contains('e') || s.contains('E')) s else s + ".0"
    }
    val mhRows = mh.map { case (a, b, e) => s"($a, $b, ${fmt(e)})" }
    val shRows = sh.map { case (a, b, h) => s"($a, $b, $h)" }
    val sql =
      s"""-- dedup_minhash_lsh (${mh.size} rows)
         |SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
         |       CAST(est_jaccard AS DOUBLE) AS est_jaccard
         |FROM (VALUES
         |${mhRows.grouped(4).map(_.mkString(", ")).mkString(",\n")})
         |  AS t(id1, id2, est_jaccard)
         |ORDER BY id1, id2
         |;
         |-- dedup_simhash (${sh.size} rows)
         |SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
         |       CAST(hamming AS INTEGER) AS hamming
         |FROM (VALUES
         |${shRows.grouped(8).map(_.mkString(", ")).mkString(",\n")})
         |  AS t(id1, id2, hamming)
         |ORDER BY id1, id2""".stripMargin
    val out = java.nio.file.Paths.get("/tmp/sketch_oracle_capture.sql")
    java.nio.file.Files.write(out, sql.getBytes("UTF-8"))
    println(s"CAPTURED minhash=${mh.size} simhash=${sh.size} -> $out")
    spark.stop()
  }
}
