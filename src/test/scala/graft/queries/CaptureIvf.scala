package graft.queries

/** Oracle-capture for `sim_ivf_topk` / `sim_ivf_warm` (run manually,
  * test scope; the CaptureSketches discipline): trains and searches the
  * IVF index with the INDEPENDENT [[IvfRef]] implementation, asserts
  * full bit-equality with BOTH engine queries on the same corpus, and
  * prints the DuckDB VALUES literal for `ExtOracle`. Enabled by the r12
  * fixed-point mean rewrite (`Similarity.MeanScale`) — float `avg`
  * partial-agg merge order kept the trained model non-deterministic and
  * these queries rows-only through r11.
  *
  *   sbt "Test/runMain graft.queries.CaptureIvf /root/testdata/sf0.01"
  */
object CaptureIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    val corpus: Seq[(Long, Array[Float])] = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect().toSeq
      .map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) id -> null
        else {
          val s = r.getSeq[Any](1)
          // null ELEMENTS behave like a null vector on every engine path
          // (null cid / dropped probe) — mirror that here
          if (s.contains(null)) id -> null
          else id -> s.map(_.asInstanceOf[Float]).toArray
        }
      }
    val queries = corpus.filter(_._1 % 50 == 0).sortBy(_._1).take(200)

    val cents = IvfRef.trainCentroids(corpus, nlist = 64, iters = 2)
    val twin = IvfRef.ivfTopK(queries, corpus, k = 10, cents, nprobe = 8)

    def engine(name: String): Seq[(Long, Int, Long, Double)] = {
      import spark.implicits._
      graft.SparkEntry.queries(name)(spark, dir)
        .as[(Long, Int, Long, Double)].collect().toSeq
    }
    Seq("sim_ivf_topk", "sim_ivf_warm").foreach { q =>
      val got = engine(q)
      require(got == twin,
        s"$q diverges from the IvfRef twin: engine=${got.size} " +
          s"twin=${twin.size} firstDiff=${got.zip(twin).find(p => p._1 != p._2)}")
    }
    require(twin.forall(r => !r._4.isNaN && !r._4.isInfinite),
      "non-finite cosine in capture — literal would not roundtrip")

    // scientific notation with 17 significant digits: DuckDB types a
    // long plain-decimal literal as DECIMAL (rounding past its width —
    // caught live: ...49721 parsed back one ulp off), while an exponent
    // literal is DOUBLE, and 17 digits uniquely identify any float64
    def fmt(d: Double): String = f"$d%.16e"
    val rows = twin.map { case (q, r, v, c) => s"($q, $r, $v, ${fmt(c)})" }
    val sql =
      s"""-- sim_ivf_topk / sim_ivf_warm (${twin.size} rows)
         |${rows.grouped(2).map(_.mkString(", ")).mkString(",\n")}""".stripMargin
    val out = java.nio.file.Paths.get("/tmp/ivf_oracle_capture.sql")
    java.nio.file.Files.write(out, sql.getBytes("UTF-8"))
    println(s"CAPTURED ivf rows=${twin.size} -> $out")
    spark.stop()
  }
}
