package graft.queries

/** Oracle-capture for `sim_pq_topk` / `sim_ivfpq_topk` (run manually,
  * test scope; the CaptureIvf discipline): trains the flat-PQ codebook,
  * the coarse quantizer, and the residual codebook with the INDEPENDENT
  * [[PqRef]]/[[IvfRef]] implementations, replays both searches, asserts
  * full bit-equality with the engine queries, and prints the DuckDB
  * VALUES literals for `ExtOracle`.
  *
  *   sbt "Test/runMain graft.queries.CapturePq /root/testdata/sf0.01"
  */
object CapturePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    val raw: Seq[(Long, Array[AnyVal])] = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect().toSeq
      .map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) id -> null
        else {
          val s = r.getSeq[Any](1)
          if (s.contains(null)) id -> null
          else id -> s.map(_.asInstanceOf[AnyVal]).toArray
        }
      }
    val floats: Seq[(Long, Array[Float])] = raw.map { case (id, v) =>
      id -> (if (v == null) null
             else v.map(x => x.asInstanceOf[Float]))
    }
    val valid = floats.filter(v => v._2 != null && v._2.length == 64)
    val corpusMap = valid.toMap
    val queries = floats.filter(v => v._1 % 50 == 0 && v._2 != null)
      .sortBy(_._1).take(200)

    // flat PQ: codebook over the raw corpus, codes per encodable vector
    val books = PqRef.trainPq(raw, m = 4, subDim = 16, nlist = 64, iters = 2)
    val codes = valid.map { case (id, v) =>
      id -> PqRef.encode(v.map(x => x: AnyVal), books, 16).get
    }
    val twinPq = PqRef.pqTopK(queries, codes, corpusMap,
      k = 10, oversample = 20, books, subDim = 16)

    // IVF-PQ: coarse quantizer + residual codebook + inverted file
    val cents = IvfRef.trainCentroids(floats, nlist = 64, iters = 2)
    val residuals: Seq[(Long, Int, Array[Double])] = valid.flatMap {
      case (id, v) =>
        IvfRef.topCids(v, cents, 1).map { c =>
          val cent = cents(c.head)._2
          (id, c.head, Array.tabulate(v.length)(i => v(i).toDouble - cent(i)))
        }
    }
    val resBooks = PqRef.trainPq(
      residuals.map { case (id, _, r) => id -> r.map(x => x: AnyVal) },
      m = 4, subDim = 16, nlist = 64, iters = 2)
    val index = residuals.map { case (id, cid, r) =>
      val cs = PqRef.encode(r.map(x => x: AnyVal), resBooks, 16).get
      (id, cid, cs, PqRef.reconNormPlus(cents(cid)._2, cs, resBooks, 16))
    }
    val twinIvfPq = PqRef.ivfPqTopK(queries, index, cents, resBooks, 16,
      corpusMap, k = 10, oversample = 20, nprobe = 8)

    def engine(name: String): Seq[(Long, Int, Long, Double)] = {
      import spark.implicits._
      graft.SparkEntry.queries(name)(spark, dir)
        .as[(Long, Int, Long, Double)].collect().toSeq
    }
    Seq("sim_pq_topk" -> twinPq, "sim_ivfpq_topk" -> twinIvfPq).foreach {
      case (q, twin) =>
        val got = engine(q)
        require(got == twin,
          s"$q diverges from the PqRef twin: engine=${got.size} " +
            s"twin=${twin.size} firstDiff=${got.zip(twin).find(p => p._1 != p._2)}")
        require(twin.forall(r => !r._4.isNaN && !r._4.isInfinite),
          s"$q: non-finite cosine in capture")
    }

    def fmt(d: Double): String = f"$d%.16e"
    def lit(rows: Seq[(Long, Int, Long, Double)]): String =
      rows.map { case (q, r, v, c) => s"($q, $r, $v, ${fmt(c)})" }
        .grouped(2).map(_.mkString(", ")).mkString(",\n")
    val sql =
      s"""-- sim_pq_topk (${twinPq.size} rows)
         |${lit(twinPq)}
         |;
         |-- sim_ivfpq_topk (${twinIvfPq.size} rows)
         |${lit(twinIvfPq)}""".stripMargin
    val out = java.nio.file.Paths.get("/tmp/pq_oracle_capture.sql")
    java.nio.file.Files.write(out, sql.getBytes("UTF-8"))
    println(s"CAPTURED pq=${twinPq.size} ivfpq=${twinIvfPq.size} -> $out")
    spark.stop()
  }
}
