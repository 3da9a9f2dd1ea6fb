package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 pins: the IVF literal-oracle lifecycle. The sf0.01 literal
  * itself lives in [[IvfCapturedRows]] (CaptureIvf asserts engine ==
  * twin there); this spec re-pins the [[IvfRef]] twin at a SECOND scale
  * (sf0.001) so the parity is not a one-corpus accident — the
  * CaptureSketches / Round11OpsSpec discipline. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def collectVecs(dir: String): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect().toSeq
      .map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) id -> null
        else {
          val s = r.getSeq[Any](1)
          if (s.contains(null)) id -> null
          else id -> s.map(_.asInstanceOf[Float]).toArray
        }
      }

  test("sim_ivf_topk == the independent IvfRef twin at sf0.001") {
    val corpus = collectVecs(sf0001)
    val queries = corpus.filter(_._1 % 50 == 0).sortBy(_._1).take(200)
    val cents = IvfRef.trainCentroids(corpus, nlist = 64, iters = 2)
    val twin = IvfRef.ivfTopK(queries, corpus, k = 10, cents, nprobe = 8)
    val got = graft.SparkEntry.queries("sim_ivf_topk")(spark, sf0001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == twin,
      s"engine=${got.size} twin=${twin.size} " +
        s"firstDiff=${got.zip(twin).find(p => p._1 != p._2)}")
  }

  test("sim_pq_topk == the independent PqRef twin at sf0.001") {
    val raw = spark.read.parquet(s"$sf0001/embeddings.parquet")
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
    val floats = raw.map { case (id, v) =>
      id -> (if (v == null) null else v.map(_.asInstanceOf[Float]))
    }
    val valid = floats.filter(v => v._2 != null && v._2.length == 64)
    val queries = floats.filter(v => v._1 % 50 == 0 && v._2 != null)
      .sortBy(_._1).take(200)
    val books = PqRef.trainPq(raw, m = 4, subDim = 16, nlist = 64, iters = 2)
    val codes = valid.map { case (id, v) =>
      id -> PqRef.encode(v.map(x => x: AnyVal), books, 16).get
    }
    val twin = PqRef.pqTopK(queries, codes, valid.toMap,
      k = 10, oversample = 20, books, subDim = 16)
    val got = graft.SparkEntry.queries("sim_pq_topk")(spark, sf0001)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == twin,
      s"engine=${got.size} twin=${twin.size} " +
        s"firstDiff=${got.zip(twin).find(p => p._1 != p._2)}")
  }

  test("fixed-point Lloyd training is run-to-run deterministic under repartition") {
    // the r11 blocker was partial-agg merge order; vary the physical
    // partitioning and demand an identical trained model
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = graft.ext.Similarity.trainCentroids(emb, nlist = 8, iters = 2)
    val b = graft.ext.Similarity.trainCentroids(
      emb.repartition(7, col("vec_id")), nlist = 8, iters = 2)
    assert(a == b)
  }
}
