package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import sqlImplicits._

  // a hand-built 2-block × 2-dim model: block 0 separates x-axis from
  // y-axis, block 1 separates z-axis from w-axis
  private def tinyModel() = {
    val books = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(0.0, 2.0), Array(2.0, 0.0)))
    Similarity.broadcastPq(spark, m = 2, subDim = 2, books)
  }

  test("PqCodes: per-block L2 argmin, ties to the lowest code, null contract") {
    val bc = tinyModel()
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 1.9f, 0.1f)), // blocks → (1,0) and (2,0): codes (0, 1)
      (2L, Seq(0.0f, 1.1f, 0.1f, 2.2f)), // blocks → (0,1) and (0,2): codes (1, 0)
      (3L, null.asInstanceOf[Seq[Float]]),
      (4L, Seq(1.0f, 0.0f)) // wrong dim → null
    ).toDF("vec_id", "embedding")
    val codes = df.select(col("vec_id"),
        Similarity.pqCodes(col("embedding"), bc).as("c"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1).toSeq)).toMap
    assert(codes(1L) == Seq(0, 1))
    assert(codes(2L) == Seq(1, 0))
    assert(codes(3L) == null)
    assert(codes(4L) == null)
    // equidistant vector ties to the LOWEST code in every block
    val tie = Seq((9L, Seq(0.5f, 0.5f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
      .select(Similarity.pqCodes(col("embedding"), bc)).head().getSeq[Int](0)
    assert(tie == Seq(0, 0))
  }

  test("PqAdc + PqReconNorm reconstruct exactly from the codebook") {
    val bc = tinyModel()
    val df = Seq((Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(0, 1))).toDF("q", "codes")
    val (adc, rn) = df.select(
      Similarity.pqAdc(col("q"), col("codes"), bc),
      Similarity.pqReconNorm(col("codes"), bc)).as[(Double, Double)].head()
    // reconstruction of (0,1) is (1,0, 2,0): dot = 1·1 + 2·0 + 3·2 + 4·0 = 7
    assert(adc == 7.0)
    assert(rn == math.sqrt(1.0 + 4.0))
    // out-of-range code → null, not a crash
    val bad = Seq((Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(0, 9))).toDF("q", "codes")
    assert(bad.select(Similarity.pqAdc(col("q"), col("codes"), bc)).head().isNullAt(0))
  }

  test("lossless codebook (nlist ≥ corpus): ADC dot equals exact dot bit-for-bit") {
    // every corpus vector seeds its own code word in every block, so the
    // reconstruction IS the vector, and adcDot's accumulator carries
    // ACROSS blocks — the same left-to-right element order as SeqDot's
    // flat fold, so the dot products must be bit-identical. (The cosine
    // is NOT bit-comparable: pqReconNorm sums per-block norm partials, a
    // different float association than l2Norm's flat fold.)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("embedding").isNotNull &&
        forall(col("embedding"), x => x.isNotNull))
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(40)
    val books = Similarity.trainPq(emb, m = 4, subDim = 16, nlist = 40, iters = 0)
    val bc = Similarity.broadcastPq(spark, 4, 16, books)
    val coded = emb.select(col("vec_id"),
      Similarity.pqCodes(col("embedding"), bc).as("codes"))
    val q = emb.limit(3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val mismatches = coded.join(broadcast(q), col("qid") =!= col("vec_id"))
      .join(emb.withColumnRenamed("vec_id", "v2"), col("v2") === col("vec_id"))
      .withColumn("adc", Similarity.pqAdc(col("qvec"), col("codes"), bc))
      .withColumn("exact", Similarity.dot(col("qvec"), col("embedding")))
      .filter(col("adc") =!= col("exact"))
      .count()
    assert(mismatches == 0)
  }

  test("pqTopK with a lossless codebook reproduces brute force exactly") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("embedding").isNotNull &&
        forall(col("embedding"), x => x.isNotNull))
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(40)
    val books = Similarity.trainPq(emb, m = 4, subDim = 16, nlist = 40, iters = 0)
    val bc = Similarity.broadcastPq(spark, 4, 16, books)
    val coded = emb.select(col("vec_id"),
      Similarity.pqCodes(col("embedding"), bc).as("codes"))
    val q = emb.limit(3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("rank")).collect().toSeq.map(_.toSeq)
    val pq = Similarity.pqTopK(q, coded, emb, k = 5, oversample = 8, bc)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5)
    assert(rows(pq).nonEmpty && rows(pq) == rows(exact))
  }

  test("trainPq: deterministic, and save/load roundtrips the codebook exactly") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = Similarity.trainPq(emb, m = 4, subDim = 16, nlist = 8, iters = 1)
    val b = Similarity.trainPq(emb, m = 4, subDim = 16, nlist = 8, iters = 1)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
    val path = graft.core.Tmp.jvmScopedDir("spec_pq_model", "roundtrip")
    Similarity.savePq(spark, a, path)
    val loaded = Similarity.loadPq(spark, path)
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq ==
      a.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PqReconNormPlus equals a driver-side reconstruction norm") {
    val bc = tinyModel()
    val df = Seq((Seq(0.5f, 0.5f, 1.0f, 1.0f), Seq(0, 1))).toDF("base", "codes")
    val rn = df.select(
      Similarity.pqReconNormPlus(col("base"), col("codes"), bc)).as[Double].head()
    // base + decode((0,1)) = (0.5+1, 0.5+0, 1+2, 1+0) = (1.5, 0.5, 3, 1)
    val want = math.sqrt(1.5 * 1.5 + 0.5 * 0.5 + 9.0 + 1.0)
    assert(rn == want)
    // mismatched codes → null
    assert(df.select(Similarity.pqReconNormPlus(col("base"),
      array(lit(0)), bc)).head().isNullAt(0))
  }

  test("sim_ivfpq_topk: exact re-ranked scores are a subset of brute force") {
    val rows = graft.queries.Ext.all("sim_ivfpq_topk")(spark, sf0001)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .filter(forall(col("embedding"), x => x.isNotNull))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(q, emb, k = emb.count().toInt)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(rows.subsetOf(exact),
      s"IVF-PQ emitted a pair/score brute force never produced")
  }

  test("sim_ivfpq_recall gate: every boolean TRUE on the real table") {
    val rows = graft.queries.Ext.all("sim_ivfpq_recall")(spark, sf0001).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      rows.map(_.toString).mkString(","))
  }

  test("sim_pq_recall gate: every boolean TRUE on the real table") {
    val rows = graft.queries.Ext.all("sim_pq_recall")(spark, sf0001).collect()
    assert(rows.length == 10) // vec_id % 50 == 0 at sf0.001
    assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      rows.map(_.toString).mkString(","))
  }

  test("sim_pq_topk emits k unique, exactly-scored neighbors per query") {
    val rows = graft.queries.Ext.all("sim_pq_topk")(spark, sf0001)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_._1)
    assert(perQ.values.forall(_.length == 10))
    assert(perQ.values.forall(g => g.map(_._3).distinct.length == 10))
    // re-ranked scores are exact cosines, so they descend with rank
    assert(perQ.values.forall(g =>
      g.sortBy(_._2).map(_._4).sliding(2).forall(p => p.head >= p.last)))
  }
}
