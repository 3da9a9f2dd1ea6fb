package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import sqlImplicits._

  test("dot/cosine column math") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (d, c) = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.cosine(col("a"), col("b"))).as[(Double, Double)].head()
    assert(d == 32.0)
    assert(math.abs(c - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  private val corpus = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f)),
    (3L, Seq(0.0f, 1.0f)),
    (4L, Seq(-1.0f, 0.0f)),
    (5L, Seq(0.7f, 0.7f))).toDF("vec_id", "embedding")

  test("bruteForceTopK: correct ranking, self excluded") {
    val q = corpus.filter(col("vec_id") === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val r = Similarity.bruteForceTopK(q, corpus, k = 3)
      .orderBy(col("rank"))
      .select(col("vec_id")).as[Long].collect()
    assert(r.toSeq == Seq(2L, 5L, 3L)) // by cosine to (1,0): .994, .707, 0
  }

  test("lshTopK: subset of brute-force candidates, ranked consistently") {
    // 64-dim vectors from the real test table
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.limit(2).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val approx = Similarity.lshTopK(q, emb, k = 5)
    val exact = Similarity.bruteForceTopK(q, emb, k = emb.count().toInt)
    // every LSH hit exists in the exact ranking with the identical score
    val a = approx.select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val e = exact.select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(a.nonEmpty && a.subsetOf(e))
  }

  test("hyperplanes deterministic across calls") {
    assert(Similarity.hyperplanes(4, 8) == Similarity.hyperplanes(4, 8))
  }

  test("IVF: centroids separate obvious clusters; topK stays in-cell") {
    // three tight clusters along distinct axes
    val vecs = (for {
      c <- 0 until 3
      i <- 0 until 6
    } yield {
      val base = Array.fill(4)(0.05f)
      base(c) = 1.0f + i * 0.01f
      (c * 10L + i, base.toSeq)
    }).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(vecs, nlist = 3, iters = 2)
    assert(cents.size == 3)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val hits = Similarity.ivfTopK(q, vecs, k = 5, nlist = 3, nprobe = 1, iters = 2)
      .select(col("vec_id")).as[Long].collect().toSet
    // everything retrieved is from cluster 0 (ids 1..5), never 10+/20+
    assert(hits.nonEmpty && hits.forall(_ < 10L), s"hits=$hits")
  }

  test("IVF results carry exact cosine scores (subset of brute force)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.limit(2).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ivf = Similarity.ivfTopK(q, emb, k = 5, nlist = 4, nprobe = 2)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val exact = Similarity.bruteForceTopK(q, emb, k = emb.count().toInt)
      .select(col("qid"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(ivf.nonEmpty && ivf.subsetOf(exact))
  }

  test("CentroidTopIds: broadcast scoring matches explicit cosine ranking") {
    val centroids = Seq(
      0 -> Seq(1.0, 0.0, 0.0),
      1 -> Seq(0.0, 1.0, 0.0),
      2 -> Seq(0.0, 0.0, 1.0),
      3 -> Seq(1.0, 0.0, 0.0)) // duplicate of cid 0 — tie goes to LOWEST cid
    val model = Similarity.broadcastModel(spark, centroids)
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 0.2f, 0.9f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val nearest = df.select(col("vec_id"),
        Similarity.nearestCentroid(col("embedding"), model).as("cid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -99 else r.getInt(1)))
      .toMap
    assert(nearest(1L) == 0) // tie with cid 3 broken low
    assert(nearest(2L) == 2)
    assert(nearest(3L) == -99) // null vector → null cid
    // a vector with a NULL ELEMENT also yields null (the SeqDot contract)
    val withNullElem = Seq((4L, Seq[java.lang.Float](1.0f, null, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(withNullElem.select(
      Similarity.nearestCentroid(col("embedding"), model)).head().isNullAt(0))
  }

  test("IVF survives nlist larger than the corpus (graceful degradation)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val n = emb.count()
    val r = Similarity.ivfTopK(q, emb, k = 3, nlist = (n + 10).toInt, nprobe = 2)
    assert(r.count() > 0)
  }

  test("zero-norm centroid can never win an assignment (NaN inversion regression)") {
    // an all-zero vector among the seeds makes a degenerate centroid:
    // its cosine is 0/0 = NaN, and Double.compare ranks NaN above every
    // real — unguarded, one zero seed swallowed the whole corpus
    val degenerate = Seq(
      (1L, Seq(0.0f, 0.0f)), // zero seed → zero-norm centroid 0
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f)),
      (4L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val model = Similarity.broadcastModel(spark,
      Similarity.trainCentroids(degenerate, nlist = 2, iters = 0))
    val cids = degenerate
      .select(col("vec_id"), Similarity.nearestCentroid(col("embedding"), model))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // centroid 0 is the zero vector, centroid 1 is (1,0): every vector
    // with a real score must land on 1, never the NaN-scoring 0
    assert(Seq(2L, 3L).forall(cids(_) == 1), s"assignment: $cids")
  }

  test("recallAtK: exact-vs-exact is total recall; disjoint approx is zero") {
    val q = corpus.limit(2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(q, corpus, k = 3)
    val total = Similarity.recallAtK(exact, exact)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(total.nonEmpty && total.forall { case (n, h) => n == h })
    val none = Similarity.recallAtK(exact,
      exact.withColumn("vec_id", col("vec_id") + 1000))
      .collect().map(_.getLong(2))
    assert(none.forall(_ == 0L))
  }

  test("sim_ann_recall gate: every boolean TRUE on the real table") {
    val rows = graft.queries.Ext.all("sim_ann_recall")(spark, sf0001).collect()
    assert(rows.length == 10) // vec_id % 50 == 0 at sf0.001
    assert(rows.forall(r => (1 to 4).forall(i => r.getBoolean(i))),
      rows.map(_.toString).mkString(","))
  }

  test("IVF model save/load roundtrips; warm search == train-inline search") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val trained = Similarity.trainCentroids(emb, nlist = 8, iters = 2)
    val path = graft.core.Tmp.jvmScopedDir("spec_ivf_model", "roundtrip")
    Similarity.saveCentroids(spark, trained, path)
    // doubles roundtrip parquet exactly → the loaded model is the model
    assert(Similarity.loadCentroids(spark, path) == trained.sortBy(_._1))
    val q = emb.limit(3).select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), col("rank")).collect().toSeq.map(_.toSeq)
    val warm = Similarity.ivfTopKWithCentroids(q, emb, k = 5,
      Similarity.loadCentroids(spark, path), nprobe = 2)
    val inline = Similarity.ivfTopK(q, emb, k = 5, nlist = 8, nprobe = 2)
    assert(rows(warm) == rows(inline))
  }

  test("sim_ivf_warm reproduces sim_ivf_topk bit-for-bit") {
    def rows(name: String) =
      graft.queries.Ext.all(name)(spark, sf0001).collect().toSeq.map(_.toSeq)
    assert(rows("sim_ivf_warm") == rows("sim_ivf_topk"))
    assert(rows("sim_ivf_warm").nonEmpty)
  }

  test("dedup_semantic_apply keeps exactly the min-id per cosine component") {
    // independent check: mine the pairs with the audit query, close them
    // transitively with a driver-side union-find (tiny at sf0.001), and
    // the applied query must keep all ids minus each component's non-min
    val pairs = graft.queries.Ext.all("dedup_embedding")(spark, sf0001)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect()
    val allIds = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id")).as[Long].collect().toSet
    val root = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = root.getOrElse(x, x)
      if (p == x) x else { val r = find(p); root(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) root(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = allIds.filter(id => find(id) != id)
    val kept = graft.queries.Ext.all("dedup_semantic_apply")(spark, sf0001)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(losers.nonEmpty) // the corpus must actually exercise the drop
    assert(kept == allIds -- losers)
  }

  test("cosinePairs respects blocking and threshold") {
    val v = Seq(
      (1L, Seq(1.0f, 0.0f), 0L),
      (2L, Seq(0.99f, 0.01f), 0L),
      (3L, Seq(1.0f, 0.0f), 1L)) // same direction, different block
      .toDF("vec_id", "embedding", "block")
    val pairs = Similarity.cosinePairs(v, 0.9)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
