package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")).toDF("doc_id", "text")

  private def toked =
    docs.select(col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))

  test("wordShingles: count, order-awareness, short-doc empty") {
    val sh = toked.withColumn("n", size(Dedup.wordShingles(col("toks"), 3)))
    assert(sh.filter(col("id") === 1).select("n").as[Int].head() == 7)
    assert(sh.filter(col("id") === 5).select("n").as[Int].head() == 0)
  }

  test("shingleRows agrees with the array form") {
    val fromRows = Dedup.shingleRows(toked, 3)
      .as[(Long, String)].collect().toSet
    val fromArrays = docs.select(col("doc_id").as("id"),
        explode(Dedup.wordShingles(Text.tokens(col("text")), 3)).as("s"))
      .as[(Long, String)].collect().toSet
    assert(fromRows == fromArrays)
    assert(fromRows.exists(_._1 == 1L) && !fromRows.exists(_._1 == 5L))
  }

  test("containmentPairs: a verbatim-quoted subset scores 1.0 where jaccard stays low") {
    // doc 7 is a 5-token prefix of doc 6 → every doc-7 shingle is in
    // doc 6: containment 1.0; jaccard = 3/14 ≈ 0.21
    val quoted = Seq(
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
      (7L, "alpha beta gamma delta epsilon"),
      (8L, "unrelated content with other words")).toDF("doc_id", "text")
    val tok = quoted.select(col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))
    val pairs = Dedup.containmentPairs(Dedup.shingleRows(tok, 3), minContainPct = 90)
      .select(col("id1"), col("id2"), col("containment"), col("c"), col("n1"), col("n2"))
      .as[(Long, Long, Double, Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((6L, 7L, 1.0, 3L, 12L, 3L)))
    // the same pair is invisible to the symmetric miner at 0.8
    assert(Dedup.jaccardPairs(tok, k = 3, minJaccard = 0.8).isEmpty)
  }

  test("containmentPairs: threshold is integer-exact at the boundary") {
    // c=1 shared shingle, min set size 5 → containment exactly 0.2:
    // kept at 20 %, dropped at 21 %
    val docs2 = Seq(
      (1L, "a b c x1 x2 x3 x4"), // shingles: "a b c","b c x1",... n=5
      (2L, "a b c y1 y2 y3 y4")).toDF("doc_id", "text")
    val tok = docs2.select(col("doc_id").as("id"), Text.tokens(col("text")).as("toks"))
    val rows = Dedup.shingleRows(tok, 3)
    assert(Dedup.containmentPairs(rows, minContainPct = 20).count() == 1)
    assert(Dedup.containmentPairs(rows, minContainPct = 21).count() == 0)
  }

  test("exact: groups identical texts under the min-id keeper") {
    val r = Dedup.exact(docs, col("doc_id"), col("text"))
      .orderBy(col("keeper_id"))
      .select(col("keeper_id"), col("n_copies")).as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
  }

  test("jaccardPairs: finds the near-dup pair with correct jaccard") {
    val pairs = Dedup.jaccardPairs(toked, k = 3, minJaccard = 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    // docs 1/2 and 1/4 and 2/4: 1 vs 4 identical (jac 1.0); 1 vs 2 share
    // 6 of 8 distinct shingles (6/(7+7-6)=0.75)
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0)
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 0.75)
  }

  test("jaccardPairs: maxDocFreq prunes ubiquitous shingles") {
    // shingle present in all three docs is pruned at maxDocFreq=2
    val d = Seq(
      (1L, Seq("x y z", "a b c")),
      (2L, Seq("x y z", "a b c")),
      (3L, Seq("x y z", "q r s"))).toDF("id", "shingles")
      .select(col("id"), explode(col("shingles")).as("s"))
    val withPrune = Dedup.jaccardPairsFromRows(d, 0.0, maxDocFreq = 2)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(withPrune == Set((1L, 2L))) // only the a-b-c evidence remains
  }

  test("hashShingles mode mines the same pairs as the string path") {
    val str = Dedup.jaccardPairs(toked, k = 3, minJaccard = 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val hashed = Dedup.jaccardPairs(toked, k = 3, minJaccard = 0.5,
        hashShingles = true)
      .select(col("id1"), col("id2"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(hashed == str)
  }

  test("dedup_lines_hashed reproduces the string-keyed path bit-for-bit") {
    def rows(name: String) =
      graft.queries.Ext.all(name)(spark, sf0001).collect().toSeq.map(_.toSeq)
    val str = rows("dedup_lines")
    assert(str.nonEmpty && rows("dedup_lines_hashed") == str)
  }

  test("minhashCandidates: exact dups always collide; est_jaccard = 1") {
    val cand = Dedup.minhashCandidates(toked, k = 3, numHashes = 32, bands = 8)
    val d14 = cand.filter(col("id1") === 1 && col("id2") === 4)
      .select("est_jaccard").as[Double].collect()
    assert(d14.sameElements(Array(1.0)))
    // disjoint docs 3 and 5(empty) never pair with est 1.0
    assert(cand.filter(col("id2") === 5).count() == 0)
  }

  test("minhash est_jaccard tracks the true jaccard on controlled overlap") {
    // shingle sets built directly: doc 0 = {s0..s39}; doc j replaces j
    // elements with unique ones, so true J(0, j) = (40-j)/(40+j).
    // 32 hashes give σ ≈ 0.09 — the estimate must land near the truth
    // (this is the accuracy story behind the rows-only dedup_minhash_lsh
    // gate: the sketch is deterministic, so these bounds are exact
    // regression pins, not flaky statistics).
    val rows = (0 to 39).map(i => (0L, s"s$i")) ++
      Seq(2, 4, 6).flatMap { j =>
        (0 to 39).map(i =>
          (j.toLong, if (i < j) s"uniq${j}_$i" else s"s$i"))
      }
    val sh = rows.toDF("id", "s")
    val cand = Dedup.minhashCandidatesFromRows(sh, numHashes = 32, bands = 8)
      .filter(col("id1") === 0)
      .select(col("id2"), col("est_jaccard")).as[(Long, Double)]
      .collect().toMap
    val errs = Seq(2, 4, 6).flatMap { j =>
      val truth = (40.0 - j) / (40.0 + j)
      cand.get(j.toLong).map(est => math.abs(est - truth))
    }
    assert(errs.nonEmpty, "no high-overlap candidate found at all")
    assert(errs.forall(_ <= 0.25), s"estimates too far off: $errs")
    assert(errs.sum / errs.size <= 0.12, s"mean error too high: $errs")
  }

  test("verifyJaccardPairs: exact values on candidates; duplicate candidates don't inflate") {
    val sh = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),
      (2L, "a"), (2L, "b"), (2L, "c"), (2L, "x"),  // J(1,2) = 3/5
      (3L, "p"), (3L, "q"))
      .toDF("id", "s")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    def run(c: org.apache.spark.sql.DataFrame) =
      Dedup.verifyJaccardPairs(sh, c, minJaccard = 0.5)
        .select("id1", "id2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    val exact = run(cands)
    assert(exact == Set((1L, 2L, 0.6))) // (1,3) disjoint → filtered
    // the same pair proposed twice (e.g. two LSH bands) must not
    // double-count shared shingles (J would become 6/(8-6) > 1)
    val dup = run(cands.union(cands))
    assert(dup == exact)
  }

  test("simhash: identical texts give identical sketch; hamming pairs found") {
    val sk = Dedup.withSimhash(docs, col("doc_id"), col("text"))
    val m = sk.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(4L))
    assert(m(1L) != m(3L))
    val pairs = Dedup.simhashPairs(sk, maxHamming = 10)
      .select(col("id1"), col("id2"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1 && p._2 == 4 && p._3 == 0))
  }

  test("fnv1a64 is stable") {
    assert(Dedup.fnv1a64("") == 0xcbf29ce484222325L)
    assert(Dedup.fnv1a64("a") == 0xaf63dc4c8601ec8cL)
  }

  test("native SimHash64 expression == reference simhash64 composition") {
    // parity pin for the expression that replaced the typed map: same
    // split-on-space tokenization (empties skipped), same FNV-1a over
    // UTF-16 units, same multiset weighting
    val texts = Seq("the cat sat", "the  cat  sat ", "", "   ",
      "a", "ünïcode tökens reposé", "x y z x y z x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.withSimhash(df, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = Dedup.simhash64(t.split(" ").filter(_.nonEmpty).toSeq)
      assert(got(i.toLong) == want, s"mismatch for '$t'")
    }
  }

  test("withSimhash keeps the id type generic (string ids)") {
    val df = Seq(("doc-a", "hello world"), ("doc-b", "hello world"))
      .toDF("doc_id", "text")
    val sk = Dedup.withSimhash(df, col("doc_id"), col("text"))
    assert(sk.schema("id").dataType.typeName == "string")
    val m = sk.as[(String, Long)].collect().toMap
    assert(m("doc-a") == m("doc-b"))
  }
}
