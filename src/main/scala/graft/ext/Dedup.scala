package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication kit: exact, n-gram Jaccard (inverted index), MinHash+LSH,
  * and SimHash — the standard near-dup ladder for training-data pipelines.
  *
  * Scale design (the point of each variant):
  *  - exact: one hash-shuffle on a 16-byte digest — the cheapest pass, run
  *    it first to shrink the corpus before any near-dup work.
  *  - n-gram Jaccard via inverted index: shuffle is on *shingles*, so cost
  *    is Σ docFreq² per shingle, not corpus²; `maxDocFreq` prunes the hot
  *    shingles that would otherwise quadratically dominate (a stopword
  *    shingle in 10⁶ docs is never evidence of duplication anyway).
  *  - MinHash+LSH: candidate generation is linear in corpus size — banding
  *    turns "all pairs above s" into equi-join buckets; only candidates pay
  *    the signature compare. This is the 100 TB path.
  *  - SimHash: one 64-bit sketch per doc, pairs from 16-bit band buckets —
  *    cheapest near-dup signal when shingle sets are overkill.
  */
object Dedup {

  /** Distinct k-word shingles of the token array (order-aware n-grams).
    * Empty when the doc has fewer than k tokens. */
  def wordShingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup on content digest: one row per distinct text, keeping the
    * smallest id (deterministic keeper), with the copy count. */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(md5(text).as("text_md5"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** All unordered doc pairs with shingle-Jaccard ≥ `minJaccard`, found via
    * an inverted shingle index (join on shingle, never corpus×corpus).
    *
    * @param maxDocFreq drop shingles appearing in more than this many docs
    *                   (0 = keep all) — the skew guard at scale.
    * Input must carry (`id`, `shingles`) columns.
    */
  def jaccardPairs(
      docShingles: DataFrame,
      minJaccard: Double,
      maxDocFreq: Int = 0): DataFrame = {
    val sh0 = docShingles.select(col("id"), explode(col("shingles")).as("s"))
    val sh =
      if (maxDocFreq <= 0) sh0
      else {
        val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select(col("s"))
        sh0.join(broadcast(hot), Seq("s"), "left_anti")
      }
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard",
        round(col("c") / (col("n1") + col("n2") - col("c")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("c"), col("n1"), col("n2"), col("jaccard"))
  }

  // --- MinHash + LSH -----------------------------------------------------

  /** MinHash signature: element i = min over shingles of xxhash64(i, s).
    * Seeding by position gives `numHashes` independent-enough permutations
    * from one pass over the shingle array (no per-hash shuffle). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s => xxhash64(lit(i), s)))
    }: _*)

  /** LSH candidate pairs from banded minhash signatures, with the estimated
    * Jaccard (fraction of agreeing signature positions). Docs with empty
    * shingle sets never match (null signature elements are filtered).
    *
    * bands×rowsPerBand must equal the signature length; the (s-curve)
    * threshold is ≈ (1/bands)^(1/rowsPerBand).
    */
  def minhashCandidates(
      docShingles: DataFrame,
      numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val signed = docShingles
      .filter(size(col("shingles")) > 0)
      .select(col("id"), minhashSignature(col("shingles"), numHashes).as("sig"))
    val banded = signed.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .distinct()
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          b => b)) / lit(numHashes.toDouble), 6))
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  // --- SimHash -----------------------------------------------------------

  /** FNV-1a 64-bit string hash — self-contained, deterministic across JVMs;
    * used for SimHash token hashing (sketch-internal, no oracle needed). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash of a token multiset: bit b is set when the
    * count-weighted sum of per-token bit-b signs is positive. */
  def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Long](64)
    toks.groupBy(identity).foreach { case (t, g) =>
      val h = fnv1a64(t)
      val w = g.size.toLong
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Attach a `simhash` column. The sketch loop is genuinely per-row
    * imperative (64-lane bit accumulation), so a typed map is the honest
    * implementation; everything around it stays relational. */
  def withSimhash(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val ss = docs.sparkSession
    import ss.implicits._
    docs.select(id.cast("long").as("id"), text.as("text"))
      .as[(Long, String)]
      .map { case (i, t) =>
        (i, simhash64(t.split(" ").filter(_.nonEmpty).toSeq))
      }
      .toDF("id", "simhash")
  }

  /** Near-dup pairs by SimHash: block on 16-bit bands (any of 4 equal bands
    * makes a candidate — guarantees recall for hamming ≤ 3), then filter by
    * exact hamming distance. */
  def simhashPairs(sketches: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sketches.select(
      col("id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
