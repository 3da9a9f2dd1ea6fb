package graft.queries

/** Independent reference implementations of the two sketch pipelines the
  * driver gate could not mirror in SQL (`dedup_minhash_lsh`,
  * `dedup_simhash`) — the BpeRef pattern: a SECOND implementation of the
  * published algorithms (xxHash64 from the public reference spec,
  * FNV-1a/SimHash from theirs), sharing no mechanics with the engine's
  * codegen expressions, used both as a spec twin and as the source of
  * the captured literal oracles (`CaptureSketches`).
  *
  * Deliberate independence notes:
  *  - XXH64 here is written from the public xxHash specification
  *    (Collet's reference constants and round structure); the engine
  *    path is Spark's own `xxhash64` expression.
  *  - MinHash banding here blocks on the band VALUE tuples; the engine
  *    blocks on `hash(slice(sig, …))` (Murmur3 of the band) — equal
  *    band values imply equal hashes, so the two agree unless a Murmur3
  *    band collision manufactures an extra candidate; the capture and
  *    the spec twin assert full equality, so a collision would surface
  *    as a diff, not silently.
  *  - SimHash banding is bit arithmetic in both, but this side uses
  *    plain collections while the engine runs a codegen expression +
  *    relational self-join.
  */
object SketchRef {

  // ----- xxHash64, from the public reference spec ------------------------

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  def hashInt(i: Int, seed: Long): Long = {
    var hash = seed + P5 + 4L
    hash ^= (i & 0xffffffffL) * P1
    hash = rotl(hash, 23) * P2 + P3
    fmix(hash)
  }

  private def readLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  private def readIntLE(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)

  private def mergeRound(h: Long, v: Long): Long =
    ((h ^ (rotl(v * P2, 31) * P1)) * P1) + P4

  def hashBytes(b: Array[Byte], seed: Long): Long = {
    val n = b.length
    var i = 0
    var hash = 0L
    if (n >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2
      var v3 = seed; var v4 = seed - P1
      while (i + 32 <= n) {
        v1 = rotl(v1 + readLongLE(b, i) * P2, 31) * P1
        v2 = rotl(v2 + readLongLE(b, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + readLongLE(b, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + readLongLE(b, i + 24) * P2, 31) * P1
        i += 32
      }
      hash = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      hash = mergeRound(hash, v1); hash = mergeRound(hash, v2)
      hash = mergeRound(hash, v3); hash = mergeRound(hash, v4)
    } else hash = seed + P5
    hash += n
    while (i + 8 <= n) {
      hash ^= rotl(readLongLE(b, i) * P2, 31) * P1
      hash = rotl(hash, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= n) {
      hash ^= (readIntLE(b, i) & 0xffffffffL) * P1
      hash = rotl(hash, 23) * P2 + P3
      i += 4
    }
    while (i < n) {
      hash ^= (b(i) & 0xffL) * P5
      hash = rotl(hash, 11) * P1
      i += 1
    }
    fmix(hash)
  }

  /** Spark's `xxhash64(lit(i), s)` contract: children fold left with the
    * accumulated hash as the next seed, starting from seed 42. */
  def xxIntString(i: Int, s: String): Long =
    hashBytes(s.getBytes("UTF-8"), hashInt(i, 42L))

  // ----- the engine's tokenize/shingle contract ---------------------------

  def tokens(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)

  def shingles(toks: Array[String], k: Int): Set[String] =
    if (toks.length < k) Set.empty
    else toks.sliding(k).map(_.mkString(" ")).toSet

  // ----- MinHash(32) + LSH(8 bands × 4 rows) ------------------------------

  def minhashLshPairs(
      docs: Seq[(Long, String)],
      numHashes: Int = 32,
      bands: Int = 8,
      minEst: Double = 0.5): Seq[(Long, Long, Double)] = {
    val rows = numHashes / bands
    val sigs: Seq[(Long, Array[Long])] = docs.flatMap { case (id, text) =>
      val sh = shingles(tokens(text), 3)
      if (sh.isEmpty) None
      else Some(id -> Array.tabulate(numHashes)(i =>
        sh.iterator.map(s => xxIntString(i, s)).min))
    }
    val byBand = scala.collection.mutable.Map[(Int, Seq[Long]), List[Long]]()
    for ((id, sig) <- sigs; b <- 0 until bands) {
      val key = (b, sig.slice(b * rows, (b + 1) * rows).toSeq)
      byBand(key) = id :: byBand.getOrElse(key, Nil)
    }
    val sigOf = sigs.toMap
    val cand = scala.collection.mutable.Set[(Long, Long)]()
    for ((_, ids) <- byBand; sorted = ids.sorted;
         i <- sorted.indices; j <- (i + 1) until sorted.length)
      cand += ((sorted(i), sorted(j)))
    cand.toSeq.map { case (a, b) =>
      val (sa, sb) = (sigOf(a), sigOf(b))
      val m = (0 until 32).count(i => sa(i) == sb(i))
      (a, b, m / 32.0)
    }.filter(_._3 >= minEst).sortBy(p => (p._1, p._2))
  }

  // ----- SimHash(64) + 16-bit band blocking -------------------------------

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

  def simhash64(toks: Seq[String]): Long = {
    val acc = new Array[Long](64)
    toks.groupBy(identity).foreach { case (t, g) =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += g.size else acc(b) -= g.size
        b += 1
      }
    }
    (0 until 64).foldLeft(0L)((out, b) =>
      if (acc(b) > 0) out | (1L << b) else out)
  }

  def simhashPairs(
      docs: Seq[(Long, String)],
      maxHamming: Int = 10): Seq[(Long, Long, Int)] = {
    val sk = docs.map { case (id, text) =>
      id -> simhash64(tokens(text).toSeq)
    }
    val byBand = scala.collection.mutable.Map[(Int, Long), List[Long]]()
    for ((id, h) <- sk; b <- 0 until 4)
      byBand((b, (h >>> (b * 16)) & 0xffffL)) =
        id :: byBand.getOrElse((b, (h >>> (b * 16)) & 0xffffL), Nil)
    val hOf = sk.toMap
    val cand = scala.collection.mutable.Set[(Long, Long)]()
    for ((_, ids) <- byBand; sorted = ids.sorted;
         i <- sorted.indices; j <- (i + 1) until sorted.length)
      cand += ((sorted(i), sorted(j)))
    cand.toSeq
      .map { case (a, b) =>
        (a, b, java.lang.Long.bitCount(hOf(a) ^ hOf(b)))
      }
      .filter(_._3 <= maxHamming)
      .sortBy(p => (p._1, p._2))
  }
}
