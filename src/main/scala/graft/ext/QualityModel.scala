package graft.ext

/** Hashed bag-of-words LINEAR quality model — the classifier-style
  * scorer every production curation pipeline runs between rule filters
  * and mixing (the public fastText supervised shape: hash each token
  * into B buckets, sum the bucket weights, threshold the score; Joulin
  * et al. 2016). The weights here are a FROZEN model table — integer
  * weights, so the score is an exact integer fold and the apply is
  * hash-verifiable cross-engine with zero tolerance (a float model
  * would gate the same way with an epsilon).
  *
  * Token → bucket uses the repo's one cross-engine hash (the 60-bit md5
  * prefix, ExtOracle parity rule) mod [[B]]; the model is deliberately
  * driver-sized (B·4 bytes) and rides a plain literal array into the
  * scan — the 100 TB apply is scan-local with ZERO shuffle, exactly like
  * the rule-based filter it complements. A real 2M-bucket fastText table
  * would broadcast instead of inlining; the plan shape is otherwise
  * identical.
  */
object QualityModel {

  /** Hash buckets. Small on purpose (the table is embedded verbatim in
    * the DuckDB oracle as a literal list — the `sim_lsh_topk`
    * hyperplane precedent); the bucketing math is B-independent. */
  val B = 256

  /** Intercept term of the linear model. */
  val Bias = 7L

  /** Keep threshold: keep ⟺ score > 0. */
  val Threshold = 0L

  /** The frozen weight table: a fixed-seed LCG walk mapped to
    * [-20, 20] — deterministic, so the spec's independent recompute and
    * the oracle's literal list are all the same 256 integers. */
  val weights: IndexedSeq[Int] = {
    var x = 0x5DEECE66DL
    IndexedSeq.fill(B) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(x >>> 16, 41L) - 20L).toInt
    }
  }

  /** Plain-JVM reference scorer (one token stream → score) — the spec
    * twin and the per-row contract the Column expression must match:
    * bias + Σ weights[md5_60(tok) mod B], token multiplicity counted. */
  def scoreTokens(toks: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    toks.foldLeft(Bias) { (acc, t) =>
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val h60 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      acc + weights((h60 % B).toInt)
    }
  }
}
