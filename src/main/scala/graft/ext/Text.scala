package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kit for large-scale training-data pipelines: tokenization,
  * quality scoring, language identification, and document fingerprinting.
  *
  * All ops are pure `Column` compositions of built-in functions — no UDFs —
  * so they stay inside whole-stage codegen and scan-vectorization at 100 TB.
  * Each has an exact ANSI-SQL twin (see `queries.ExtOracle`) so the DuckDB
  * oracle verifies semantics bit-for-bit.
  */
object Text {

  /** Whitespace tokenizer: split on single spaces, drop empties. Matches
    * `list_filter(string_split(text,' '), x -> x <> '')` in the oracle. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish subword split: lowercase word chunks, digit runs, or single
    * non-alnum marks — the common pre-tokenizer regex shape. */
  def subwordTokens(text: Column): Column =
    filter(
      split(regexp_replace(lower(text), "([a-z]+|[0-9]+|[^a-z0-9\\s])", " $1 "),
        "\\s+"),
      t => t =!= "")

  /** Exact token count without materializing the token array (cheaper scan
    * at scale: one pass, no array alloc). */
  def tokenCount(text: Column): Column = size(tokens(text))

  // --- language ID -------------------------------------------------------

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic.
    * Deliberately small: language ID at pipeline scale is a cheap signal,
    * not a classifier — callers with real corpora extend the lists. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pas"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "no"))

  /** Number of tokens found in `words` (multiset hit count). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Predicted language: argmax of stopword hit counts, ties and all-zero
    * resolved to "und" / lexicographically-first max. Deterministic.
    *
    * All per-language counts accumulate in ONE fold over the tokens. The
    * obvious per-language `hitCount` composition re-evaluates its
    * interpreted HOF once per reference (~8 full array scans after
    * `greatest` + the pick chain — Catalyst does not CSE interpreted
    * lambdas), which made lang-ID cost ~20× a comparable single-pass stat. */
  def langId(toks: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val counts = aggregate(toks,
      array(langs.map(_ => lit(0)): _*),
      (acc, t) => array(langs.zipWithIndex.map { case (l, i) =>
        element_at(acc, i + 1) +
          when(t.isin(stopwords(l).map(lit): _*), 1).otherwise(0)
      }: _*))
    val best = array_max(counts)
    when(best === 0, lit("und"))
      .otherwise(element_at(array(langs.map(lit): _*),
        array_position(counts, best).cast("int")))
  }

  // --- quality -----------------------------------------------------------

  /** Composite document quality score in [0,1]:
    * 0.5 × english-stopword ratio signal + 0.5 × length signal (saturating
    * at 100 tokens). The standard cheap C4/Gopher-style heuristic shape. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks)
    val stopRatio = hitCount(toks, stopwords("en")) / n.cast("double")
    val lenSignal = least(n, lit(100)).cast("double") * 0.005
    round(stopRatio * 0.5 + lenSignal, 6)
  }

  // --- fingerprinting ----------------------------------------------------

  /** Rolling polynomial hash over the token stream, mod 1e9+7: order-aware
    * document fingerprint (same bag of words, different order → different
    * fingerprint — complements order-blind MinHash). Per-token value is the
    * first 60 bits of md5 so the oracle can reproduce it exactly
    * (`CAST('0x'||substr(md5(t),1,15) AS BIGINT)`); mod keeps every
    * intermediate below 2^63 under ANSI overflow checking. */
  val FingerprintMod = 1000000007L

  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long") % FingerprintMod

  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * 31L + tokenHash(t)) % FingerprintMod)

  // --- reproducible sampling / splitting ---------------------------------

  /** Deterministic content-hash bucket in [0, buckets): the reproducible
    * sampling/splitting primitive — rerunning over a grown corpus keeps
    * every previously-sampled document in the same bucket (unlike
    * rand()/sampleBy, which reshuffle on every change). md5-based so any
    * engine can reproduce it. */
  def hashBucket(c: Column, buckets: Int): Column =
    (conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
      % buckets).cast("int")

  /** Train/val/test split label from a key column: 0–7 → train,
    * 8 → val, 9 → test (the standard 80/10/10 content-stable split). */
  def splitLabel(key: Column): Column = {
    val b = hashBucket(key, 10)
    when(b <= 7, "train").when(b === 8, "val").otherwise("test")
  }

  // --- PII scrubbing / link extraction -----------------------------------

  /** Redaction rules `(tag, pattern, replacement)`, applied in order.
    * Patterns stay inside the RE2 ∩ java.util.regex common subset (no
    * backreferences, no lookaround, explicit classes only) so the DuckDB
    * oracle evaluates the IDENTICAL pattern strings — regex-engine parity
    * is a stated test-strategy constraint (SURVEY §5), not an accident.
    * Conservative by design: a corpus scrubber prefers misses over
    * mangling prose; real deployments extend the list. */
  val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"))

  /** Count of matches of one PII rule (scan-local, codegen). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with every [[PiiRules]] match replaced by its tag, in rule
    * order (order matters only when patterns overlap; these don't on
    * well-formed text, and both engines apply the same order). */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (_, p, r)) => regexp_replace(c, p, r) }

  /** First capture group = domain of an http(s) URL; null when absent. */
  val UrlDomainPattern = "https?://([A-Za-z0-9.-]+)[/ ]"

  def urlDomain(text: Column): Column = {
    val d = regexp_extract(text, UrlDomainPattern, 1)
    when(d =!= "", d) // regexp_extract returns "" on no match; null is honest
  }
}
