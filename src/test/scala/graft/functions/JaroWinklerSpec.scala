package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Textbook values and corner cases of the scalar — the query gate
  * (`join_fuzzy_jw` vs DuckDB's `jaro_winkler_similarity`) covers the
  * name corpus; this pins the classic published examples and the
  * degenerate shapes the corpus never hits. */
class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String) = JaroWinkler.sim(a, b)

  test("classic published pairs") {
    // MARTHA/MARHTA: jaro 0.944..., prefix 3 → 0.9611...
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    // DIXON/DICKSONX: jaro 0.7666..., prefix 2 → 0.8133...
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // JELLYFISH/SMELLYFISH
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
  }

  test("degenerate shapes") {
    assert(jw("", "") == 1.0) // equal strings, even empty
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("a", "b") == 0.0) // window ⌊1/2⌋−1 < 0 → no matches
    assert(jw("ab", "ba") == 0.0 ||
      jw("ab", "ba") > 0.0) // window 0: only diagonal matches
    assert(jw("ab", "ba") == 0.0, "len-2 transposition is OUT of window 0")
  }

  test("no Winkler boost at or below the 0.7 jaro threshold") {
    // a/b match (prefix 2), nothing else: jaro = (2/8 + 2/8 + 1)/3 = 0.5
    // — rapidfuzz/DuckDB leave jaro <= 0.7 UNboosted; the boosted value
    // would be 0.6
    assert(jw("abcdefgh", "abzyxwvu") == 0.5)
  }

  test("symmetry and bounds on random-ish strings") {
    val words = Seq("aquamarine", "chartreuse", "turquoise", "aqumarine",
      "chartruese", "aa", "aab", "abab", "x")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of range: $a/$b -> $s")
      assert(s == jw(b, a), s"asymmetric: $a/$b")
      if (a == b) assert(s == 1.0)
    }
  }
}
