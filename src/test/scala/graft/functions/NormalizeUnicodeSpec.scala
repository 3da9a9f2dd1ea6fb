package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeUnicodeSpec extends SparkSpec {
  import sqlImplicits._

  private def norm(c: Column, form: String): Column =
    org.apache.spark.sql.graft.Bridge.column(
      NormalizeUnicode(org.apache.spark.sql.graft.Bridge.expression(c), form))

  // decomposed, composed, compatibility, and plain-ASCII rows
  private val samples = Seq(
    "cafe\u0301",          // e + combining acute → é
    "a\u0301e\u0300o\u0302", // three combining pairs
    "café",           // already composed — fast path
    "ﬁle",            // LATIN SMALL LIGATURE FI (NFKC-only change)
    "plain ascii text",
    "")

  test("NFC composes decomposed sequences (value + codepoint length)") {
    val out = samples.toDF("s")
      .select(col("s"), norm(col("s"), "NFC").as("n"))
      .as[(String, String)].collect().toMap
    assert(out("cafe\u0301") == "café")
    assert(out("cafe\u0301").length == 4)
    assert(out("a\u0301e\u0300o\u0302") == "áèô")
    // NFC does NOT apply compatibility mappings — the ligature survives
    assert(out("ﬁle") == "ﬁle")
    assert(out("plain ascii text") == "plain ascii text")
    assert(out("") == "")
  }

  test("all four forms match java.text.Normalizer (codegen path)") {
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val out = samples.toDF("s")
        .select(col("s"), norm(col("s"), form).as("n"))
        .as[(String, String)].collect()
      out.foreach { case (s, n) =>
        assert(n == Normalizer.normalize(s, Normalizer.Form.valueOf(form)),
          s"$form diverges on ${s.codePoints().toArray.mkString(",")}")
      }
    }
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- samples; form <- Seq("NFC", "NFKC")) {
      val e = NormalizeUnicode(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(s)), form)
      assert(e.eval(null).toString ==
        Normalizer.normalize(s, Normalizer.Form.valueOf(form)))
    }
  }

  test("null-safe, and an unsupported form is rejected at construction") {
    val out = Seq[(java.lang.Long, String)]((1L, "a\u0301"), (2L, null))
      .toDF("id", "s")
      .select(col("id"), norm(col("s"), "NFC").as("n"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("á"))
    assert(out(2L).isEmpty)
    intercept[IllegalArgumentException] {
      NormalizeUnicode(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), "NFX")
    }
  }

  test("non-string input fails type check") {
    val e = NormalizeUnicode(
      org.apache.spark.sql.catalyst.expressions.Literal(42), "NFC")
    assert(!e.checkInputDataTypes().isSuccess)
  }
}
