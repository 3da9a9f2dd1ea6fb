package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import sqlImplicits._

  private def one(text: String) =
    Seq(text).toDF("text").select(Text.tokens(col("text")).as("toks"))

  test("tokens: splits on spaces, drops empties") {
    val toks = one("a  b c ").select("toks").as[Seq[String]].head()
    assert(toks == Seq("a", "b", "c"))
  }

  test("subword tokens: splits words, digits, marks") {
    val toks = Seq("Hello world42!").toDF("text")
      .select(Text.subwordTokens(col("text")).as("t")).as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "42", "!"))
  }

  test("langId: picks dominant stopword language; und when no hits") {
    val df = Seq(
      ("the cat and the dog of it", "en"),
      ("der hund und die katze ist", "de"),
      ("le chat et la chienne est", "fr"),
      ("xyzzy plugh", "und")).toDF("text", "expected")
      .withColumn("pred", Text.langId(Text.tokens(col("text"))))
    assert(df.filter(col("pred") =!= col("expected")).count() == 0)
  }

  test("fingerprint: order-aware, deterministic, in range") {
    val fp = Seq("a b c", "c b a", "a b c").toDF("text")
      .select(Text.fingerprint(Text.tokens(col("text"))).as("fp"))
      .as[Long].collect()
    assert(fp(0) == fp(2), "same text, same fingerprint")
    assert(fp(0) != fp(1), "order must matter")
    assert(fp.forall(v => v >= 0 && v < Text.FingerprintMod))
  }

  test("quality: saturates and stays within [0,1]") {
    val q = Seq(
      "the of and to is in it a the of", // all stopwords
      "qq ww ee rr").toDF("text")
      .select(Text.qualityScore(Text.tokens(col("text"))).as("q"))
      .as[Double].collect()
    assert(q(0) == 0.5 + 10 * 0.005)
    assert(q(1) == 4 * 0.005)
  }

  test("decontaminate-apply: survivors = corpus − benchmark − contaminated, disjoint and complete") {
    def ids(name: String) =
      graft.queries.Ext.all(name)(spark, sf0001)
        .select(col("doc_id")).as[Long].collect().toSet
    val contaminated = ids("text_contamination")
    val survivors = ids("text_decontaminate")
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id")).as[Long].collect().toSet
    val benchmark = corpus.filter(_ % 97 == 0)
    assert((survivors & contaminated).isEmpty, "a contaminated doc survived")
    assert((survivors & benchmark).isEmpty, "a held-out benchmark doc survived")
    assert(survivors ++ contaminated ++ benchmark == corpus,
      "filter dropped docs that are neither contaminated nor benchmark")
    assert(survivors.nonEmpty && contaminated.nonEmpty)
  }

  test("text_chunk_overlap: full coverage, correct overlap geometry, content digests check out") {
    val chunks = graft.queries.Ext.all("text_chunk_overlap")(spark, sf0001)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tok"), col("chunk_md5"))
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("toks")).as[(Long, Seq[String])].collect()
    assert(chunks.nonEmpty)
    docs.filter(_._2.nonEmpty).foreach { case (id, toks) =>
      val cs = chunks(id).sortBy(_._2)
      // geometry: starts advance by the stride, every token covered,
      // tail length exact
      assert(cs.head._3 == 0L)
      assert(cs.map(_._3) sameElements cs.indices.map(_ * 48L))
      assert(cs.last._3 + cs.last._4 == toks.length.toLong, s"doc $id tail")
      // a window is full unless it reaches past the doc end (with
      // stride < window the last FEW windows clip, not just one)
      assert(cs.forall(c => c._4 == math.min(64L, toks.length - c._3)))
      // content: each digest is md5 of the actual window
      cs.foreach { case (_, _, start, n, digest) =>
        val want = java.security.MessageDigest.getInstance("MD5")
          .digest(toks.slice(start.toInt, start.toInt + 64).mkString(" ")
            .getBytes("UTF-8")).map(b => f"$b%02x").mkString
        assert(digest == want, s"doc $id chunk at $start")
        assert(n == math.min(64L, toks.length - start))
      }
      // docs longer than one window must actually overlap
      if (toks.length > 64) assert(cs.length >= 2)
    }
  }

  test("text_keywords_tfidf: rarer tokens outrank common ones; exactly top-3 per doc") {
    val rows = graft.queries.Ext.textKeywordsTfidf(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach { ks =>
      val sorted = ks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      // scores non-increasing down the ranks; rank order is (score desc, tok asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 > b._6 || (a._6 == b._6 && a._3 < b._3))
        case _ =>
      }
    }
    // score recomputes as tf*N/df
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    rows.foreach { case (_, _, _, tf, df, score) =>
      val want = BigDecimal(tf * n / df.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == want)
    }
  }

  test("sample_weighted_tokens: exactly one doc per grid step, interval contains its grid point") {
    val rows = graft.queries.Ext.sampleWeightedTokens(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(graft.ext.Text.tokens(col("text")).as("t"))
      .agg(sum(size(col("t")))).collect()(0).getLong(0)
    // each selected doc owns its OWN grid step (doc length < step here,
    // so no doc can span two points), and the point sits in its interval
    assert(rows.map(_._4).distinct.length == rows.length)
    rows.foreach { case (_, n, cum, grid) =>
      val point = grid * 1024L
      assert(point >= cum && point < cum + n, "grid point inside the doc's interval")
    }
    // systematic on the token axis: one doc per full step of corpus mass
    assert(math.abs(rows.length - total / 1024.0) <= 2)
  }

  test("text_dup_span_share: equals a brute-force positional-shingle count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val positional = docs.flatMap { case (id, toks) =>
      (0 to toks.length - 3).map(i => (id, toks.slice(i, i + 3).mkString(" ")))
    }
    val occ = positional.groupBy(_._2).view.mapValues(_.length).toMap
    val want = positional.groupBy(_._1).map { case (id, ps) =>
      id -> ((ps.length.toLong, ps.count(p => occ(p._2) >= 2).toLong))
    }
    val got = graft.queries.Ext.textDupSpanShare(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        assert(r.getDouble(3) ==
          BigDecimal(r.getLong(2).toDouble / r.getLong(1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))
      }.toMap
    assert(got == want)
    // the audit must actually flag something in a corpus with known dups
    assert(got.values.exists(_._2 > 0))
  }
}
