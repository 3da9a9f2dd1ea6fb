package graft.queries

import graft.SparkSpec

/** Pins the cross-process contract of [[Ext.persistentIndex]] (round-5
  * verdict #4): built once, reused from disk with NO rebuild, readable by
  * a process that never built it, retired on a params change. */
class PersistentIndexSpec extends SparkSpec {
  import sqlImplicits._

  private def root(what: String, key: String, params: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key|$params".getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    System.getProperty("java.io.tmpdir") + s"/graft_index_${what}_$digest"
  }

  test("index builds once and later calls read the published generation") {
    val key = s"/spec/corpus_${System.nanoTime()}" // identity only, never read
    var builds = 0
    def call(params: String) =
      Ext.persistentIndex(spark, "spec", key, params) {
        builds += 1
        Seq((1L, "aa"), (2L, "bb")).toDF("id", "s")
      }
    try {
      val first = call("v1").collect().map(_.toSeq).toSet
      assert(builds == 1)
      assert(call("v1").collect().map(_.toSeq).toSet == first)
      assert(builds == 1, "re-invocation must NOT rebuild — the no-restage path")
      // the published path carries no per-JVM component: a later process
      // computes the identical path and takes the same read-only branch
      assert(!root("spec", key, "v1").contains(graft.core.Tmp.jvmTag))
      // a params change retires the stale generation and rebuilds
      call("v2").collect(): Unit
      assert(builds == 2)
    } finally Seq("v1", "v2").foreach(p =>
      graft.core.Tmp.deleteRecursively(root("spec", key, p)))
  }

  test("an index published by a prior process is read, never rebuilt") {
    val key = s"/spec/corpus_${System.nanoTime()}"
    val r = root("spec2", key, "v1")
    try {
      // forge the prior process: data parquet first, manifest last —
      // exactly the publish order persistentIndex guarantees via its
      // build-then-atomic-rename
      Seq((7L, "prior")).toDF("id", "s").write.parquet(s"$r/data")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(r, "_graft_manifest"), "v1"): Unit
      var builds = 0
      val got = Ext.persistentIndex(spark, "spec2", key, "v1") {
        builds += 1
        Seq((0L, "mine")).toDF("id", "s")
      }.collect().map(_.toSeq).toSet
      assert(builds == 0, "a published generation from another process must be used as-is")
      assert(got == Set(Seq(7L, "prior")))
    } finally graft.core.Tmp.deleteRecursively(r)
  }

  test("a changed source retires the generation in place (same root)") {
    // caught live at the sf1 probe: a regenerated corpus at the SAME
    // path served a stale index whose doc ids no longer existed — the
    // manifest now folds in a (name,len,mtime) fingerprint of the source
    val key = s"/spec/corpus_${System.nanoTime()}"
    val srcDir = java.nio.file.Files.createTempDirectory("pidx_src").toFile
    val src = new java.io.File(srcDir, "t.txt")
    try {
      java.nio.file.Files.writeString(src.toPath, "gen one"): Unit
      var builds = 0
      def call() = Ext.persistentIndex(spark, "spec3", key, "v1",
          sourcePath = srcDir.toString) {
        builds += 1
        Seq((builds.toLong, "x")).toDF("id", "s")
      }.collect().map(_.getLong(0)).toSeq
      assert(call() == Seq(1L) && call() == Seq(1L) && builds == 1)
      // touch the source: longer content AND a bumped mtime (mtime alone
      // can be too coarse within one test's clock resolution)
      java.nio.file.Files.writeString(src.toPath, "generation two"): Unit
      assert(src.setLastModified(src.lastModified() + 2000))
      assert(call() == Seq(2L), "stale generation must retire when the source changes")
      assert(builds == 2)
    } finally {
      graft.core.Tmp.deleteRecursively(root("spec3", key, "v1"))
      graft.core.Tmp.deleteRecursively(srcDir.toString)
    }
  }

  test("promoted pruned100 index: cross-process root, fingerprinted manifest, no rebuild") {
    // round-6 verdict #2: the whole dedup ladder (not just sh3_old) now
    // publishes cross-process. Retire any published generations, rebuild
    // through a registered consumer, then pin (a) the manifest carries
    // the source fingerprint, (b) the root is JVM-tag-free, (c) a
    // re-access reads the published files instead of rebuilding.
    val roots = Seq(
      Ext.indexRoot("pruned100", sf001, Ext.Pruned100Params),
      Ext.indexRoot("pairs08", sf001, Ext.Pairs08Params))
    roots.foreach(graft.core.Tmp.deleteRecursively)
    Ext.all("dedup_ngram_jaccard")(spark, sf001).count(): Unit
    val root = roots.head
    assert(!root.contains(graft.core.Tmp.jvmTag))
    val manifest = java.nio.file.Paths.get(root, "_graft_manifest")
    assert(java.nio.file.Files.exists(manifest))
    assert(java.nio.file.Files.readString(manifest) ==
      s"${Ext.Pruned100Params}|src=${Ext.sourceFingerprint(s"$sf001/documents.parquet")}")
    def dataState = new java.io.File(root, "data").listFiles()
      .map(f => (f.getName, f.lastModified, f.length)).toSet
    val before = dataState
    Ext.all("dedup_ngram_jaccard")(spark, sf001).count(): Unit
    assert(dataState == before,
      "re-access must read the published generation, not rebuild")
  }

  test("dedup_incremental probes the persistent index and matches the staged-era result") {
    // the old semantics: full-corpus-pruned shingles, split, pairs at >=0.5
    val sh = graft.ext.Dedup.pruneHot(
      graft.ext.Dedup.shingleRows(
        graft.core.Tables.load(spark, sf001, "documents")
          .withColumn("toks", graft.ext.Text.tokens(org.apache.spark.sql.functions.col("text")))
          .selectExpr("doc_id AS id", "toks"), 3),
      Ext.JaccardMaxDocFreq)
    val expected = graft.ext.Dedup.jaccardPairsBetween(
        sh.filter("id % 10 = 0"), sh.filter("id % 10 != 0"),
        minJaccard = 0.5, maxDocFreq = 0)
      .orderBy("new_id", "old_id").collect().map(_.toSeq)
    val got = Ext.all("dedup_incremental")(spark, sf001)
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.sameElements(expected))
  }
}
