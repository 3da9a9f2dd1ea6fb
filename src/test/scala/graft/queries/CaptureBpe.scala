// package graft.queries (not .tools): the Bpe* contract constants are
// private[queries] and the capture must read the exact values the
// engine trains with.
package graft.queries

/** Oracle-capture for `text_bpe_train` (run manually, test scope):
  * trains the INDEPENDENT reference trainer ([[graft.queries.BpeRef]] —
  * the Round9OpsSpec twin, symbol-vector mechanics) on the given
  * corpus's documents and prints the full merge table as a DuckDB
  * VALUES literal, which `ExtOracle` embeds as the driver-gate oracle
  * (the `pipeline_blindzone` digest precedent: the literal is derived
  * from the independent implementation, never from the engine under
  * test — the gate then cross-checks two implementations).
  *
  *   sbt "Test/runMain graft.queries.CaptureBpe /root/testdata/sf0.01"
  */
object CaptureBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").as[String].collect().toSeq
    val units = BpeRef.unitsFromTexts(
      texts, Ext.BpeChunkTokens, Ext.BpeSampleCap)
    val merges = BpeRef.refBpe(units,
      Ext.BpeTargetMerges, Ext.BpeBatchK, Ext.BpeCandPool)
    def lit(v: String) = "'" + v.replace("'", "''") + "'"
    val rows = merges.map { case (r, a, b, n) =>
      s"($r, ${lit(a)}, ${lit(b)}, $n)"
    }
    val sql =
      s"""SELECT CAST(merge_round AS INTEGER) AS merge_round, lhs, rhs,
         |       CAST(n AS BIGINT) AS n
         |FROM (VALUES
         |${rows.grouped(4).map(_.mkString(", ")).mkString(",\n")})
         |  AS t(merge_round, lhs, rhs, n)
         |ORDER BY merge_round""".stripMargin
    val out = java.nio.file.Paths.get("/tmp/bpe_oracle_capture.sql")
    java.nio.file.Files.write(out, sql.getBytes("UTF-8"))
    println(s"CAPTURED ${merges.length} merges -> $out")
    spark.stop()
  }
}
