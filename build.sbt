ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpssbzdspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The forked JVM's stdout must pass through RAW: sbt's default logger
// wraps forked output in "[info] " prefixes, which breaks the driver's
// machine-parse of the final GRAFT_BENCH_JSON line (r6-r8 verdicts —
// BENCH_r*.json recorded "parsed": null three rounds running).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and sbt itself must not print ANYTHING after the forked JVM exits:
// with StdoutOutput the r9 artifact carried the complete raw JSON line,
// yet the driver still recorded "parsed": null — the one remaining
// writer after the line is sbt's own "[success] Total time: ..."
// epilogue. Dropping it makes GRAFT_BENCH_JSON the final stdout line;
// Bench's shutdown hook is a GUARDED backstop that re-emits only if
// some writer trailed the normal print, preserving the once-and-last
// contract in the common case (ADVICE r10). The authoritative
// machine-readable artifact is /tmp/graft_bench.json either way.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint can't see — exclude it so every batch run isn't prefixed by a
// 7-line warning
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] is a whole-cluster-in-one-JVM: storage + execution memory
  // for 32 task threads share this heap, so size it like a fat executor
  // (the box has 128 GiB; 8g caused GC/eviction thrash at sf0.1).
  // Xms pinned to Xmx: lazy heap growth fired full GCs at random points
  // mid-bench, inflating whichever query they landed on by 2-3x.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // a ~470-query bench JVM compiles thousands of whole-stage-codegen
  // classes; the default 240 MB reserved code cache then flushes and
  // recompiles hot methods mid-run — observed as identical work costing
  // 4x the CPU in a warm JVM while a fresh JVM converges (r10 NOTES,
  // blindzone pass-2 bimodality). Size it so JIT output is never evicted.
  "-XX:ReservedCodeCacheSize=1g",
  // fault the whole Xms=Xmx heap at JVM start instead of on first touch:
  // without this, G1 keeps handing out never-touched regions for many
  // queries and the page-fault + huge-page-zeroing cost lands IN the
  // task threads of whichever query first walks new heap — measured as
  // the "second execution of the identical query burns 4-10x CPU, third
  // is fine" mode (text_bpe_apply_trained RunOne at sf1g: 47/265/30
  // executor-CPU-s on identical work; stacks show the normal code path,
  // box shows ~25% system CPU, GC/C2/spill all idle). Pre-touching costs
  // ~5-10 s once at startup and removes the mode at the source.
  "-XX:+AlwaysPreTouch",
)
