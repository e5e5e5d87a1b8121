ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikidspark"
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
// Test fixtures (temp tables, stores, checkpoints) are throwaway: put
// them on the tmpfs so suite wall measures the engine, not /tmp's disk.
// Bench (run scope) intentionally keeps real-disk I/O.
Test / javaOptions ++= {
  val shm = file("/dev/shm")
  if (shm.isDirectory && shm.canWrite) Seq("-Djava.io.tmpdir=/dev/shm")
  else Seq.empty
}
// Run the suites in PARALLEL FORKED JVMs (process isolation: each group
// gets its own SparkSession singleton, so session-global conf mutations
// in one suite can never flake another — the hazard that rules out
// in-JVM parallel suites). The store-lifecycle suites dominate the
// serial wall (Dedup ~2 min, FtsStore ~1.5 min of chained small jobs),
// so they anchor separate groups; each fork runs local[8] → 4 × 8
// task threads matches the 32-core test host. Heap shrinks to 6g per
// fork (the 24g default serves Bench's 1M-line ETL, not test fixtures).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions(
    ((Test / javaOptions).value.filterNot(_.startsWith("-Xmx")) :+
      "-Xmx6g").toVector)
  val anchors = Map(              // suite -> group, by measured weight
    "graft.ext.DedupSpec" -> 0,
    "graft.fts.FtsStoreSpec" -> 1,
    "graft.fts.FtsSpec" -> 1,
    "graft.ext.SimilaritySpec" -> 1,
    "graft.catalog.VersionedTableSpec" -> 2,
    "graft.catalog.ScaleSpec" -> 2,
    "graft.streaming.StreamsSpec" -> 2,
    "graft.ext.SketchCubeSpec" -> 2,
  )
  tests.groupBy(t => anchors.getOrElse(t.name, 3)).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"fork-$i", ts, Tests.SubProcess(opts))
    }
}
// sbt serializes forked test groups by default; let all four run at once
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16), Tags.limit(Tags.ForkedTestGroup, 4))
// Pass forked-run output straight through (no [info]/[error] log prefix):
// Bench prints one machine-readable JSON line that harnesses parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] with the full suite + 1M-line ETL wants real headroom; the
  // bench host has 128 GiB (8g caused GC thrash once caches accumulated)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 62 queries' worth of Janino-generated classes overflow the default
  // 240m code cache; once full the JIT stops compiling and every later
  // generated class (e.g. the ETL JSON parse) runs interpreted ~4x slower
  // (Bench.jvmStats prints the pool to make this observable).
  "-XX:ReservedCodeCacheSize=1g",
)
