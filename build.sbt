ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdc2vecspark"
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
  // 24g default (was 8g, still env-overridable): the single-JVM 293-query
  // suite accretes every query's SessionCache artifacts and shuffle state
  // into one old generation, and round-15 measurements showed in-suite
  // timings 2-8x their isolated values under the 8g heap (q_fleiss_kappa
  // 19.3s in-suite vs 2.5s isolated on the same box) - late queries were
  // measuring the collector, not their plan. The bench box has 128 GiB;
  // a cluster deployment sizes executor memory explicitly and ignores
  // this local-harness default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// ---------------------------------------------------------------------------
// Parallel test groups: the serial single-JVM suite measured 726 s on a
// quiet 32-core box, and the round-15 driver's (slower, shared) box killed
// it mid-suite — tests_ok=false took the WHOLE round's correctness down
// with it (VERIFY_r15.json). Wall time, not any single test, was the
// failure. Five forked JVMs, each with its own SparkSession on local[4],
// cut wall to roughly the heaviest group (~4-5 min quiet-box): suites are
// fully isolated (own catalog, own SessionCache, own temp dirs, port-0
// mock servers), so nothing about any test's semantics changes. Heavy
// suites (measured from the serial run's log timestamps) are pinned so no
// group stacks two of them; the rest round-robin by name.
val heavyPin: Map[String, Int] = Map(
  "graft.MergeStreamSpec"            -> 0, // 253 s serial — gets a JVM alone
  "graft.IndexMaintainerSpec"        -> 1, // 77 s
  "graft.HeavyHittersSpec"           -> 1, // 71 s
  "graft.CusumMonitorSpec"           -> 1, // 26 s
  "graft.PageHinkleyMonitorSpec"     -> 2, // 40 s
  "graft.PqSpec"                     -> 2, // 37 s
  "graft.LiveTopologySpec"           -> 2, // 33 s
  "graft.TwsSessionSpec"             -> 2, // 16 s
  "graft.MilvusGrpcSpec"             -> 2, // 15 s
  "graft.StreamSpec"                 -> 2, // 14 s
  "graft.PgOutputSourceSpec"         -> 2, // 14 s
  "graft.HoltWintersMonitorSpec"     -> 2, // 14 s
  "graft.HoltMonitorSpec"            -> 2, // 11 s
)
val testGroups = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  // -XX:ActiveProcessorCount: the first 5-way-parallel attempt ran SLOWER
  // than serial (845 s vs 726 s) because every forked JVM sized its GC /
  // JIT / fork-join pools for all 32 cores — five JVMs × ~23 G1 worker
  // threads + C2 compiler storms oversubscribed the box and stretched the
  // latency-sensitive streaming tests. Capping each test JVM's visible
  // processors right-sizes those pools; the Spark sessions inside are
  // explicit local[4] and unaffected.
  val jvmOpts = (Test / javaOptions).value.toVector :+
    "-XX:ActiveProcessorCount=8"
  val rest = tests.filterNot(t => heavyPin.contains(t.name)).map(_.name)
  val byGroup = tests.groupBy { t =>
    // group 0 is MergeStreamSpec's own JVM; 1 and 2 carry the pinned
    // heavies; the ~55 light suites round-robin over 1..3 (measured ≈190 s
    // serial in total, so each group lands near the ~200 s balance point)
    heavyPin.getOrElse(t.name, 1 + rest.indexOf(t.name) % (testGroups - 1))
  }
  byGroup.toSeq.sortBy(_._1).map { case (g, ts) =>
    Tests.Group(s"g$g", ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(jvmOpts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroups),
  Tags.limitAll(math.max(testGroups, 4)),
)
