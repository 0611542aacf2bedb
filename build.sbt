ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kenyaagriculturalregionsweatheretlpipelinespark"
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
// The harness parses the ONE JSON metric line from Bench's stdout; sbt's
// default LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which defeats that parse (BENCH_r01/r02 both recorded
// "parsed": null). StdoutOutput inherits the raw streams instead.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Recompilation-cutoff flags: measured in BOTH states across rounds
  // 4-5; the answer is DO NOT add them, and the reason is now fully
  // understood. HotSpot pins a method in the interpreter after 400
  // deopt cycles, and Spark's interpreted expression paths (HOF
  // lambdas, CodegenFallback builtins) hit that wall once enough
  // distinct shapes pollute their shared eval call sites — round-5
  // default-flags run: q24_lang_id [0.9 s, 99.7 s, 156.5 s] across
  // identical runs. -XX:PerMethodRecompilationCutoff=-1 prevents the
  // pinning but replaces it with UNBOUNDED deopt-recompile cycling,
  // which is worse for the artifact: the method re-runs interpreted
  // every cycle, so ALL runs of an affected query slow down and
  // min-of-n cannot recover (round-5 flags-on run: q07_date_parts
  // [89, 92, 104] s — a 0.7 s flat-codegen query at 120x on every
  // run — suite total 229 s; flags-off total 87 s). The durable fix
  // is eliminating the interpreted shapes themselves: every per-row
  // lambda on a query path is a native codegen'd kernel
  // (graft.expressions.*, PlanAuditSpec sweeps 22 plans for zero
  // lambdafunction), which removes the pollution that drove the
  // pinning in the first place.
  //
  // Code-cache headroom (round 5). The round-4 verdict's leading
  // hypothesis for the 450 s bench collapse was JDK-17 default
  // code-cache (240 MB) exhaustion across 273 codegen'd plan
  // executions. The round-5 canary (Bench.scala logs per-pool peak
  // occupancy into bench.json) DISPROVED that as the mechanism — peaks
  // read 10-17% of 1 GiB (~130 MB, under the old default) even in a
  // collapsing run; the interpreter-pinning pathology above is the
  // real cause. The 1 GiB reservation stays anyway: the unlimited
  // recompilation churn the cutoff flags permit makes cache pressure
  // plausible at suite scale, flushing beats compiler shutdown if it
  // ever fills, and the canary keeps the whole question observable
  // inside the artifact.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
