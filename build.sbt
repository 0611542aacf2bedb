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
  // Recompilation-cutoff flags (round-5 REVERSAL of the round-4
  // rejection — the trade was re-measured with better evidence).
  // HotSpot pins a method in the interpreter after 400 deopt cycles,
  // and Spark's interpreted expression paths (HOF lambdas and every
  // CodegenFallback builtin, e.g. get_json_object) DO hit that wall:
  // an isolated HOF microbench degraded 2 s -> 12 s -> 52 s across
  // identical runs, and -XX:PerMethodRecompilationCutoff=-1 held it
  // stable at 0.9 s. Round 4 rejected the flags because they cost the
  // suite's sum-of-mins ~7% (80.4 -> 86.2 s, compile churn stealing
  // worker CPU). Round 5 reinstated them after catching the OTHER side
  // of that trade in the act: without the flags, a mid-suite bench run
  // recorded q24_lang_id at [0.9 s, 99.7 s, 156.5 s] and
  // q33_json_extract at [1.3 s, 1.1 s, 128.6 s] — interpreter-pinned
  // eval paths running 100x+ for MINUTES, which is exactly what
  // collapsed the round-4 driver artifact to 450 s. A bounded ~7% tax
  // on every min beats an unbounded 100x tail on any query. The
  // durable fix remains in the operators (hot kernels stay out of
  // interpreted lambdas — see graft.expressions.*), but builtins like
  // get_json_object cannot be flattened from user code.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
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
