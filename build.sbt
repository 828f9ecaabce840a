ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectorsearchspark"
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
// Pass the forked JVM's stdout straight through (no `[info] ` prefix) so
// the driver's per-line `json.loads` can parse graft.Bench's one-line
// JSON contract. LoggedOutput (the default) prefixes every stdout line.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
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
// Panama SIMD kernels (graft.simd.SimdKernels) — compile against and
// expose the incubator module; the kernels stay OPT-IN at runtime
// (-Dgraft.simd=1) and probe availability, so a JVM without the module
// just falls back to the scalar path.
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
// javac first: scalac then reads SimdKernels from its classfile (plain
// float[] signatures) instead of parsing the .java source, which made
// zinc's in-JVM pipeline try to define the incubator classes in an
// unnamed module and fail the clean build.
compileOrder := CompileOrder.JavaThenScala
// forward the SIMD opt-in to forked JVMs: `sbt -Dgraft.simd=1 ...`
javaOptions ++= sys.props.get("graft.simd").map(v => s"-Dgraft.simd=$v").toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // OpenJDK 17.0.20 C2 SIGSEGV (BoolNode::Ideal) observed once compiling
  // this stock Spark parquet-writer method mid-bench (hs_err 2026-08-15,
  // tier-4 task 18983) — keep the 21-byte method at C1; cost is nil,
  // and a JIT crash would cost a whole driver bench run.
  "-XX:CompileCommand=exclude,org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport::consumeGroup",
)
// Offline-sandbox coverage: GRAFT_COVERAGE=1 attaches the hand-built
// line/branch agent (tools/coverage — ASM-on-xbean, no scoverage/jacoco
// artifacts resolvable offline) to the forked test JVM. The jar is NOT
// committed (binaries drift from source); it is rebuilt from
// tools/coverage/src by build.sh whenever missing or stale.
// Report: python3 tools/coverage/report.py
javaOptions ++= (if (sys.env.contains("GRAFT_COVERAGE")) {
  val dir = baseDirectory.value / "tools" / "coverage"
  val jar = dir / "graft-coverage.jar"
  val srcs = (dir / "src" / "graftcov").listFiles.filter(_.getName.endsWith(".java"))
  if (!jar.exists || srcs.exists(_.lastModified > jar.lastModified)) {
    import scala.sys.process._
    require(Seq((dir / "build.sh").getAbsolutePath).! == 0, "coverage agent build failed")
  }
  Seq(s"-javaagent:$jar")
} else Seq.empty)
