ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "labtofhirspark"
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
// Scratch (streaming checkpoints, staged stream sources, sink work
// dirs, shuffle/block spill via spark.local.dir) on the fastest local
// storage available: tmpfs when the host has one, else the system
// default. Parameterised — SPARK_GRAFT_TMPDIR pins it (e.g. to a
// dedicated NVMe scratch volume on a production host).
val graftTmpDir: Option[String] =
  sys.env.get("SPARK_GRAFT_TMPDIR").orElse {
    val shm = file("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = shm / "graft-tmp"
      IO.createDirectory(d)
      Some(d.getAbsolutePath)
    } else None
  }
javaOptions ++= jdk17AddOpens ++ sys.env.get("SPARK_GC_OPTS").toSeq ++
  graftTmpDir.map(d => s"-Djava.io.tmpdir=$d").toSeq ++ Seq(
  // the bench mains emit their JSON contract line via f-interpolators;
  // a comma-decimal locale would produce invalid JSON
  "-Duser.language=en", "-Duser.country=US",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
