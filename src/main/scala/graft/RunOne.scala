package graft

import org.apache.spark.sql.SparkSession

/** Single-query diagnostic runner: `runMain graft.RunOne <query>
  * [sfDir] [reps]` times one registered query under the exact Bench
  * session configuration and prints its formatted physical plan —
  * the plan-iteration loop (`.explain` until it's the plan you'd
  * want) without paying for the whole query suite.
  */
object RunOne {

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: RunOne <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"=== $name @ $sfDir ===")
    (0 until reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    println(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
