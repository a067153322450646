package graft
import org.apache.spark.sql.SparkSession
object UpdGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.synth.ClipGen.transcriptUpdates(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(args(0))
    spark.stop()
  }
}
