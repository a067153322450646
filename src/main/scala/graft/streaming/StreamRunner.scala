package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Helpers for driving streaming plans to a deterministic batch result
  * (the engine's TopologyTestDriver analogue, SURVEY.md §5) and for
  * reading the file-backed input streams.
  */
object StreamRunner {

  private val counter = new AtomicInteger(0)

  /** Parquet file stream over a driver-generated table. The file
    * source is the sandbox stand-in for the reference's Kafka source
    * (S1/S2; no Kafka connector jar ships here) — rate limiting via
    * `maxFilesPerTrigger` mirrors consumer fetch sizing (D9).
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(streamableDir(path))
  }

  /** The file stream source requires a directory; a single-file input
    * (the driver's one-parquet-per-table layout) is staged into a
    * cached temp directory once.
    */
  def streamableDir(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p)) path
    else {
      val dir = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_stream_src",
        p.getParent.getFileName.toString, p.getFileName.toString + ".d")
      val target = dir.resolve(p.getFileName)
      // staleness guard: the cached copy must match the source's
      // size+mtime, or a regenerated dataset would silently stream
      // old rows
      val fp = s"${p.toAbsolutePath}|${java.nio.file.Files.size(p)}|${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
      val marker = dir.resolve("_fingerprint")
      val fresh = java.nio.file.Files.exists(target) &&
        java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fp
      if (!fresh) {
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.deleteIfExists(marker)
        val tmp = dir.resolve(p.getFileName.toString + ".tmp")
        java.nio.file.Files.copy(p, tmp,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.write(marker, fp.getBytes("UTF-8"))
      }
      dir.toString
    }
  }

  /** Guard for queries whose DuckDB oracle assumes the whole input
    * arrives as ONE AvailableNow micro-batch (e.g. s02's occurrence
    * numbering is event-time order within a batch but arrival order
    * across batches; s09's eviction cutoff assumes the final watermark
    * is computed over all rows at once). A multi-file input or any
    * `maxFilesPerTrigger` would silently change semantics vs the
    * oracle, so fail loudly instead.
    */
  def assertSingleBatchInput(path: String): Unit = {
    val dir = java.nio.file.Paths.get(streamableDir(path))
    val n = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    require(n == 1,
      s"oracle parity requires a single-file (single-batch) input; found $n parquet files in $dir")
  }

  /** Run a streaming DataFrame to completion over all currently
    * available input (Trigger.AvailableNow) into an in-memory table and
    * return it as a batch DataFrame. Used by Verify so streaming
    * operators go through the same DuckDB oracle gate as batch ones.
    */
  def runToMemory(stream: DataFrame, mode: String): DataFrame = {
    val spark = stream.sparkSession
    val name = s"graft_mem_${counter.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
