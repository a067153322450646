package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent exactly-once `foreachBatch` sink (SURVEY.md §2.8 D2/D7,
  * §4 "Exactly-once physical plan").
  *
  * The reference gets exactly-once from Kafka Streams' transactional
  * delivery (serde errors shut the client down so nothing is emitted
  * past a poison pill,
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/configuration/KafkaConfiguration.java:31-42).
  * Spark's micro-batch checkpoint guarantees at-least-once replay of
  * `foreachBatch`; this sink turns that into exactly-once with the
  * Iceberg-MERGE-style commit protocol (no Iceberg runtime in the
  * sandbox):
  *
  *  1. write the batch to `_staging/batch-<id>` (re-runnable),
  *  2. gather per-partition lineage + metrics,
  *  3. atomically move staging → `data/batch=<id>`,
  *  4. atomically create the commit marker `_commits/<id>`.
  *
  * A replayed batchId short-circuits at the marker check, so restarts
  * from checkpoint produce byte-identical output (rows inside each file
  * are pre-sorted by `orderCols` to make the files themselves stable).
  * At cluster scale steps 3-4 map onto a metastore/Iceberg snapshot
  * commit; the protocol (idempotence keyed on batchId) is unchanged.
  */
class ExactlyOnceSink(outDir: String, orderCols: Seq[String]) extends Serializable {

  private def dataDir(batchId: Long): Path = Paths.get(outDir, "data", s"batch=$batchId")
  private def stagingDir(batchId: Long): Path = Paths.get(outDir, "_staging", s"batch-$batchId")
  private def commitMarker(batchId: Long): Path = Paths.get(outDir, "_commits", batchId.toString)
  private def lineageFile(batchId: Long): Path = Paths.get(outDir, "_lineage", s"$batchId.json")

  def committedBatchIds: Seq[Long] = {
    val dir = Paths.get(outDir, "_commits")
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator.asScala.map(_.getFileName.toString.toLong).toSeq.sorted
      finally stream.close()
    }
  }

  def isCommitted(batchId: Long): Boolean = Files.exists(commitMarker(batchId))

  /** The foreachBatch function. Safe to call repeatedly with the same
    * batchId (idempotent); safe to re-run after a crash at any step.
    */
  def write(df: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) return // replay after restart — already durable

    val spark = df.sparkSession
    Files.createDirectories(Paths.get(outDir, "_commits"))
    Files.createDirectories(Paths.get(outDir, "_lineage"))
    Files.createDirectories(Paths.get(outDir, "data"))

    // Deterministic file contents: hash-partition on the leading order
    // column, then sort within partitions. (A global orderBy would use
    // sampled range partitioning — file BOUNDARIES would then vary run
    // to run, breaking the byte-identical-replay guarantee.)
    val ordered =
      if (orderCols.nonEmpty)
        df.repartition(col(orderCols.head))
          .sortWithinPartitions(orderCols.map(col): _*)
      else df

    // Single-pass lineage (D7/D8): row count + event-time bounds ride
    // the staging write itself via observe() (one Spark job per batch,
    // not four — this is micro-batch p99 latency); per-partition counts
    // come from the staged parquet footers, driver-side metadata only.
    val hasTs = ordered.columns.contains("event_time")
    val obs = org.apache.spark.sql.Observation(s"sink-lineage-$batchId-${System.nanoTime()}")
    val metrics =
      count(lit(1)).as("rows") +: (
        if (hasTs)
          Seq(min(col("event_time")).cast("string").as("mn"),
            max(col("event_time")).cast("string").as("mx"))
        else Seq.empty)
    ordered.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(stagingDir(batchId).toString)
    val m = obs.get
    val total = m("rows").asInstanceOf[Long]
    val tsBounds =
      if (hasTs && total > 0)
        s""","event_time_min":"${m("mn")}","event_time_max":"${m("mx")}""""
      else ""
    val partCounts = {
      val stream = Files.list(stagingDir(batchId))
      val files =
        try stream.iterator.asScala.toSeq
          .filter(_.getFileName.toString.startsWith("part-"))
        finally stream.close()
      val conf = spark.sessionState.newHadoopConf()
      files.sortBy(_.getFileName.toString).zipWithIndex.map { case (f, seq) =>
        // part-%05d-… but ≥100000 partitions widens the field: take digits.
        // A committer emitting a non-standard name (e.g. part-r-00000)
        // yields no digits — fall back to the sorted sequence index
        // rather than failing the whole batch for a lineage nicety.
        val digits = f.getFileName.toString.stripPrefix("part-")
          .takeWhile(_.isDigit)
        val pid = if (digits.nonEmpty) digits.toInt else seq
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.toUri), conf))
        val n = try reader.getRecordCount finally reader.close()
        s"""{"partition_id":$pid,"rows":$n}"""
      }.sorted.mkString("[", ",", "]")
    }
    val lineageJson =
      s"""{"batch_id":$batchId,"rows":$total,"partitions":$partCounts$tsBounds}"""
    Files.writeString(lineageFile(batchId), lineageJson)

    // commit: atomic dir move, then atomic marker create
    val target = dataDir(batchId)
    if (Files.exists(target)) FsUtil.deleteRecursively(target) // crashed pre-marker
    Files.move(stagingDir(batchId), target, StandardCopyOption.ATOMIC_MOVE)
    Files.write(commitMarker(batchId), lineageJson.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
  }

  /** Lineage records for every committed batch (D7 evidence). Parsed
    * with a real JSON reader (field-order independent); a lineage file
    * corrupted after commit (e.g. a torn write racing a crash) falls
    * back to the commit marker, which stores the same document and was
    * written atomically — only both being unreadable fails, with the
    * batch id in the error instead of a bare NoSuchElementException.
    */
  def lineage: Seq[ExactlyOnceSink.BatchLineage] = committedBatchIds.map { id =>
    ExactlyOnceSink.parseLineage(lineageFile(id), id) match {
      case Right(l) => l
      case Left(err1) =>
        ExactlyOnceSink.parseLineage(commitMarker(id), id) match {
          case Right(l) => l
          case Left(err2) => throw new IllegalStateException(
            s"batch $id lineage unreadable: $err1; commit-marker fallback: $err2")
        }
    }
  }

  /** All committed rows (ignores uncommitted staging leftovers). A
    * committed EMPTY batch contains only _SUCCESS (FileFormatWriter
    * writes no part files for empty partitions), so pass only dirs
    * with data to the reader — schema inference over exclusively
    * empty batches would otherwise throw. Limitation: when EVERY
    * committed batch is empty there is no parquet footer to recover
    * the schema from, so the returned frame is `spark.emptyDataFrame`
    * (zero columns) — count()/isEmpty work, column selection does
    * not; callers that need the schema in that state must carry it
    * themselves.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val dirs = committedBatchIds.map(dataDir).filter { d =>
      val stream = Files.list(d)
      try stream.iterator.asScala
        .exists(_.getFileName.toString.endsWith(".parquet"))
      finally stream.close()
    }
    if (dirs.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(dirs.map(_.toString): _*)
  }

}

object ExactlyOnceSink {

  /** Parsed lineage of one committed batch: the observed row total and
    * the per-partition counts read back from the staged parquet
    * footers. [[ExactlyOnceSink.write]] records both through different
    * channels (observe() on the write vs driver-side footer metadata),
    * so Σ partitionRows == rows is a real conservation check, not a
    * tautology — and reconciling either against `readCommitted().count`
    * closes the loop with what a reader actually sees.
    */
  final case class BatchLineage(batchId: Long, rows: Long, partitionRows: Seq[Long])

  private[sink] def parseLineage(
      file: Path, id: Long): Either[String, BatchLineage] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(file))
      if (node == null || !node.hasNonNull("rows") ||
          !node.hasNonNull("partitions") || !node.get("partitions").isArray)
        Left(s"$file missing rows/partitions fields")
      else {
        val elems = node.get("partitions").elements().asScala.toSeq
        if (elems.exists(e => !e.hasNonNull("rows")))
          Left(s"$file has a partitions element without rows")
        else
          Right(BatchLineage(id, node.get("rows").asLong(),
            elems.map(_.get("rows").asLong())))
      }
    } catch {
      case e: Exception => Left(s"$file: ${e.getMessage}")
    }
}

/** Shared filesystem helpers for the sink commit protocols. */
object FsUtil {
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator.asScala.toSeq.foreach(deleteRecursively)
      finally stream.close()
    }
    Files.deleteIfExists(p)
  }

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-SF sink WORK dir for a query family, scoped to THIS process:
    * `<tmp>/<family>/<sf>-pid<pid>`. A fixed shared dir wiped at query
    * start leaks nothing but races concurrent JVMs (one Verify wipes
    * the other's live `_checkpoint` mid-query — no lock can fix that,
    * the wipe itself is the conflict); a fresh temp dir per invocation
    * is concurrency-safe but leaks one sink copy per pass. The
    * process-scoped dir is both: the caller's own dir is wiped on
    * every invocation (one process runs its queries sequentially), and
    * sibling dirs whose owning pid is DEAD are reaped here, so disk
    * holds at most one copy per LIVE process.
    */
  def processScopedWorkDir(family: String, sfDir: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val parent = Paths.get(sys.props("java.io.tmpdir"), family)
    val pid = ProcessHandle.current().pid()
    val mine = parent.resolve(s"$sfName-pid$pid")
    Files.createDirectories(parent)
    // reap siblings owned by dead processes (any SF — the pid suffix
    // is authoritative); never touch a live process's dir
    // Each reap is best-effort: two live JVMs may race to reap the same
    // dead sibling, and the loser's Files.list/delete hits paths the
    // winner already removed (NoSuchFileException). An all-digit pid
    // suffix beyond Long range would also throw in toLong. Neither
    // failure is ours to surface — the dir is either gone or someone
    // else's problem next pass.
    val stream = Files.list(parent)
    try stream.iterator.asScala.foreach { p =>
      try {
        val name = p.getFileName.toString
        val idx = name.lastIndexOf("-pid")
        if (idx >= 0) {
          val owner = name.substring(idx + 4)
          val alive = owner.forall(_.isDigit) && owner.nonEmpty &&
            ProcessHandle.of(owner.toLong).map[java.lang.Boolean](h => h.isAlive)
              .orElse(java.lang.Boolean.FALSE)
          if (!alive) FsUtil.deleteRecursively(p)
        }
      } catch {
        case _: java.nio.file.NoSuchFileException | _: NumberFormatException
            | _: java.io.UncheckedIOException => ()
      }
    } finally stream.close()
    FsUtil.deleteRecursively(mine) // own previous pass (same pid, sequential)
    mine.toString
  }

  /** Cross-PROCESS exclusive section for the shared /tmp staging dirs
    * (clip table, binary-file fixtures, events batches): two JVMs
    * staging the same SF concurrently — e.g. Verify and Bench — could
    * otherwise interleave deleteRecursively/write under the
    * marker-only guard and one would read a partially staged dir. A
    * JVM-wide monitor per lock path wraps the OS FileLock because a
    * second lock attempt on the same file from the SAME JVM throws
    * OverlappingFileLockException rather than blocking. Callers must
    * re-run their stale check INSIDE the lock (the winner may have
    * staged while we waited).
    */
  def withStagingLock[T](lockFile: Path)(f: => T): T = {
    val mon = jvmLocks.computeIfAbsent(lockFile.toString, _ => new Object)
    mon.synchronized {
      if (lockFile.getParent != null) Files.createDirectories(lockFile.getParent)
      val ch = java.nio.channels.FileChannel.open(lockFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try f finally l.release()
      } finally ch.close()
    }
  }
}
