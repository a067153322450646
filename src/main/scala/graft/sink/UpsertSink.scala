package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed exactly-once MERGE (upsert) sink — the full Iceberg-MERGE
  * analogue of the north star: each batch UPSERTS rows by `keyCols`
  * (latest `versionCol` wins) into a snapshot table, committed with
  * the same batchId-idempotent protocol as [[ExactlyOnceSink]].
  *
  * Snapshot layout (a miniature of Iceberg's snapshot chain):
  *
  *   snapshots/v=<batchId>/   full merged table after the batch
  *   _commits/<batchId>       commit marker (atomic create)
  *   _latest                  file naming the newest committed batchId
  *
  * A replayed batchId is a no-op; a crash between snapshot write and
  * marker leaves a dangling uncommitted snapshot that the replay
  * overwrites. Readers resolve `_latest` → snapshot dir, so they never
  * observe a half-written state (same read-isolation idea as Iceberg's
  * metadata pointer swap).
  *
  * Scale note: this local implementation rewrites the merged table per
  * batch (copy-on-write MERGE). On a real cluster the identical
  * protocol delegates to Iceberg `MERGE INTO` where only touched data
  * files rewrite; the engine-side contract (deterministic batch
  * content + batchId idempotence) is unchanged.
  */
class UpsertSink(outDir: String, keyCols: Seq[String], versionCol: String)
    extends Serializable {

  require(keyCols.nonEmpty)

  private def snapshotDir(batchId: Long): Path =
    Paths.get(outDir, "snapshots", s"v=$batchId")
  private def commitMarker(batchId: Long): Path =
    Paths.get(outDir, "_commits", batchId.toString)
  private def latestPtr: Path = Paths.get(outDir, "_latest")

  def isCommitted(batchId: Long): Boolean = Files.exists(commitMarker(batchId))

  def latestCommitted: Option[Long] =
    if (!Files.exists(latestPtr)) None
    else Some(new String(Files.readAllBytes(latestPtr), "UTF-8").trim.toLong)

  /** Current merged table (empty schema-less frame before any commit). */
  def readLatest(spark: SparkSession): DataFrame =
    latestCommitted match {
      case Some(v) => spark.read.parquet(snapshotDir(v).toString)
      case None    => spark.emptyDataFrame
    }

  /** foreachBatch entrypoint: MERGE `df` into the latest snapshot. */
  def write(df: DataFrame, batchId: Long): Unit = {
    if (isCommitted(batchId)) {
      // crash window repair: marker exists but the pointer swing never
      // happened — finish the commit instead of dropping the batch
      if (latestCommitted.forall(_ < batchId)) {
        val tmpPtr = Paths.get(outDir, s"_latest.tmp.$batchId")
        Files.write(tmpPtr, s"$batchId".getBytes("UTF-8"))
        Files.move(tmpPtr, latestPtr, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      return
    }
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(outDir, "_commits"))
    Files.createDirectories(Paths.get(outDir, "snapshots"))

    // newest row per key within the incoming batch; ties on version
    // are broken by a content hash so the winner is independent of
    // shuffle order (deterministic replay contract)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc,
        xxhash64(df.columns.map(col): _*).desc)
    val incoming = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val base = latestCommitted match {
      case Some(v) => spark.read.parquet(snapshotDir(v).toString)
      case None    => incoming.limit(0)
    }
    // MERGE: keep base rows whose key is absent from the batch, then
    // add the batch rows (matched keys are thereby updated)
    val merged = base
      .join(incoming.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(incoming)

    val staged = Paths.get(outDir, "snapshots", s"_staging-v=$batchId")
    merged
      .repartition(col(keyCols.head))
      .sortWithinPartitions((keyCols :+ versionCol).map(col): _*)
      .write.mode("overwrite").parquet(staged.toString)

    val target = snapshotDir(batchId)
    if (Files.exists(target)) FsUtil.deleteRecursively(target)
    Files.move(staged, target, StandardCopyOption.ATOMIC_MOVE)
    // commit: marker first, then swing the latest pointer (a reader
    // between the two still sees the previous consistent snapshot)
    Files.write(commitMarker(batchId),
      s"$batchId".getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val tmpPtr = Paths.get(outDir, s"_latest.tmp.$batchId")
    Files.write(tmpPtr, s"$batchId".getBytes("UTF-8"))
    Files.move(tmpPtr, latestPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

}
