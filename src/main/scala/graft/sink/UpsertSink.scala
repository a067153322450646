package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed exactly-once MERGE (upsert) sink — the full Iceberg-MERGE
  * analogue of the north star: each batch UPSERTS rows by `keyCols`
  * into a snapshot table with a VERSION GUARD (the max `versionCol`
  * row wins per key, across batches as well as within one — a stale
  * out-of-order batch never regresses a key), committed with the
  * same batchId-idempotent protocol as [[ExactlyOnceSink]].
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

    val base = latestCommitted match {
      case Some(v) => spark.read.parquet(snapshotDir(v).toString)
      case None    => df.limit(0)
    }
    // VERSION-GUARDED MERGE (the Iceberg `WHEN MATCHED AND s.version >
    // t.version THEN UPDATE` shape): one resolution window over
    // base ∪ batch keeps the max-version row per key — an out-of-order
    // or late-replayed batch carrying a STALE version can never
    // regress a key (the previous anti-join shape was arrival-wins:
    // whatever batch came last overwrote matched keys regardless of
    // version). Ties break by content hash so the winner is
    // independent of shuffle order AND of which side carried the row;
    // the single window also dedups within-batch key collisions, so
    // the merge is one shuffle, not a dedup window plus an anti-join.
    val all = base.unionByName(df)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc,
        xxhash64(all.columns.map(col): _*).desc)
    val merged = all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

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
