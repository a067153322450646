package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.operators.Ann

/** One (vector, LSH band) row entering the streaming embedding
  * near-dup state: `band_key` = `"band:bits"` hyperplane bucket
  * (identical derivation to the batch q47 path via
  * [[Ann.bandedVectors]]), `vec` the float vector widened to double.
  */
final case class BandVec(band_key: String, vec_id: Long, vec: Seq[Double])

/** Per-(vector, band) online decision: `hit` = an already-admitted
  * vector in this band bucket has exact cosine ≥ threshold.
  */
final case class VecFlag(vec_id: Long, band_key: String, hit: Boolean)

/** A bucket-state entry: one admitted vector's id + widened floats. */
final case class SeenVec(vec_id: Long, vec: Seq[Double])

/** Streaming INCREMENTAL embedding near-dup — the ingestion-time form
  * of the batch banded-LSH cosine pipeline (q47/q64), and the
  * embedding-axis sibling of [[StreamNearDup]]: vectors arrive as a
  * stream, each is flagged near-dup ONLINE against the vectors the
  * corpus has already admitted to its hyperplane band buckets, with
  * the EXACT cosine verify (not the band collision alone) deciding the
  * flag — band agreement only gates which candidates are probed.
  *
  * Cross-engine determinism: the probe's dot/norm is a left-to-right
  * double fold over exactly-widened floats — bit-identical to the
  * batch [[Ann]] columnar arithmetic and to the DuckDB oracle's
  * `list_sum(list_transform(...))`, so a `cosine >= threshold`
  * comparison can never disagree between engine and oracle.
  *
  * 100 TB shape: state is ≤ maxBucketSize (id, dim-double) entries per
  * DISTINCT band bucket, hash-partitioned over executors; each
  * arriving vector costs one bucket lookup + ≤ maxBucketSize exact
  * cosines (O(dim) each) — constant work per row, no candidate join,
  * no corpus rescan. The admission cap is the online form of the
  * batch bucket-cap skew guard: a degenerate bucket (e.g. the
  * all-zero-ish region) stops growing instead of making per-row
  * probing unbounded.
  */
object StreamEmbedNearDup {

  val NBits = 16
  val Bands = 4
  val Dim = 64
  val DefaultThreshold = 0.2
  val DefaultMaxBucket = 64

  /** Left-to-right double dot product — mirrors [[Ann]]'s columnar
    * `aggregate(zip_with(...))` fold order exactly.
    */
  private[streaming] def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = a.size
    while (i < n) {
      acc += a(i) * b(i)
      i += 1
    }
    acc
  }

  private[streaming] def norm(a: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = a.size
    while (i < n) {
      acc += a(i) * a(i)
      i += 1
    }
    math.sqrt(acc)
  }

  /** Exact cosine; zero-norm inputs never reach here (dropped at
    * banding on both engine and oracle sides).
    */
  private[streaming] def cosine(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (norm(a) * norm(b))

  /** The banded vector rows for an embeddings relation — identical
    * columnar derivation to the batch path. Works on batch and
    * streaming inputs.
    */
  def bandedVecs(emb: DataFrame): Dataset[BandVec] = {
    import emb.sparkSession.implicits._
    Ann.bandedVectors(emb, "vec_id", "embedding", NBits, Bands, Dim)
      .select(org.apache.spark.sql.functions.col("band_key"),
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("vec"))
      .as[BandVec]
  }

  /** Probe-then-admit fold for one bucket and one batch of rows —
    * shared by the engine processor and the model test (the
    * [[StreamNearDup.foldBucket]] discipline). Rows process in vec_id
    * order within a batch; admission is unconditional until the cap.
    */
  private[streaming] def foldBucket(
      entries: IndexedSeq[SeenVec],
      rows: Seq[BandVec],
      threshold: Double,
      maxBucket: Int): (Seq[VecFlag], Seq[SeenVec]) = {
    var cur = entries
    val admitted = Seq.newBuilder[SeenVec]
    val flags = rows.sortBy(_.vec_id).map { r =>
      val hit = cur.exists(e => cosine(e.vec, r.vec) >= threshold)
      if (cur.size < maxBucket) {
        val s = SeenVec(r.vec_id, r.vec)
        admitted += s
        cur = cur :+ s
      }
      VecFlag(r.vec_id, r.band_key, hit)
    }
    (flags, admitted.result())
  }

  /** transformWithState processor: ListState of admitted vectors per
    * hyperplane band bucket (RocksDB-backed, TimeMode.None — corpus
    * membership is the state).
    */
  class EmbedNearDupProcessor(threshold: Double, maxBucket: Int)
      extends StatefulProcessor[String, BandVec, VecFlag] {

    @transient private var seen: ListState[SeenVec] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenVec]("seen",
        Encoders.product[SeenVec], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandVec],
        timerValues: TimerValues): Iterator[VecFlag] = {
      val entries = seen.get().toIndexedSeq
      val (flags, admitted) = foldBucket(entries, rows.toSeq, threshold, maxBucket)
      if (admitted.nonEmpty) seen.appendList(admitted.toArray)
      flags.iterator
    }
  }

  /** Streaming per-(vector, band) near-dup flags over banded rows. */
  def stage(banded: Dataset[BandVec],
      threshold: Double = DefaultThreshold,
      maxBucket: Int = DefaultMaxBucket): Dataset[VecFlag] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.band_key)
      .transformWithState(new EmbedNearDupProcessor(threshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
