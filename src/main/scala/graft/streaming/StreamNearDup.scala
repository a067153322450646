package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.operators.Dedup

/** One (document, LSH band) row entering the streaming near-dup
  * state: `band_key` is the md5 band bucket (identical derivation to
  * the batch q31 path), `sig` the full k=8 minhash signature.
  */
final case class BandDoc(band_key: String, doc_id: Long, sig: Seq[String])

/** Per-(doc, band) online decision: `hit` = an already-admitted
  * document in this band bucket estimates Jaccard ≥ threshold.
  */
final case class BandFlag(doc_id: Long, band_key: String, hit: Boolean)

/** A bucket-state entry: one admitted document's id + signature. */
final case class SeenSig(doc_id: Long, sig: Seq[String])

/** Streaming INCREMENTAL near-dup detection — the ingestion-time form
  * of the batch minhash/LSH pipeline (q31/q61): documents arrive as a
  * stream, each is flagged near-dup ONLINE against what the corpus has
  * already admitted, per LSH band bucket, in TTL-free keyed state.
  *
  * Semantics (the online analogue of q31's pair derivation):
  * a row is a `hit` iff some document processed BEFORE it — an
  * earlier micro-batch, or earlier in doc_id order within the same
  * batch — was ADMITTED to the same band bucket and the fraction of
  * equal signature positions is ≥ `threshold`. Admission is capped at
  * `maxBucketSize` entries per bucket: the online form of q31's
  * degenerate-bucket skew guard — a boilerplate bucket stops growing
  * (and stops flagging against its overflow) instead of accumulating
  * unbounded state, so a hot bucket can never make per-row probing
  * unbounded. Within one batch rows are processed in doc_id order, so
  * a single-batch run reduces exactly to "pairs (a,b) with a.doc_id <
  * b.doc_id and a among the bucket's first `maxBucketSize` ids" — the
  * SQL the s29 oracle encodes; the cross-batch schedule is pinned by
  * the model in MultiBatchModelSpec.
  *
  * 100 TB shape: state is ≤ maxBucketSize (id, 8×md5) entries per
  * DISTINCT band bucket, hash-partitioned by bucket over the
  * executors (RocksDB-backed); each arriving row costs one bucket
  * lookup + ≤ maxBucketSize signature compares — constant work per
  * row, no joins, no rescan of the corpus. This is what the batch
  * q31 CANNOT give an ingestion pipeline: there, every new slice
  * re-joins against the full exploded corpus.
  *
  * Reference analogue: the keyed seen-state dedup of
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/Hl7LabMapper.java:160-179,
  * lifted from exact id equality to LSH-bucketed similarity.
  */
object StreamNearDup {

  val Bands = 4
  val K = 8
  val ShingleN = 3
  val DefaultThreshold = 0.25
  val DefaultMaxBucket = 64

  /** Fraction of equal signature positions (estimated Jaccard). */
  private[streaming] def simFrac(a: Seq[String], b: Seq[String]): Double = {
    var eq = 0
    var i = 0
    while (i < K) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / K
  }

  /** The banded signature rows for a documents relation — IDENTICAL
    * columnar derivation to the batch path
    * ([[Dedup.minhashSignatures]] + the q31 band keys), so stream and
    * batch agree on buckets by construction. Works on batch and
    * streaming inputs. Null-signature documents are dropped on BOTH
    * sides: a null-element signature would compare null==null as a JVM
    * equality hit but as SQL NULL (no hit) in the oracle. The guard is
    * `text IS NOT NULL` — exactly equivalent (minhash32's nullSafeEval
    * makes sig null iff text is null; a non-null text always yields
    * ≥ 1 shingle, so sig[1] is non-null) and pushable to the scan,
    * where a post-hoc `sig[1] IS NOT NULL` filter gets pushed BELOW
    * the projections and re-expands the whole shingle+minhash pipeline
    * in a non-codegen Filter (measured 10× the entire banding cost at
    * sf0.1).
    */
  def bandedDocs(docs: DataFrame): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    Dedup.minhashSignatures(docs.filter(col("text").isNotNull),
        "doc_id", "text", ShingleN, K)
      .withColumn("band_keys",
        graft.functions.TextFunctions.lshBandKeys(col("sig"), Bands, K / Bands))
      .select(col("doc_id"), col("sig"),
        explode(col("band_keys")).as("band_key"))
      .select(col("band_key"), col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  /** The probe-then-admit fold for one bucket and one batch of rows —
    * shared by the engine processor and the multi-batch model test, so
    * the model cannot drift from the shipped semantics. Returns the
    * flags in doc_id order and the entries admitted by this batch.
    */
  private[streaming] def foldBucket(
      entries: IndexedSeq[SeenSig],
      rows: Seq[BandDoc],
      threshold: Double,
      maxBucket: Int): (Seq[BandFlag], Seq[SeenSig]) = {
    var cur = entries
    val admitted = Seq.newBuilder[SeenSig]
    val flags = rows.sortBy(_.doc_id).map { r =>
      val hit = cur.exists(e => simFrac(e.sig, r.sig) >= threshold)
      if (cur.size < maxBucket) {
        val s = SeenSig(r.doc_id, r.sig)
        admitted += s
        cur = cur :+ s
      }
      BandFlag(r.doc_id, r.band_key, hit)
    }
    (flags, admitted.result())
  }

  /** transformWithState processor: ListState of admitted signatures
    * per band bucket (RocksDB-backed; TimeMode.None — the corpus
    * membership IS the state, it does not age out in this operator;
    * a TTL'd deployment would run ProcessingTime + TTLConfig).
    */
  class NearDupProcessor(threshold: Double, maxBucket: Int)
      extends StatefulProcessor[String, BandDoc, BandFlag] {

    @transient private var seen: ListState[SeenSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[SeenSig]("seen",
        Encoders.product[SeenSig], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandDoc],
        timerValues: TimerValues): Iterator[BandFlag] = {
      val entries = seen.get().toIndexedSeq
      val (flags, admitted) = foldBucket(entries, rows.toSeq, threshold, maxBucket)
      if (admitted.nonEmpty) seen.appendList(admitted.toArray)
      flags.iterator
    }
  }

  /** Streaming per-(doc, band) near-dup flags over banded rows. */
  def stage(banded: Dataset[BandDoc],
      threshold: Double = DefaultThreshold,
      maxBucket: Int = DefaultMaxBucket): Dataset[BandFlag] = {
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.band_key)
      .transformWithState(new NearDupProcessor(threshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
