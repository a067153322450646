package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One document entering the per-source online top-k: `key` is its
  * deterministic md5 rank key (the repo-wide cross-engine randomness).
  */
final case class RankedDoc(source: String, doc_id: Long, key: String)

/** Per-document arrival decision: `in_topk` iff the document's rank
  * key was among the k smallest its source had seen at arrival time.
  */
final case class TopKFlag(doc_id: Long, source: String, key: String,
    in_topk: Boolean)

/** One retained heap entry (kept sorted ascending by (key, doc_id)). */
final case class HeapEntry(key: String, doc_id: Long)

/** Streaming online top-k admission — the ingestion-time form of the
  * q70 quota sample: documents arrive as a stream and each is flagged
  * AT ARRIVAL iff its rank key is among the k smallest its source has
  * seen so far. The state is the running k-minimum set itself
  * (bounded, sorted, with EVICTION — unlike [[StreamNearDup]]'s
  * append-only first-k admission, a later smaller key displaces the
  * current maximum), so the flag is exactly "rank among seen-so-far
  * ≤ k": the heap holds the k smallest seen, and a new entry ranks
  * ≤ k iff the heap is not full or the entry is below its maximum.
  *
  * The flag is an arrival-time decision and is never retracted
  * (append mode): a doc admitted in batch 0 may be displaced from the
  * heap by batch 2, but its `in_topk` stays true — the operator
  * answers "was this in the running top-k when it arrived", which is
  * what an ingestion pipeline can act on online. The final batch
  * top-k is the batch q70 quota sample's job.
  *
  * 100 TB shape: state is ≤ k (key, id) entries per source (strata
  * are few and k is small), each arriving row costs one bounded
  * insert — constant work, no joins, no corpus rescans. The oracle is
  * a prefix-rank count over the engine's processing order.
  */
object StreamTopK {

  val DefaultK = 16

  private[streaming] val EntryOrd: Ordering[HeapEntry] =
    Ordering.by((e: HeapEntry) => (e.key, e.doc_id))

  /** The probe-then-insert fold for one source and one batch of rows —
    * shared by the engine processor and the model test. Returns the
    * flags in doc_id order and the advanced heap (ascending, ≤ k).
    */
  private[streaming] def foldSource(heap0: IndexedSeq[HeapEntry],
      rows: Seq[RankedDoc], k: Int): (Seq[TopKFlag], IndexedSeq[HeapEntry]) = {
    var heap = heap0.sorted(EntryOrd)
    val out = rows.sortBy(_.doc_id).map { r =>
      val e = HeapEntry(r.key, r.doc_id)
      val admit = heap.size < k || EntryOrd.lt(e, heap.last)
      if (admit) {
        heap = (heap :+ e).sorted(EntryOrd)
        if (heap.size > k) heap = heap.dropRight(1)
      }
      TopKFlag(r.doc_id, r.source, r.key, admit)
    }
    (out, heap)
  }

  /** Ranked rows for a documents relation — md5 rank key per doc,
    * batch and streaming alike.
    */
  def rankedDocs(docs: DataFrame): Dataset[RankedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), col("doc_id"),
        md5(concat(lit("tk:"), col("doc_id").cast("string"))).as("key"))
      .as[RankedDoc]
  }

  /** transformWithState processor: the running k-minimum set in ONE
    * ListState per source, REWRITTEN via put() each batch (eviction
    * means the state shrinks as well as grows — append-only
    * appendList cannot express it).
    */
  class TopKProcessor(k: Int)
      extends StatefulProcessor[String, RankedDoc, TopKFlag] {

    @transient private var heap: ListState[HeapEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      heap = getHandle.getListState[HeapEntry]("heap",
        Encoders.product[HeapEntry], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RankedDoc],
        timerValues: TimerValues): Iterator[TopKFlag] = {
      val (flags, h) = foldSource(heap.get().toIndexedSeq, rows.toSeq, k)
      heap.put(h.toArray)
      flags.iterator
    }
  }

  /** Streaming per-document arrival-time top-k flags. */
  def stage(ranked: Dataset[RankedDoc], k: Int = DefaultK): Dataset[TopKFlag] = {
    import ranked.sparkSession.implicits._
    ranked
      .groupByKey(_.source)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
