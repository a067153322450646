package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One candidate flowing into the per-stratum quota sample: the row id,
  * its deterministic pseudo-random rank key (an md5 hex string — the
  * only cross-engine-safe randomness, see BENCH.md §3), and the
  * stratum's quota (constant within a group; carried on the row so the
  * aggregator needs no per-group side channel).
  */
final case class SampleCand(doc_id: Long, key: String, quota: Int)

/** One kept sample: the row id and its 1-based rank within the stratum
  * (rank 1 = smallest md5 key).
  */
final case class SampledDoc(doc_id: Long, rn: Long)

/** Exact per-stratum quota sampling as a k-bounded typed
  * [[Aggregator]] — the scale-safe replacement for `row_number().over
  * (Window.partitionBy(stratum))`, which shuffles EVERY row of a
  * stratum to the single task owning it and sorts the stratum there
  * (strata are coarse — languages, sources — so at corpus scale that
  * task holds billions of rows: the same single-reducer anti-pattern
  * [[TopKHits]] removed from the ANN rank, here with a DATA-DEPENDENT
  * k).
  *
  * Each map-side partial keeps at most `2·quota` candidates (compacted
  * back to `quota` on overflow), so the exchange carries
  * ≤ 2·quota·nPartitions rows per stratum instead of the stratum, and
  * the final merge holds ≤ 2·quota. `quota` rides on the input rows
  * (joined on beforehand from the stratum counts), which is what lets
  * one aggregator instance serve every stratum with its own k.
  *
  * The bound is only a bound if the CALLER bounds the quota: an
  * uncapped proportional quota (e.g. ceil(n/5) of a billion-row
  * stratum) degenerates to the window this replaces — ~n/5 candidates
  * on the final-merge task. Real mixing runs keep a fixed count per
  * stratum; q70 models that with `least(ceil(n/5), 64)`. Ordering
  * matches the window it replaces AND the DuckDB oracle: md5 key ASC
  * (hex strings — both engines compare them bytewise), doc_id ASC
  * tiebreak.
  */
final class QuotaSample
    extends Aggregator[SampleCand, ArrayBuffer[SampleCand], Seq[SampledDoc]] {

  private def quotaOf(b: ArrayBuffer[SampleCand]): Int =
    if (b.isEmpty) 0 else b.head.quota

  private def compact(b: ArrayBuffer[SampleCand]): ArrayBuffer[SampleCand] = {
    val q = quotaOf(b)
    if (q > 0 && b.length > 2 * q) {
      b.sortInPlace()(QuotaSample.KeyAsc)
      b.takeInPlace(q)
    }
    b
  }

  def zero: ArrayBuffer[SampleCand] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[SampleCand], c: SampleCand): ArrayBuffer[SampleCand] =
    compact(b += c)

  def merge(a: ArrayBuffer[SampleCand], b: ArrayBuffer[SampleCand]): ArrayBuffer[SampleCand] =
    compact(a ++= b)

  def finish(b: ArrayBuffer[SampleCand]): Seq[SampledDoc] = {
    b.sortInPlace()(QuotaSample.KeyAsc)
    b.take(quotaOf(b)).zipWithIndex.map { case (c, i) => SampledDoc(c.doc_id, i + 1L) }.toSeq
  }

  def bufferEncoder: Encoder[ArrayBuffer[SampleCand]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[SampledDoc]] = ExpressionEncoder()
}

object QuotaSample {

  /** md5 key ASC (bytewise — ASCII hex compares identically in the JVM
    * and DuckDB), doc_id ASC tiebreak (md5 collisions notwithstanding,
    * determinism must not hang on key uniqueness).
    */
  val KeyAsc: Ordering[SampleCand] = new Ordering[SampleCand] {
    def compare(a: SampleCand, b: SampleCand): Int = {
      val c = a.key.compareTo(b.key)
      if (c != 0) c else java.lang.Long.compare(a.doc_id, b.doc_id)
    }
  }

  /** Column form: `quotaSample(docId, key, quota)` aggregates to
    * `array<struct<doc_id, rn>>`, the stratum's kept sample in rank
    * order.
    */
  def udafColumn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuotaSample, Encoders.product[SampleCand])
}
