package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One document entering the per-source token budget: its source
  * stratum and normalized token count.
  */
final case class DocTok(source: String, doc_id: Long, n_tok: Long)

/** Per-document admission decision: `cum_tokens` is the source's
  * running token total INCLUDING this document (in processing order),
  * `admitted` iff that total is still within the budget.
  */
final case class TokAdmit(doc_id: Long, source: String, n_tok: Long,
    cum_tokens: Long, admitted: Boolean)

/** Streaming token-budget truncation — the ingestion-time form of a
  * mixing run's "stop when this source has contributed its target
  * tokens": documents arrive as a stream and each source admits docs
  * in processing order until its running token total passes the
  * budget; everything after the cut is emitted rejected (audit row),
  * never silently dropped.
  *
  * Semantics: the running total accumulates over EVERY document (the
  * budget cuts the token STREAM at a position, it does not knapsack
  * around large docs — greedy skip would make admission depend on
  * rejected history, which no prefix-sum oracle can express), so a
  * document is admitted iff its inclusive prefix sum ≤ budget. Within
  * a batch rows fold in doc_id order; across batches the state carries
  * the total, so processing order is (batch, doc_id) — the same
  * order contract as [[StreamNearDup]], and the s34/s35 oracles are
  * one window function: `SUM(n_tok) OVER (PARTITION BY source ORDER
  * BY <processing order>) <= budget`.
  *
  * 100 TB shape: state is ONE long per source (strata are few), rows
  * do constant work, and the stream side never joins or rescans —
  * the batch q74 derives the rate from a finished corpus; this is
  * what an ingestion pipeline does instead when the corpus is still
  * arriving.
  *
  * Reference analogue: the keyed stateful update of
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/Hl7LabMapper.java:160-179
  * (per-key accumulator consulted and advanced by each record), with
  * the accumulator lifted from a dedup set to a token budget.
  */
object StreamTokenBudget {

  /** The accumulate-then-compare fold for one source and one batch of
    * rows — shared by the engine processor and the model test. Returns
    * the admission rows in doc_id order and the advanced total.
    */
  private[streaming] def foldSource(cum0: Long, rows: Seq[DocTok],
      budget: Long): (Seq[TokAdmit], Long) = {
    var cum = cum0
    val out = rows.sortBy(_.doc_id).map { r =>
      cum += r.n_tok
      TokAdmit(r.doc_id, r.source, r.n_tok, cum, cum <= budget)
    }
    (out, cum)
  }

  /** Tokenized rows for a documents relation — the q71/q74 token
    * counting (normalize → split → size), batch and streaming alike.
    */
  def docTokens(docs: DataFrame): Dataset[DocTok] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.normalizeTranscript(col("text")).as("__norm"))
      .filter(length(col("__norm")) > 0)
      .select(col("source"), col("doc_id"),
        size(split(col("__norm"), " ")).cast("long").as("n_tok"))
      .as[DocTok]
  }

  /** transformWithState processor: one ValueState[Long] per source
    * (TimeMode.None — a mixing budget does not age out).
    */
  class BudgetProcessor(budget: Long)
      extends StatefulProcessor[String, DocTok, TokAdmit] {

    @transient private var cum: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[TokAdmit] = {
      val cum0 = if (cum.exists()) cum.get() else 0L
      val (out, cum1) = foldSource(cum0, rows.toSeq, budget)
      cum.update(cum1)
      out.iterator
    }
  }

  /** Streaming per-document admission rows over tokenized docs. */
  def stage(toks: Dataset[DocTok], budget: Long): Dataset[TokAdmit] = {
    import toks.sparkSession.implicits._
    toks
      .groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming per-document token POSITIONS: the budget processor
    * with an unlimited budget is exactly the per-source streaming
    * prefix sum, so the position assigner of the sequence packer
    * (s36/s37, the ingestion-time q71) is the same stateful operator
    * — `tok_end` is the inclusive running total the state carries
    * across batches, `tok_start` backs the document's own count out.
    */
  def positions(toks: Dataset[DocTok]): DataFrame =
    stage(toks, Long.MaxValue).toDF()
      .select(col("source"), col("doc_id"),
        (col("cum_tokens") - col("n_tok")).as("tok_start"),
        col("cum_tokens").as("tok_end"))
}
