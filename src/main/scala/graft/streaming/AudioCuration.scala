package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.audio.Codecs
import graft.model.Clip

/** Per-clip audio-curation profile: everything the training-data
  * curation queries (q66–q68, s28) need from one clip, produced by ONE
  * fused decode pass ([[Codecs.curationProfile]] — decode + stats +
  * 500 Hz probe + content fingerprint, asserted bit-identical to the
  * standalone kernels in CodecsSpec).
  *
  * `rms` is pre-rounded at 4 decimals with the same HALF_UP-on-
  * decimal-rendering rule Spark's `round()` uses, so a quality gate on
  * it compares EXACTLY the value the staged expected-stat side table
  * (and therefore the DuckDB oracle) carries.
  */
final case class ProfiledClip(
    clip_id: String,
    event_time: java.sql.Timestamp,
    codec: String,
    sr_hz: Int,
    dur_ms: Int,
    rms: Double,
    clipped: Int,
    tone_power: Double,
    fp_f1: Int,
    fp_f2: Int)

/** Canonical-election state per fingerprint class: candidate count plus
  * the minimum (event-time µs, clip_id) seen — a pure order-independent
  * fold, so arrival order across partitions and micro-batches can never
  * change the elected canonical.
  */
final case class CurationState(n: Long, bestUs: Long, bestClip: String)

/** One kept (canonical) clip per fingerprint class, emitted when the
  * class's state times out past the watermark.
  */
final case class KeepDecision(
    fp_f1: Int,
    fp_f2: Int,
    n_candidates: Long,
    clip_id: String,
    event_time: java.sql.Timestamp)

/** Audio training-data curation: decode-derived quality gates plus
  * content-fingerprint canonical election — the audio analogue of the
  * text pipeline's q48 keep-list (quality gates → dedup → canonical
  * survivors), built on the [[graft.audio.Fingerprint]] cross-codec
  * content key.
  *
  * Reference analogue: the filter-then-map admission chain of
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/processor/LabToFhirProcessor.java:39-40
  * with the keyed stateful merge of
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/Hl7LabMapper.java:160-179,
  * lifted to audio-content curation.
  */
object AudioCuration {

  /** Spark-`round()`-compatible rounding (HALF_UP on the decimal
    * rendering of the double — `BigDecimal.valueOf` goes through
    * `Double.toString` exactly like Catalyst's `Round`).
    */
  def round4(x: Double): Double =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** One fused decode pass per clip → [[ProfiledClip]]. Identical on
    * batch and streaming inputs (typed flatMap; undecodable clips —
    * unknown codec, malformed payload — drop here, the F4 guard).
    * The NTZ event time goes through a session-TZ cast to TimestampType
    * (the s02 pattern) so the streaming side can watermark it.
    */
  def profileStage(clips: Dataset[Clip]): Dataset[ProfiledClip] = {
    import clips.sparkSession.implicits._
    clips
      .flatMap { c =>
        if (c.codec == "unknown") None
        else Codecs.curationProfile(c.codec, c.bytes, c.sr_hz).toOption.map { p =>
          (c.clip_id, c.event_time, c.codec, c.sr_hz, c.dur_ms,
            round4(math.sqrt(p.stats.sumSq / p.stats.n)), p.stats.clipped,
            p.tonePower, p.fpF1, p.fpF2)
        }
      }
      .toDF("clip_id", "event_time", "codec", "sr_hz", "dur_ms", "rms",
        "clipped", "tone_power", "fp_f1", "fp_f2")
      .withColumn("event_time", col("event_time").cast("timestamp"))
      .as[ProfiledClip]
  }

  /** Quality admission gate, shared verbatim by the batch keep-list
    * (q67) and the streaming curation (s28) so the two can share one
    * oracle. Every threshold compares a value whose engine/oracle
    * agreement is hard-asserted at staging time: `dur_ms`/`clipped`
    * are exact ints, `rms` is the staged round-4 value, and the
    * 500 Hz-tone flag is only consulted at ≥ 500 ms where staging
    * asserts the Goertzel/DFT flag agreement (shorter clips can't
    * separate the probe from 10 Hz-away content — the q58 'short'
    * class — and the `dur_ms` gate already rejects them).
    */
  def gate(p: ProfiledClip): Boolean =
    p.dur_ms >= 500 &&
      p.clipped == 0 &&
      p.rms >= 0.1 && p.rms <= 0.9 &&
      !(p.tone_power > 0.005)

  /** Default state TTL past the watermark, mirroring
    * [[ClipPipeline.dedupStage]].
    */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  /** Per-fingerprint-class canonical election (fMGWS,
    * EventTimeTimeout): fold rows into the order-independent
    * (count, min (event-time µs, clip_id)) state and emit the
    * refreshed [[KeepDecision]] for every micro-batch that carries
    * rows for the class — CHANGELOG semantics (the s02 emission
    * discipline): each emission is "the canonical election as of this
    * batch", so a single-data-batch input yields exactly the final
    * election and the oracle needs no timer/watermark cutoff model.
    * Timeout (state TTL past the watermark) PURGES a quiet class's
    * state silently; emission never depends on a timer firing, which
    * would otherwise withhold every class whose last event sits within
    * ttl+delay of the stream's maximum event time.
    *
    * 100 TB shape: state is one (long, long, string) per DISTINCT
    * fingerprint, and a real corpus's fingerprint space is
    * content-derived high-cardinality (the synthetic grid's 920
    * classes are a test-scale artifact, not the operator's key space),
    * so keyed-state parallelism holds. When the key space IS known to
    * be small, the partial-aggregable twin of this fold is a streaming
    * `groupBy(fp).agg(count, min_by)` (map-side combine before the
    * shuffle, the s08 shape); fMGWS is used here for what the agg form
    * cannot express — TTL'd custom state with timeout-driven emission.
    */
  def keepFn(stateTtlMs: Long)(
      key: (Int, Int),
      rows: Iterator[ProfiledClip],
      state: GroupState[CurationState]): Iterator[KeepDecision] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      var n = 0L
      var bestUs = Long.MaxValue
      var bestClip = ""
      state.getOption.foreach { s =>
        n = s.n; bestUs = s.bestUs; bestClip = s.bestClip
      }
      var lastMs = Long.MinValue
      rows.foreach { r =>
        val us = ClipPipeline.epochUs(r.event_time)
        n += 1
        if (us < bestUs || (us == bestUs && r.clip_id < bestClip)) {
          bestUs = us
          bestClip = r.clip_id
        }
        lastMs = math.max(lastMs, r.event_time.getTime)
      }
      state.update(CurationState(n, bestUs, bestClip))
      val wm = state.getCurrentWatermarkMs()
      val base = if (lastMs == Long.MinValue) wm else math.max(wm, lastMs)
      state.setTimeoutTimestamp(base + stateTtlMs)
      Iterator.single(KeepDecision(key._1, key._2, n, bestClip,
        ClipPipeline.usToTimestamp(bestUs)))
    }
  }

  /** Streaming keyed canonical election. Input must carry an
    * event-time watermark.
    */
  def keepStage(profiled: Dataset[ProfiledClip],
      stateTtlMs: Long = DefaultTtlMs): Dataset[KeepDecision] = {
    import profiled.sparkSession.implicits._
    profiled
      .groupByKey(p => (p.fp_f1, p.fp_f2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        keepFn(stateTtlMs))
  }
}
