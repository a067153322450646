package graft.model

import java.time.LocalDateTime

/** Core data model of the engine.
  *
  * The input table shape is mandated by BASELINE.json `input_hint`:
  * audio clip + transcript pairs. This is the graft analogue of the
  * reference's `LaboratoryReport` envelope
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/model/LaboratoryReport.java:21-27):
  * an id, a binary payload that needs decoding, and event-time metadata.
  */
final case class Clip(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String,
    event_time: LocalDateTime)

/** Late-arriving transcript correction — the second stream of the
  * stream-stream join (SURVEY.md §2.4 J3). Analogue of the reference's
  * second (hl7) topic feeding the same output
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/processor/LabToFhirProcessor.java:43-49).
  */
final case class TranscriptUpdate(
    clip_id: String,
    u_transcript: String,
    u_event_time: LocalDateTime)

/** Summary of the decoded PCM payload — the analogue of the mapped
  * FHIR Observation value set (quantity/interpretation/range family,
  * /root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/BaseMapper.java:298-390).
  */
final case class PcmSummary(
    n_samples: Int,
    rms: Double,
    peak: Double,
    zero_crossings: Int,
    clipped: Int)

/** Output record of the per-record map stage — the analogue of the
  * reference's transaction `Bundle`
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/AimLabMapper.java:57-115):
  * one input record maps to 0..1 enriched output records; failures are
  * skipped with an error reason retained for metrics.
  */
final case class MappedClip(
    clip_id: String,
    out_id: String, // deterministic surrogate id (timestamp-prefixed)
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    pcm: PcmSummary,
    transcript_norm: String,
    n_tokens: Int,
    event_time: LocalDateTime)

/** Dedup decision emitted per input record by the keyed stateful
  * operator (SURVEY.md §2.8 D1) — generalizes the reference's
  * within-message duplicate-id suffixing
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/mapper/Hl7LabMapper.java:160-179)
  * to a per-key stateful dedup across the stream.
  */
final case class DedupDecision(
    clip_id: String,
    // 1-based occurrence index per key: event-time order WITHIN each
    // micro-batch, arrival order across batches (a decision already
    // emitted for an earlier batch cannot be renumbered when a late
    // row arrives — the out-of-order window is bounded by the
    // watermark, beyond which late rows are dropped)
    occurrence: Int,
    out_id: String, // clip_id for first occurrence, clip_id + "_" + i after
    is_dup: Boolean,
    event_time: java.sql.Timestamp, // LTZ: carried through watermarked streams
    transcript: String)

/** Per-window rollup row (SURVEY.md §2.5 A3 / §2.8 D4). */
final case class WindowRollup(
    window_start: LocalDateTime,
    window_end: LocalDateTime,
    codec: String,
    n_clips: Long,
    total_dur_ms: Long,
    distinct_clips: Long)
