package graft.streaming

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.audio.Codecs
import graft.model.Clip
import graft.synth.ClipGen

/** Audio-curation operator semantics: fused profile stage, quality
  * gate, and the per-fingerprint-class canonical election (q66–q68,
  * s28).
  */
class AudioCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def prof(id: String, minute: Int, f1: Int = 130, f2: Int = 796,
      durMs: Int = 900, rms: Double = 0.44, clipped: Int = 0,
      tone: Double = 0.0): ProfiledClip =
    ProfiledClip(id, ts(minute), "pcm16le", 8000, durMs, rms, clipped,
      tone, f1, f2)

  test("profileStage: one fused pass reproduces the standalone kernels; unknown codec drops (M4/F4)") {
    val clips = Seq(
      (7L, 8000, 700, "ulaw"), (123L, 16000, 900, "adpcm"),
      (41L, 44100, 300, "pcm16le")).map { case (seed, sr, dur, codec) =>
      Clip(s"c-$seed", Codecs.encode(codec, ClipGen.samplesFor(seed, sr, dur)),
        sr, dur, codec, "t", LocalDateTime.of(2024, 1, 1, 10, 0, seed.toInt % 60))
    } :+ Clip("c-bad", Array[Byte](1, 2), 8000, 100, "unknown", "t",
      LocalDateTime.of(2024, 1, 1, 10, 0, 59))
    val out = AudioCuration.profileStage(spark.createDataset(clips))
      .collect().map(p => p.clip_id -> p).toMap
    assert(out.size == 3 && !out.contains("c-bad"))
    clips.filter(_.codec != "unknown").foreach { c =>
      val want = Codecs.curationProfile(c.codec, c.bytes, c.sr_hz).toOption.get
      val got = out(c.clip_id)
      assert((got.fp_f1, got.fp_f2) == (want.fpF1, want.fpF2), c.clip_id)
      assert(got.tone_power == want.tonePower, c.clip_id)
      assert(got.rms ==
        AudioCuration.round4(math.sqrt(want.stats.sumSq / want.stats.n)), c.clip_id)
      assert(got.clipped == want.stats.clipped && got.dur_ms == c.dur_ms, c.clip_id)
    }
  }

  test("gate admits only ≥500 ms, unclipped, in-band RMS, tone-free clips (F2/F5)") {
    assert(AudioCuration.gate(prof("a", 0)))
    assert(!AudioCuration.gate(prof("a", 0, durMs = 499)))
    assert(AudioCuration.gate(prof("a", 0, durMs = 500)))
    assert(!AudioCuration.gate(prof("a", 0, clipped = 1)))
    assert(!AudioCuration.gate(prof("a", 0, rms = 0.0999)))
    assert(AudioCuration.gate(prof("a", 0, rms = 0.1)))
    assert(AudioCuration.gate(prof("a", 0, rms = 0.9)))
    assert(!AudioCuration.gate(prof("a", 0, rms = 0.9001)))
    assert(!AudioCuration.gate(prof("a", 0, tone = 0.0051)))
    assert(AudioCuration.gate(prof("a", 0, tone = 0.005))) // strict >
  }

  test("canonical election is a changelog: count accumulates and an earlier late row re-elects across batches (D1)") {
    val input = MemoryStream[ProfiledClip](101, spark, None)
    val q = AudioCuration
      .keepStage(input.toDS().withWatermark("event_time", "10 minutes"))
      .toDF()
      .writeStream.format("memory").queryName("keep_t1")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(prof("b", 5), prof("c", 7), prof("z", 3, f1 = 200))
      q.processAllAvailable()
      input.addData(prof("a", 2), prof("d", 8)) // minute 2: earlier than b
      q.processAllAvailable()

      val rows = spark.table("keep_t1")
        .select("fp_f1", "n_candidates", "clip_id", "event_time")
        .as[(Int, Long, String, Timestamp)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
      assert(rows == Seq(
        (130, 2L, "b", ts(5)), // batch 1: b (min 5) beats c (min 7)
        (130, 4L, "a", ts(2)), // batch 2: late-but-earlier a re-elected
        (200, 1L, "z", ts(3))))
    } finally q.stop()
  }

  test("election tie on event time breaks by clip_id; state TTL purge emits nothing") {
    val input = MemoryStream[ProfiledClip](102, spark, None)
    val q = AudioCuration
      .keepStage(input.toDS().withWatermark("event_time", "1 minute"),
        stateTtlMs = 60 * 1000)
      .toDF()
      .writeStream.format("memory").queryName("keep_t2")
      .outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(prof("x2", 0), prof("x1", 0))
      q.processAllAvailable()
      // advance the watermark far past x's ttl: state purge, no emission
      input.addData(prof("far", 50, f1 = 300))
      q.processAllAvailable()
      val rows = spark.table("keep_t2")
        .select("fp_f1", "n_candidates", "clip_id")
        .as[(Int, Long, String)].collect().toSeq.sorted
      assert(rows == Seq((130, 2L, "x1"), (300, 1L, "far")))
    } finally q.stop()
  }
}
