package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the exact late-row boundary semantics of
  * `flatMapGroupsWithState` + event-time watermark — the s11 oracle
  * reproduces the multi-batch watermark schedule in SQL, so the drop
  * predicate at EXACTLY the watermark must be known, not guessed.
  *
  * Note the one-batch LAG: the late filter of batch N uses the
  * watermark recorded in batch N−1's offset metadata (max event time
  * through batch N−2 minus delay). This test still exercises the
  * post-advance filter because `processAllAvailable()` after the
  * first add runs an extra no-data batch when the watermark advances,
  * so the second `addData` lands in a batch whose late-filter
  * watermark is already 10:20. Back-to-back data batches with no idle
  * gap (the s11 file schedule) see the older, lagged watermark — the
  * s11 oracle models exactly that.
  */
class LateBoundarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hms: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hms")

  private def meta(id: String, t: String, eventId: Long): ClipMeta =
    ClipMeta(id, 8000, 100, "pcm16le", s"t$eventId", ts(t), eventId)

  test("rows at or below the watermark drop; only strictly newer survive (fMGWS late filter)") {
    val input = MemoryStream[ClipMeta](11, spark, None)
    val q = ClipPipeline
      .dedupStage(input.toDS().withWatermark("event_time", "10 minutes"))
      .toDF()
      .writeStream.format("memory").queryName("late_boundary")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: max event time 10:30:00 → watermark 10:20:00
      input.addData(meta("a", "10:30:00", 1))
      q.processAllAvailable()
      // batch 2: one row AT the watermark, one 1s older, one 1s newer
      input.addData(
        meta("at_wm", "10:20:00", 2),
        meta("older", "10:19:59", 3),
        meta("newer", "10:20:01", 4))
      q.processAllAvailable()
      val kept = spark.table("late_boundary")
        .select("clip_id").as[String].collect().toSet
      // Spark's fMGWS late filter drops event_time <= watermark — the
      // AT-watermark row is late too. The s11 oracle mirrors this with
      // a strict `event_time > wm` survival predicate.
      assert(kept == Set("a", "newer"),
        s"late filter must keep only strictly-newer rows, got $kept")
    } finally q.stop()
  }

  test("append-mode windowed agg: final flush uses the LAST batch's stats; emission is window_end <= watermark") {
    // Pins the two facts the s14 oracle depends on:
    //  1. after the last data batch, the no-data flush batch emits with
    //     a watermark that already includes the last batch's max event
    //     time (so the oracle's final-emission cutoff is max over ALL
    //     batches minus the delay — not the lagged value the LATE
    //     filter uses inside a data batch);
    //  2. the emission predicate at the exact boundary: a window whose
    //     end equals the watermark IS emitted (end <= wm), mirroring
    //     the late filter's complementary strictness above.
    val input = MemoryStream[ClipMeta](12, spark, None)
    val clips = input.toDS().toDF()
      .withColumn("event_time", org.apache.spark.sql.functions.col("event_time"))
      .withWatermark("event_time", "10 minutes")
    val rolled = ClipPipeline.tumblingRollup(clips, "1 hour")
    val q = rolled.writeStream.format("memory").queryName("agg_boundary")
      .outputMode(OutputMode.Append).start()
    try {
      // ONE data batch: a 10:30 row (window 10:00–11:00) plus a row at
      // 11:10 whose event time advances the watermark to exactly 11:00
      // — the 10–11 window's end. If the flush used the lagged
      // watermark (stats through batch N−2 = nothing), no window could
      // emit; if the boundary predicate were strict (<), the 10–11
      // window would be withheld.
      input.addData(meta("w1", "10:30:00", 1), meta("w2", "11:10:00", 2))
      q.processAllAvailable()
      val emitted = spark.table("agg_boundary")
        .select("window_start").collect().map(_.get(0).toString).toSet
      assert(emitted == Set("2024-01-01 10:00:00.0"),
        s"expected exactly the 10:00 window at the wm==end boundary, got $emitted")
    } finally q.stop()
  }

  test("windowed agg late filter is WINDOW-level: rows drop iff window_end <= wm, not by raw event time") {
    // The agg path's late filter differs from fMGWS's row-level one
    // pinned above: a row is late only when its WINDOW is already
    // closed (window_end <= watermark — an earlier draft of this test
    // assumed the fMGWS row-level rule and got n_clips=4, all rows of
    // a still-open window admitted, not 2). The s14/s15 oracles model
    // exactly this. Three facts pinned here, with the late-filter
    // watermark at exactly 10:00 (batch-1 row 10:10, delay 10 min,
    // idle batch advances the filter before batch 2):
    //  1. a batch-2 row at 08:30 (window 8–9, end 09:00 < wm) drops;
    //  2. a row at 09:30 whose window end is EXACTLY the watermark
    //     (9–10, end == 10:00) drops too — window-close is `end <= wm`,
    //     the complement of the `end <= wm` emission rule, so the 9–10
    //     window never appears in the output at all;
    //  3. rows at 10:00:00 (== wm — row-level strictness would drop
    //     it) and 10:05 are admitted because window 10–11 is open.
    // The flush batch (12:30 → wm 12:20) then emits 10–11 with all
    // three admitted rows; 12–13 stays open and is withheld.
    val input = MemoryStream[ClipMeta](13, spark, None)
    val clips = input.toDS().toDF()
      .withWatermark("event_time", "10 minutes")
    val rolled = ClipPipeline.tumblingRollup(clips, "1 hour")
    val q = rolled.writeStream.format("memory").queryName("agg_late_boundary")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(meta("a", "10:10:00", 1))
      q.processAllAvailable() // late-filter wm now 10:00 (idle batch ran)
      input.addData(
        meta("closed", "08:30:00", 2),
        meta("end_at_wm", "09:30:00", 3),
        meta("row_at_wm", "10:00:00", 4),
        meta("open", "10:05:00", 5))
      q.processAllAvailable()
      input.addData(meta("flush", "12:30:00", 6))
      q.processAllAvailable()
      val out = spark.table("agg_late_boundary")
        .select("window_start", "n_clips").collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      assert(out == Map("2024-01-01 10:00:00.0" -> 3L),
        s"expected only the 10:00 window with n_clips=3, got $out")
    } finally q.stop()
  }

  test("session windows: late filter on the row's prospective end (ts+gap <= wm drops); late rows re-open fresh sessions past emitted ones") {
    // Pins the s15 oracle's session-specific facts (gap 30 min,
    // delay 10 min, sessions keyed by codec on event_time):
    //  1. batch 1 rows at 11:15 and 12:00 leave watermark 11:50 and —
    //     in the idle batch processAllAvailable runs — already emit
    //     session [11:15, 11:45) (end <= wm), keeping [12:00, 12:30);
    //  2. batch-2 late filter drops a row iff its PROSPECTIVE session
    //     end, ts + gap, is <= the watermark — 10:40 (end 11:10) and
    //     the exact-boundary 11:20 (end == 11:50) drop; 11:25 (end
    //     11:55 > 11:50) is admitted even though its ts is BELOW the
    //     watermark and it overlaps the already-emitted session —
    //     emitted state is gone, so it opens a FRESH session
    //     [11:25, 11:55) rather than resurrecting/merging;
    //  3. the flush (13:30 → wm 13:20) emits [11:25,11:55) and
    //     [12:00,12:30) and withholds the still-open [13:30,14:00).
    val input = MemoryStream[ClipMeta](14, spark, None)
    val clips = input.toDS().toDF()
      .withWatermark("event_time", "10 minutes")
    val sessions = ClipPipeline
      .sessionRollup(clips, "event_time", "codec", "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess_boundary")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(meta("a", "11:15:00", 1), meta("b", "12:00:00", 2))
      q.processAllAvailable() // late-filter wm now 11:50 (idle batch ran)
      input.addData(
        meta("dropped", "10:40:00", 3),   // prospective end 11:10 < wm
        meta("boundary", "11:20:00", 4),  // prospective end == wm
        meta("reopen", "11:25:00", 5))    // prospective end 11:55 > wm
      q.processAllAvailable()
      input.addData(meta("flush", "13:30:00", 6))
      q.processAllAvailable()
      val out = spark.table("sess_boundary")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2))).toSet
      val expected = Set(
        ("2024-01-01 11:15:00.0", "2024-01-01 11:45:00.0", 1L),
        ("2024-01-01 11:25:00.0", "2024-01-01 11:55:00.0", 1L),
        ("2024-01-01 12:00:00.0", "2024-01-01 12:30:00.0", 1L))
      assert(out == expected, s"session schedule mismatch: got $out")
    } finally q.stop()
  }

  test("UPDATE mode emits only changed groups with cumulative values; memory sink keeps one row per emission") {
    // Pins the s16 oracle's facts: (1) a batch emits a group iff it
    // received admitted rows in that batch (window B appears once);
    // (2) the emitted value is CUMULATIVE (window A's second emission
    // reads 3, not a delta of 1); (3) the memory sink accumulates one
    // row per emission in update mode, so a twice-touched group yields
    // two rows with strictly growing counts; (4) eviction is SILENT —
    // window B (end 10:00 <= wm 10:10) is evicted from state after
    // batch 1 without being re-emitted, and the batch-2 row at 10:30
    // is admitted because window A (end 11:00) is still open.
    val input = MemoryStream[ClipMeta](15, spark, None)
    val clips = input.toDS().toDF()
      .withWatermark("event_time", "10 minutes")
    val rolled = ClipPipeline.tumblingRollup(clips, "1 hour")
    val q = rolled.writeStream.format("memory").queryName("upd_mode")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(meta("a1", "10:10:00", 1), meta("a2", "10:20:00", 2),
        meta("b1", "09:30:00", 3))
      q.processAllAvailable() // wm now 10:10 → window B evicted (silently)
      input.addData(meta("a3", "10:30:00", 4))
      q.processAllAvailable()
      val out = spark.table("upd_mode")
        .select("window_start", "n_clips").collect()
        .map(r => (r.get(0).toString, r.getLong(1))).toSeq
        .sortBy(identity)
      val expected = Seq(
        ("2024-01-01 09:00:00.0", 1L), // batch 1: window B, then silent eviction
        ("2024-01-01 10:00:00.0", 2L), // batch 1: window A cumulative 2
        ("2024-01-01 10:00:00.0", 3L)) // batch 2: window A cumulative 3
      assert(out == expected, s"update-mode emission schedule mismatch: got $out")
    } finally q.stop()
  }
}
