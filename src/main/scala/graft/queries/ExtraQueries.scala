package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Third-wave operator breadth: BPE-style tokenization, the full
  * analytic-window family, fuzzy (edit-distance) matching.
  */
object ExtraQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** GPT-2-style piece regex (simplified to the character classes the
    * corpus contains): contractions, letter runs, digit runs,
    * punctuation runs, whitespace runs.
    */
  val BpePieceRegex = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9'\\s]+|\\s+"

  val defs: Seq[QueryDef] = Seq(
    // --------------------- q50 BPE-ish token counting (training pipeline)
    QueryDef(
      "q50_bpe_tokens",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        t(s, d, "documents")
          .orderBy(col("doc_id"))
          .select(col("doc_id"),
            size(split(normalizeTranscript(col("text")), " ")).as("ws_tokens"),
            regexp_count(col("text"), lit(BpePieceRegex)).as("bpe_pieces")),
      Some(s"""SELECT doc_id,
              |  len(string_split(${TextQueries.normSql("text")}, ' ')) AS ws_tokens,
              |  CAST(len(regexp_extract_all(text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9''\\s]+|\\s+')) AS INT) AS bpe_pieces
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ----------------------- q51 analytic window-function family (W1+)
    QueryDef(
      "q51_analytics",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .filter(col("o_custkey") % 20 === 0)
          .select(
            col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_orderkey"), 1).over(w).as("prev_key"),
            lead(col("o_orderkey"), 1).over(w).as("next_key"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"))
          .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
             |  lag(o_orderkey, 1) OVER w AS prev_key,
             |  lead(o_orderkey, 1) OVER w AS next_key,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume,
             |  CAST(rank() OVER w AS INT) AS rnk,
             |  CAST(dense_rank() OVER w AS INT) AS drnk
             |FROM orders WHERE o_custkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin)),

    // ----------------- q54 GROUPING SETS via the SQL entry point (A3)
    // Arbitrary grouping sets are SQL-only surface in Spark — this also
    // exercises the spark.sql()/temp-view API path of the engine.
    QueryDef(
      "q54_grouping_sets",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem")
        s.sql("""
          SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                 coalesce(l_linestatus, 'ALL') AS linestatus,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM graft_lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
          ORDER BY returnflag, linestatus""")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
             |ORDER BY returnflag, linestatus""".stripMargin)),

    // ------------- q53 repeating-value parse (C8: OBX-5 '~' repeats)
    // The reference splits repeating values on the HL7 repeat delimiter
    // and types each component numeric-vs-string
    // (Hl7LabMapper.java:239-267,525-544). Same semantics over a
    // synthesized repeating column: split on '~', per-component typed
    // struct, exploded 1:N with its index.
    QueryDef(
      "q53_repeating_values",
      (s, d) => {
        val raw = when(col("l_linenumber") % 3 === 0,
          concat(col("l_quantity").cast("int"), lit("~negativ")))
          .when(col("l_linenumber") % 3 === 1,
            concat(col("l_quantity").cast("int"), lit("~"),
              (col("l_quantity").cast("int") + 1), lit("~folgt")))
          .otherwise(col("l_quantity").cast("int").cast("string"))
        t(s, d, "lineitem")
          .filter(col("l_orderkey") % 10 === 0)
          .select(col("l_orderkey"), col("l_linenumber"), raw.as("raw"))
          .select(col("l_orderkey"), col("l_linenumber"), col("raw"),
            posexplode(split(col("raw"), "~")).as(Seq("rep_idx", "component")))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("rep_idx"),
            col("component"),
            when(col("component").rlike("^-?[0-9]+(\\.[0-9]+)?$"),
              col("component").cast("double")).as("num_value"),
            when(!col("component").rlike("^-?[0-9]+(\\.[0-9]+)?$"),
              col("component")).as("str_value"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("rep_idx"))
      },
      Some("""WITH src AS (
             |  SELECT l_orderkey, l_linenumber,
             |    CASE l_linenumber % 3
             |      WHEN 0 THEN CAST(trunc(l_quantity) AS INT) || '~negativ'
             |      WHEN 1 THEN CAST(trunc(l_quantity) AS INT) || '~' || (CAST(trunc(l_quantity) AS INT) + 1) || '~folgt'
             |      ELSE CAST(CAST(trunc(l_quantity) AS INT) AS VARCHAR) END AS raw
             |  FROM lineitem WHERE l_orderkey % 10 = 0),
             |ex AS (
             |  SELECT l_orderkey, l_linenumber, raw,
             |    CAST(u.i - 1 AS INT) AS rep_idx,
             |    string_split(raw, '~')[CAST(u.i AS INT)] AS component
             |  FROM src, LATERAL (SELECT unnest(range(1, len(string_split(raw, '~')) + 1)) AS i) u)
             |SELECT l_orderkey, l_linenumber, rep_idx, component,
             |  CASE WHEN regexp_matches(component, '^-?[0-9]+(\.[0-9]+)?$') THEN CAST(component AS DOUBLE) END AS num_value,
             |  CASE WHEN NOT regexp_matches(component, '^-?[0-9]+(\.[0-9]+)?$') THEN component END AS str_value
             |FROM ex ORDER BY l_orderkey, l_linenumber, rep_idx""".stripMargin)),

    // ------------------ q52 fuzzy matching via edit distance (dedup aid)
    // Distinct transcript tokens fuzzily matched (levenshtein ≤ 1)
    // against the codeword vocabulary — the classic fuzzy-join shape
    // with the small side broadcast.
    QueryDef(
      "q52_fuzzy_match",
      (s, d) => {
        val toks = graft.synth.ClipGen.clipsMeta(s, d)
          .select(explode(split(normalizeTranscript(col("transcript")), " ")).as("tok"))
          .distinct()
        import s.implicits._
        val vocab = graft.synth.ClipGen.Words.toDF("word")
        toks.join(broadcast(vocab), levenshtein(col("tok"), col("word")) <= 1)
          .select(col("tok"), col("word"),
            levenshtein(col("tok"), col("word")).as("dist"))
          .orderBy(col("tok"), col("word"))
      },
      Some {
        val words = graft.synth.ClipGen.Words
          .map(w => s"('$w')").mkString(", ")
        s"""WITH clips AS (${graft.synth.ClipGen.metaSql}),
           |toks AS (
           |  SELECT DISTINCT unnest(string_split(${TextQueries.normSql("transcript")}, ' ')) AS tok
           |  FROM clips),
           |vocab(word) AS (VALUES $words)
           |SELECT tok, word, CAST(levenshtein(tok, word) AS INT) AS dist
           |FROM toks JOIN vocab ON levenshtein(tok, word) <= 1
           |ORDER BY tok, word""".stripMargin
      }),

    // ----------------- q55 nested-struct reference rewrite (M10)
    // Each clip becomes a 2-entry bundle (array<struct{kind,ref}>); the
    // operator rewires every entry's ref in place (transform+withField,
    // no explode/regroup shuffle) and quarantines bundles containing an
    // unresolvable (null) ref — the AimLabMapper.java:323-363 rewiring
    // + validateReference-throws→skip semantics. Every 13th bundle
    // carries a null alt-ref, so the oracle shows both behaviors.
    QueryDef(
      "q55_struct_rewrite",
      (s, d) => {
        val clips = graft.synth.ClipGen.clipsMeta(s, d)
        val entries = array(
          struct(lit("primary").as("kind"), col("clip_id").as("ref")),
          struct(lit("alt").as("kind"),
            when(col("event_id") % 13 === 0, lit(null).cast("string"))
              .otherwise(concat(col("clip_id"), lit("#alt"))).as("ref")))
        val bundled = clips.select(col("event_id"), entries.as("entries"))
        val (ok, _) = graft.operators.StructRewrite.rewriteRefs(
          bundled, "entries", "ref", r => concat(lit("res/"), r))
        ok.select(col("event_id"),
            posexplode(col("entries")).as(Seq("pos", "e")))
          .select(col("event_id"), col("pos"),
            col("e.kind").as("kind"), col("e.ref").as("ref"))
          .orderBy(col("event_id"), col("pos"))
      },
      Some(s"""WITH clips AS (${graft.synth.ClipGen.metaSql}),
              |b AS (SELECT event_id, clip_id FROM clips WHERE event_id % 13 <> 0),
              |e AS (
              |  SELECT event_id, CAST(0 AS INT) AS pos, 'primary' AS kind, 'res/' || clip_id AS ref FROM b
              |  UNION ALL
              |  SELECT event_id, CAST(1 AS INT), 'alt', 'res/' || clip_id || '#alt' FROM b)
              |SELECT event_id, pos, kind, ref FROM e ORDER BY event_id, pos""".stripMargin)),

    // ------------- q56 G.711 decode laws value-checked against SQL (S7)
    // The engine's μ-law/A-law decoders are 256-entry pure functions
    // (ITU-T G.711 bit laws); this query runs graft.audio.Codecs over
    // the full byte domain (derived from events so the driver table is
    // the input) and the oracle re-implements both laws independently
    // in DuckDB integer arithmetic — converting the G.711 half of the
    // decode path from JVM-tested to value-oracled (p01 stays rows-only
    // for the stateful ADPCM codec).
    QueryDef(
      "q56_g711_decode_check",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .select((col("event_id") % 256).cast("int").as("b"))
          .distinct()
          .as[Int]
          .map(b => (b,
            graft.audio.Codecs.ulawDecodeSample(b.toByte).toInt,
            graft.audio.Codecs.alawDecodeSample(b.toByte).toInt))
          .toDF("b", "ulaw_pcm", "alaw_pcm")
          .orderBy(col("b"))
      },
      Some("""WITH b AS (SELECT DISTINCT CAST(event_id % 256 AS INT) AS b FROM events),
             |m AS (
             |  SELECT b, xor(b, 255) AS ub, xor(b, 85) AS ab FROM b),
             |law AS (
             |  SELECT b,
             |    ((((ub & 15) << 3) + 132) << ((ub >> 4) & 7)) - 132 AS us,
             |    (ub & 128) AS usign,
             |    CASE WHEN ((ab >> 4) & 7) = 0 THEN ((ab & 15) << 4) + 8
             |         ELSE (((ab & 15) << 4) + 264) << (((ab >> 4) & 7) - 1) END AS as_,
             |    (ab & 128) AS asign
             |  FROM m)
             |SELECT b,
             |  CAST(CASE WHEN usign != 0 THEN -us ELSE us END AS INT) AS ulaw_pcm,
             |  CAST(CASE WHEN asign = 0 THEN -as_ ELSE as_ END AS INT) AS alaw_pcm
             |FROM law ORDER BY b""".stripMargin)),

    // ---------------- q57 resample to uniform model-ingest rate (resize)
    // Audio "resize": every decodable clip linear-resampled to 16 kHz.
    // The decoded and resampled LENGTHS are exact functions of the
    // clip metadata (n_in = max(1, sr·dur/1000); n_out = (n_in−1)·
    // 16000/sr + 1, integer division), so the oracle value-checks that
    // the decode produced exactly the synthesized sample count and the
    // resampler the exact target length; resampled PCM content is
    // SNR-verified against an analytically generated target-rate
    // signal in CodecsSpec.
    QueryDef(
      "q57_resample",
      (s, d) => {
        import s.implicits._
        graft.streaming.ClipPipeline
          .resampleStage(graft.synth.ClipGen.stagedClips(s, d), 16000)
          .toDF("clip_id", "codec", "sr_hz", "n_in", "n_out", "rms")
          .select(col("clip_id"), col("codec"), col("sr_hz"),
            col("n_in"), col("n_out"))
          // as in p01/p02/q58: materialize the tiny per-clip rows once
          // so the global sort's range-partition sampling pass doesn't
          // re-run the full decode+resample
          .localCheckpoint(true)
          .orderBy(col("clip_id"), col("codec"), col("sr_hz"), col("n_in"))
      },
      Some(s"""WITH clips AS (${graft.synth.ClipGen.metaSql}),
              |m AS (
              |  SELECT clip_id, codec, sr_hz,
              |    CAST(GREATEST(1, (CAST(sr_hz AS BIGINT) * dur_ms) // 1000) AS INT) AS n_in
              |  FROM clips WHERE codec <> 'unknown')
              |SELECT clip_id, codec, sr_hz, n_in,
              |  CAST((CAST(n_in - 1 AS BIGINT) * 16000) // sr_hz + 1 AS INT) AS n_out
              |FROM m ORDER BY clip_id, codec, sr_hz, n_in""".stripMargin)),

    // --------------- q58 narrowband tone detection (Goertzel, 500 Hz)
    // The telephony-style tone/hum detector over the binary audio
    // column: one fused decode pass per clip runs the Goertzel
    // recurrence (Codecs.goertzelPowerAt — O(n) streaming, allocation-
    // free, no PCM materialized). Value-oracled against ground truth
    // computed by DIRECT DFT accumulation on the independently-decoded
    // samples (ClipGen staging, IndependentDecoder.tonePower): a
    // different algorithm and numeric path that agrees to ~1e-9,
    // compared at round(3). The detection class is 'short' under 0.5 s
    // of signal — below that the nearest off-tone component (10 Hz away
    // at worst) leaks above any fixed threshold through the
    // rectangular-window sinc; with ≥0.5 s the 0.005 threshold sits
    // ≥5× above worst-case leakage and ≥3× below the weakest true
    // tone, so the flag is robust to the cross-implementation 1e-11
    // noise. ~4% of clips carry the 500 Hz component (seed % 23 = 0).
    QueryDef(
      "q58_tone_detect",
      (s, d) => {
        import s.implicits._
        graft.synth.ClipGen.stagedClips(s, d)
          .flatMap { c =>
            if (c.codec == "unknown") None
            else graft.audio.Codecs
              .goertzelPowerAt(c.codec, c.bytes, c.sr_hz, 500.0)
              .toOption.map { p =>
                // 3-valued string, not a nullable boolean: the driver's
                // pandas compare coerces BOOLEAN-with-NULLs to float NaN
                // on the DuckDB side but keeps None on the parquet side
                val cls =
                  if (c.dur_ms < 500) "short"
                  else if (p > 0.005) "tone"
                  else "none"
                (c.clip_id, c.event_time, c.sr_hz, c.dur_ms, p, cls)
              }
          }
          .toDF("clip_id", "event_time", "sr_hz", "dur_ms",
            "tone_power_raw", "tone_class")
          .select(col("clip_id"), col("event_time"), col("sr_hz"),
            col("dur_ms"), round(col("tone_power_raw"), 3).as("tone_power"),
            col("tone_class"))
          // as in p01: materialize the tiny per-clip rows once so the
          // global sort's range-partition sampling pass doesn't re-run
          // the full decode+Goertzel
          .localCheckpoint(true)
          .orderBy(col("clip_id"), col("event_time"))
      },
      Some(s"""WITH clips AS (${graft.synth.ClipGen.metaSql}),
              |exp AS (SELECT * FROM read_parquet('__CLIPS_EXPECTED__/*.parquet'))
              |SELECT c.clip_id, c.event_time, c.sr_hz, c.dur_ms, e.tone_power,
              |  CASE WHEN e.tone_detected IS NULL THEN 'short'
              |       WHEN e.tone_detected THEN 'tone' ELSE 'none' END AS tone_class
              |FROM clips c JOIN exp e ON e.clip_id = c.clip_id AND e.event_time = c.event_time
              |WHERE c.codec <> 'unknown'
              |ORDER BY c.clip_id, c.event_time""".stripMargin))
  )
}
