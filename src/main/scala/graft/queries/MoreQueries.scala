package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{ClipPipeline, StreamRunner}
import graft.synth.ClipGen

/** Second-wave operator surface: CSV source, JSON scalar ops, exact
  * statistics from order-independent sums, percentiles, streaming
  * sliding windows.
  */
object MoreQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Absolute path of the committed codec catalog CSV (S4 analogue —
    * `;`-separated, header, duplicate key, empty field,
    * /root/reference/src/main/resources/Mappingkatalog.csv shape).
    */
  val CsvPath: String = {
    val repoPath = "/root/repo/src/main/resources/codec_catalog.csv"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(repoPath))) repoPath
    else
      // non-/root/repo checkouts: materialize the classpath resource to
      // a temp file — getResource(...).getPath would be a
      // 'file:...jar!/...' URL for a jar-packaged resource, which
      // neither spark.read.csv nor the DuckDB oracle can open
      Option(getClass.getResourceAsStream("/codec_catalog.csv")).map { in =>
        try {
          val tmp = java.nio.file.Files.createTempFile("codec_catalog_", ".csv")
          tmp.toFile.deleteOnExit()
          java.nio.file.Files.copy(in, tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          tmp.toString
        } finally in.close()
      }.getOrElse(repoPath)
  }

  import org.apache.spark.sql.types._

  private val eventsSchema = graft.model.Schemas.events

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------- q42 CSV scan + first-wins dedup (S4)
    QueryDef(
      "q42_csv_catalog",
      (s, d) => {
        val raw = s.read
          .option("sep", ";")
          .option("header", "true")
          .csv(CsvPath)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("code")).orderBy(col("line_no").cast("int"))
        raw.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("code"), col("category"))
          .orderBy(col("code"))
      },
      Some(s"""SELECT code, category FROM (
              |  SELECT code, category,
              |    row_number() OVER (PARTITION BY code ORDER BY CAST(line_no AS INT)) AS rn
              |  FROM read_csv('$CsvPath', delim=';', header=true, all_varchar=true))
              |WHERE rn = 1 ORDER BY code""".stripMargin)),

    // -------------- q65 schema-drift ingestion (mergeSchema evolution)
    // The ingestion reality of a long-lived corpus: parquet drops
    // written by different pipeline generations carry different
    // schemas (a later generation added a `source` column). Two
    // generations are staged from `documents` (even doc_ids as v1
    // without the column, odd as v2 with it) and read back as ONE
    // table with mergeSchema — v1 rows must surface with NULL source,
    // which only happens if schema merging actually unified the
    // footers (a plain read would bind whichever file's schema was
    // sampled first and either drop the column or fail). The oracle
    // re-derives the expected unified view straight from `documents`,
    // so the staged plumbing is the thing under test.
    QueryDef(
      "q65_schema_drift",
      (s, d) => {
        val base = graft.sink.FsUtil.processScopedWorkDir("graft_schema_drift", d)
        val docs = t(s, d, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("text"))
          .write.mode("overwrite").parquet(s"$base/gen=v1")
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("text"),
            concat(lit("crawl-"), col("doc_id") % 3).as("source"))
          .write.mode("overwrite").parquet(s"$base/gen=v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$base/gen=v1", s"$base/gen=v2")
          .select(col("doc_id"), col("lang"), col("source"),
            length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN doc_id % 2 = 1 THEN 'crawl-' || (doc_id % 3) ELSE NULL END AS source,
             |  length(text) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------ q43 JSON extraction (C15)
    QueryDef(
      "q43_json_extract",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        t(s, d, "events")
          .orderBy(col("event_id"))
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ----------------------------------------- q44 JSON serialization (C15)
    QueryDef(
      "q44_to_json",
      (s, d) =>
        // sort-before-project (the q24 pattern)
        t(s, d, "events")
          .orderBy(col("event_id"))
          .select(col("event_id"),
            to_json(struct(col("event_id").as("id"),
              col("event_type").as("t"))).as("js")),
      Some("""SELECT event_id,
             |  printf('{"id":%d,"t":"%s"}', event_id, event_type) AS js
             |FROM events ORDER BY event_id""".stripMargin)),

    // -------------------------- q59 ORC sink → source roundtrip (S4×S6)
    // Second columnar format end-to-end: the clip metadata is written
    // to ORC (including a TIMESTAMP_NTZ column) and read back; the
    // oracle checks the read-back rows against the pure-SQL derivation
    // of the ORIGINAL table, so any fidelity loss in the write or read
    // path (types, NTZ timestamps, nulls) breaks the hash. The staging
    // write is part of the query on purpose — the roundtrip IS the
    // operator under test.
    QueryDef(
      "q59_orc_roundtrip",
      (s, d) => {
        // fixed per-SF dir + overwrite: the write stays inside the
        // timed query (the roundtrip is the operator) but disk stays
        // bounded at one copy — a fresh createTempDirectory per
        // invocation would leak an ORC table per bench/verify pass.
        // event_time is already TIMESTAMP_NTZ off the parquet source;
        // no cast needed for the NTZ roundtrip to be under test.
        val dir = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), "graft_orc",
          java.nio.file.Paths.get(d).getFileName.toString).toString
        ClipGen.clipsMeta(s, d)
          .write.mode("overwrite").orc(dir)
        s.read.orc(dir)
          .select(col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
            col("transcript"), col("event_time"), col("event_id"))
          .orderBy(col("event_id"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT clip_id, sr_hz, dur_ms, codec, transcript, event_time, event_id
              |FROM clips ORDER BY event_id""".stripMargin)),

    // --------------------------------------- q45 exact percentiles (A3+)
    QueryDef(
      "q45_percentiles",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
             |  COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---------------- q46 correlation/stddev from order-independent sums
    // Distributed float moment aggregates (stddev/corr built-ins) are
    // partition-order dependent; the engine computes moments from EXACT
    // decimal sums and derives the statistics in one deterministic
    // double step — reproducible on any cluster layout.
    QueryDef(
      "q46_exact_stats",
      (s, d) => {
        val q = col("l_quantity").cast("decimal(18,6)")
        val p = col("l_extendedprice").cast("decimal(18,6)")
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(q).as("sx"), sum(p).as("sy"),
            sum(q * q).as("sxx"), sum(p * p).as("syy"),
            sum(q * p).as("sxy"))
          .select(
            col("l_returnflag"),
            col("n"),
            round(
              (col("n") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                sqrt(
                  (col("n") * col("sxx").cast("double") -
                    col("sx").cast("double") * col("sx").cast("double")) *
                    (col("n") * col("syy").cast("double") -
                      col("sy").cast("double") * col("sy").cast("double"))),
              6).as("corr_qty_price"),
            round(
              sqrt((col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) /
                (col("n") * (col("n") - 1))).cast("double"), 6)
              .as("stddev_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
             |    SUM(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
             |    SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(28,6))) AS syy,
             |    SUM(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |         (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price,
             |  round(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (n * (n - 1))), 6) AS stddev_qty
             |FROM m ORDER BY 1""".stripMargin)),

    // ----------------- q49 native as-of join (custom Catalyst operator)
    // Same semantics + oracle as q16, executed by graft.plans.AsofJoinExec
    // (LogicalPlan + SparkStrategy + merge-join SparkPlan) — proves the
    // custom physical operator against the independent DuckDB oracle.
    QueryDef(
      "q49_asof_native",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id").as("custkey"), col("ts"))
        val o = t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        graft.operators.Joins.asofJoinNative(ev, o,
          "custkey", "o_custkey", "ts", "o_orderdate", "o_orderkey")
          .select(col("event_id"), col("custkey"),
            col("o_orderdate").as("asof_orderdate"),
            col("o_orderkey").as("asof_orderkey"),
            col("o_totalprice").as("asof_totalprice"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id AS custkey,
             |  o.o_orderdate AS asof_orderdate, o.o_orderkey AS asof_orderkey,
             |  o.o_totalprice AS asof_totalprice
             |FROM events e LEFT JOIN LATERAL (
             |  SELECT o_orderdate, o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
             |ORDER BY e.event_id""".stripMargin)),

    // ----------------- p04 1:N PCM frame expansion (M8/M9 analogue)
    // flatMap 1:N over decoded audio; oracle checks the exact frame
    // count per codec derived from (sr_hz, dur_ms) — proving the
    // expansion hit every decoded sample window.
    QueryDef(
      "p04_frame_counts",
      (s, d) => {
        val frames = ClipPipeline.frameStage(ClipGen.stagedClips(s, d), frameMs = 100)
        frames.toDF("clip_id", "codec", "frame_idx", "energy")
          .groupBy(col("codec"))
          .agg(count(lit(1)).as("n_frames"),
            countDistinct(col("clip_id")).as("n_clips"))
          .orderBy(col("codec"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT codec,
              |  CAST(SUM(((CAST(sr_hz AS BIGINT) * dur_ms) // 1000 + (sr_hz // 10) - 1) // (sr_hz // 10)) AS BIGINT) AS n_frames,
              |  COUNT(DISTINCT clip_id) AS n_clips
              |FROM clips WHERE codec <> 'unknown'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ----------------------- p03 quarantine table (F4 as data, not logs)
    QueryDef(
      "p03_quarantine",
      (s, d) => {
        val q = ClipPipeline.quarantineStage(ClipGen.stagedClips(s, d))
        q.toDF("clip_id", "codec", "reason")
          .groupBy(col("codec"), col("reason"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("codec"), col("reason"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT codec, 'unknown codec: unknown' AS reason, COUNT(*) AS n
              |FROM clips WHERE codec = 'unknown'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // -------------------- s07 streaming decode end-to-end (M4 on stream)
    // The full reference topology on a true incremental plan: file
    // stream over the binary clip table -> typed decode map -> rollup.
    // The oracle checks decoded sample counts per codec, proving the
    // decode ran (not just metadata passthrough).
    QueryDef(
      "s07_stream_decode",
      (s, d) => {
        import s.implicits._
        ClipGen.stagedClips(s, d).head(1) // ensure staged
        val stream = s.readStream.schema(graft.model.Schemas.clips)
          .parquet(ClipGen.clipsTablePath(d))
          .as[graft.model.Clip]
        val rolled = ClipPipeline.decodeStage(stream)
          .toDF()
          .groupBy(col("codec"))
          .agg(count(lit(1)).as("n_clips"),
            sum(col("pcm.n_samples").cast("long")).as("total_samples"))
        StreamRunner.runToMemory(rolled, "complete")
          .orderBy(col("codec"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT codec, COUNT(*) AS n_clips,
              |  CAST(SUM((CAST(sr_hz AS BIGINT) * dur_ms) // 1000) AS BIGINT) AS total_samples
              |FROM clips WHERE codec <> 'unknown'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---------------- s08 streaming HLL distinct rollup (A3 approx path)
    // approx_count_distinct (HyperLogLog++) per tumbling window — the
    // sketch survives partial aggregation so distinct counting is one
    // exchange of sketches, not rows; at 100 TB the sketch IS the
    // operator and the collect_set twin below is oracle-only scaffolding
    // (it would not ship at scale). The HLL estimate itself is
    // engine-specific, so the oracled columns are the EXACT distinct
    // count (DuckDB re-derives it) and `hll_ok` — the estimate landing
    // within 3·rsd of exact, which DuckDB asserts as literal TRUE, so a
    // drifting sketch hash-fails the row. Estimate accuracy is
    // additionally bounded value-by-value in StreamingSpec.
    QueryDef(
      "s08_stream_distinct",
      (s, d) => {
        val clips = ClipGen.metaProjection(
          StreamRunner.parquetStream(s, s"$d/events.parquet", eventsSchema))
          .withColumn("event_time", col("event_time").cast("timestamp"))
        val rolled = clips
          .withWatermark("event_time", "1 hour")
          .groupBy(window(col("event_time"), "1 day"), col("codec"))
          .agg(count(lit(1)).as("n_clips"),
            size(collect_set(col("clip_id"))).cast("long").as("n_distinct_exact"),
            approx_count_distinct(col("clip_id")).as("est"))
          .select(col("window.start").cast("timestamp_ntz").as("window_start"),
            col("codec"), col("n_clips"), col("n_distinct_exact"),
            // default HLL++ rsd is 0.05; 3σ plus an absolute floor of 2
            // for tiny windows keeps the bound tight but never flaky
            (abs(col("est") - col("n_distinct_exact")) <=
              greatest(lit(2.0), col("n_distinct_exact") * lit(0.15)))
              .as("hll_ok"))
        StreamRunner.runToMemory(rolled, "complete")
          .orderBy(col("window_start"), col("codec"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT make_timestamp((epoch_us(event_time) // 86400000000) * 86400000000) AS window_start,
              |  codec, COUNT(*) AS n_clips,
              |  CAST(COUNT(DISTINCT clip_id) AS BIGINT) AS n_distinct_exact,
              |  TRUE AS hll_ok
              |FROM clips GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---------------------------- s06 streaming sliding-window rollup (D4)
    QueryDef(
      "s06_stream_sliding",
      (s, d) => {
        val clips = ClipGen.metaProjection(
          StreamRunner.parquetStream(s, s"$d/events.parquet", eventsSchema))
          .withColumn("event_time", col("event_time").cast("timestamp"))
        val rolled = ClipPipeline.slidingRollup(
          clips.withWatermark("event_time", "1 hour"), "2 days", "1 day")
        StreamRunner.runToMemory(rolled, "complete")
          .withColumn("window_start", col("window_start").cast("timestamp_ntz"))
          .withColumn("window_end", col("window_end").cast("timestamp_ntz"))
          .orderBy(col("window_start"), col("codec"))
      },
      Some(s"""WITH clips AS (${ClipGen.metaSql})
              |SELECT make_timestamp(((epoch_us(event_time) // 86400000000) - o.o) * 86400000000) AS window_start,
              |  make_timestamp((((epoch_us(event_time) // 86400000000) - o.o) + 2) * 86400000000) AS window_end,
              |  codec, COUNT(*) AS n_clips,
              |  CAST(SUM(CAST(dur_ms AS BIGINT)) AS BIGINT) AS total_dur_ms
              |FROM clips, (SELECT unnest([0, 1]) AS o) o
              |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin)))
}
