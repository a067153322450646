package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sink.ExactlyOnceSink
import graft.streaming.{ClipMeta, ClipPipeline, GraftQueryListener, Metrics}

/** The deployable engine application — `spark-submit --class
  * graft.PipelineMain <jar> [options]` runs the full reference
  * topology (SURVEY.md §3) as concurrent structured-streaming queries
  * over a clip table directory:
  *
  *   decode+normalize → mapped-record sink        (M1–M10, F1–F5)
  *   keyed stateful dedup → decisions sink        (D1)
  *   tumbling rollup (watermarked) → rollup sink  (A3/D4)
  *   session-window merge → sessions sink         (D1b; TWS on --rocksdb)
  *   [optional] transcript-update join → sink     (J3)
  *   [optional] keyed MERGE upsert → snapshots    (S3; latest event
  *                                                 time wins per clip,
  *                                                 bucketed
  *                                                 copy-on-write)
  *   [optional] token-budget admission → sink     (ingestion-time mix
  *                                                 control; --rocksdb)
  *
  * Every sink is the exactly-once batchId-committed MERGE protocol
  * with per-partition lineage (D2/D7); restart with the same
  * checkpoint dir resumes with no dup/dropped rows. On a cluster, the
  * master/executor topology comes from spark-submit; locally pass
  * `--master local[N]`.
  *
  * Options (all have defaults for a local smoke run):
  *   --input <dir>       clip parquet dir (default: staged sf0.001)
  *   --updates <dir>     transcript-update parquet dir (optional)
  *   --output <dir>      sink root (default: ./pipeline_out)
  *   --checkpoint <dir>  checkpoint root (default: <output>/_checkpoints)
  *   --watermark <dur>   event-time watermark (default "10 minutes")
  *   --window <dur>      rollup window (default "1 day")
  *   --state-ttl-ms <n>  dedup state TTL (default 1800000)
  *   --once              Trigger.AvailableNow (drain + exit); default
  *   --interval <dur>    Trigger.ProcessingTime instead of --once
  *   --rocksdb           use the RocksDB state store provider
  *   --pipelines <csv>   enable only the named pipelines out of
  *                       mapped,dedup,rollup,sessions,join,upsert,budget
  *                       (default: the first four, plus join when
  *                       --updates is given; budget requires --rocksdb);
  *                       an empty or invalid selection REFUSES to boot
  *                       (exit 2) — the reference's zero-mapper guard
  *                       (LabToFhirProcessor.java:26-29)
  *   --token-budget <n>  per-codec transcript-token budget for the
  *                       budget pipeline (default 100000)
  *   --strict-max-failures <n>  poison-pill mode for the decode map:
  *                       more than n malformed records in a task fails
  *                       the query instead of quarantining (the
  *                       reference's serde-error shutdown,
  *                       KafkaConfiguration.java:31-42); omit for the
  *                       default quarantine behavior
  */
object PipelineMain {

  private val clipSchema = graft.model.Schemas.clips

  private val BooleanFlags = Set("once", "rocksdb")

  private[graft] val AllPipelines =
    Seq("mapped", "dedup", "rollup", "sessions", "join", "upsert", "budget")

  /** Enabled-pipeline selection with the reference's boot guards:
    * unknown names and an empty selection are refused outright.
    */
  private[graft] def selectPipelines(opt: Map[String, String]): Seq[String] = {
    val requested = opt.get("pipelines") match {
      case Some(csv) => csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq.distinct
      case None =>
        Seq("mapped", "dedup", "rollup", "sessions") ++
          (if (opt.contains("updates")) Seq("join") else Nil)
    }
    val unknown = requested.filterNot(AllPipelines.contains)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown pipeline(s): ${unknown.mkString(",")} (valid: ${AllPipelines.mkString(",")})")
    if (requested.contains("join") && !opt.contains("updates"))
      throw new IllegalArgumentException("pipeline 'join' requires --updates <dir>")
    if (requested.contains("budget") && !opt.contains("rocksdb"))
      throw new IllegalArgumentException(
        "pipeline 'budget' requires --rocksdb (transformWithState state store)")
    if (requested.isEmpty)
      throw new IllegalArgumentException(
        "no pipelines enabled — refusing to start")
    requested
  }

  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case flag :: tail if flag.startsWith("--") =>
          val name = flag.drop(2)
          if (BooleanFlags(name)) loop(tail, acc + (name -> "true"))
          else tail match {
            case v :: t2 if !v.startsWith("--") => loop(t2, acc + (name -> v))
            case _ =>
              throw new IllegalArgumentException(s"option --$name needs a value")
          }
        case other :: _ =>
          throw new IllegalArgumentException(s"unexpected argument: $other")
      }
    loop(args.toList, Map.empty)
  }

  /** Handle on one completed [[run]]: the exactly-once sink per
    * enabled pipeline (lineage + committed data) and the metrics
    * listener — what main prints and what the reconciliation spec
    * asserts over.
    */
  final case class PipelineRun(
      sinks: Map[String, ExactlyOnceSink],
      upserts: Map[String, graft.sink.UpsertSink],
      listener: GraftQueryListener)

  def main(args: Array[String]): Unit = {
    val (opt, enabled) =
      try {
        val o = parseArgs(args)
        (o, selectPipelines(o))
      } catch {
        case e: IllegalArgumentException =>
          System.err.println(s"[pipeline] ${e.getMessage}")
          sys.exit(2)
      }
    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .withExtensions(new GraftExtensions) // as-of strategy + simhash32/minhash32 SQL functions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        opt.getOrElse("shuffle-partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.parquet.columnarReaderBatchSize", "256")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536") // ANN top-k: keep thousands of query_id groups on the hash partial path
      .config("spark.sql.adaptive.enabled", "true")
    // master comes from spark-submit on a cluster; default local for dev
    val spark =
      (if (opt.contains("master") || sys.props.contains("spark.master")) builder
       else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val r = run(spark, opt, enabled)

    // metrics summary (D8) — rows processed per query + late drops
    val summary = Seq("graft_mapped", "graft_dedup", "graft_rollup",
      "graft_sessions", "graft_join", "graft_upsert", "graft_budget")
      .map(n => s""""$n":{"rows":${r.listener.totalInputRows(n)},"batches":${r.listener.batches(n)},"late_dropped":${r.listener.droppedByWatermark(n)}}""")
      .mkString("{", ",", "}")
    // lineage reconciliation (D7): every committed batch's partition
    // counts must sum to its observed total, and the totals must equal
    // what a reader of the committed data sees — surfaced in the run
    // summary so an unreconciled run is visible, not silent
    val reconcile = (r.sinks.map { case (name, sink) =>
      val lin = sink.lineage
      val partsOk = lin.forall(b => b.partitionRows.sum == b.rows)
      val total = lin.map(_.rows).sum
      val committed = sink.readCommitted(spark).count()
      s""""$name":{"lineage_rows":$total,"committed_rows":$committed,"partitions_consistent":$partsOk,"reconciled":${partsOk && total == committed}}"""
    } ++ r.upserts.map { case (name, sink) =>
      // upsert conservation: the merged snapshot holds exactly one row
      // per key (the version-guarded winner), so merged rows must
      // equal distinct keys — and the input rows the listener observed
      // must be ≥ merged rows (merge only ever collapses)
      val merged = sink.readLatest(spark)
      val rows = merged.count()
      val keys =
        if (rows == 0) 0L else merged.select(col("clip_id")).distinct().count()
      val observed = r.listener.totalInputRows("graft_upsert")
      s""""$name":{"merged_rows":$rows,"distinct_keys":$keys,"input_rows":$observed,"reconciled":${rows == keys && observed >= rows}}"""
    }).mkString("{", ",", "}")
    // budget conservation: the prefix sum is only correct if the
    // per-source running total survived every batch boundary — then
    // max(cum_tokens) over committed rows equals the source's total
    // token count (admitted AND rejected audit rows both count)
    val budgetJson = r.sinks.get("budget").map { sink =>
      // one aggregation over the committed table: per-source rollup is
      // tiny (strata are few), so fold conservation + totals into a
      // single job and finish driver-side. coalesce: SUM over zero
      // committed rows (empty input) is NULL.
      val (n, adm, bad) = sink.readCommitted(spark)
        .groupBy(col("source"))
        .agg(max(col("cum_tokens")).as("max_cum"), sum(col("n_tok")).as("tot"),
          count(lit(1)).as("n"),
          sum(when(col("admitted"), 1L).otherwise(0L)).as("admitted"))
        .agg(coalesce(sum(col("n")), lit(0L)),
          coalesce(sum(col("admitted")), lit(0L)),
          coalesce(sum(when(col("max_cum") =!= col("tot"), 1L).otherwise(0L)),
            lit(0L)))
        .as[(Long, Long, Long)].head()
      s""","budget":{"rows":$n,"admitted":$adm,"prefix_conserved":${bad == 0L}}"""
    }.getOrElse("")
    println(s"""{"pipeline":"done","queries":$summary,"lineage":$reconcile$budgetJson}""")
    spark.stop()
  }

  /** Builds, starts and drains every enabled pipeline on `spark` —
    * the whole engine application minus session lifecycle, so the
    * reconciliation spec can run it end-to-end on the shared test
    * session.
    */
  private[graft] def run(spark: SparkSession, opt: Map[String, String],
      enabled: Seq[String]): PipelineRun = {
    if (opt.contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val input = opt.getOrElse("input", {
      graft.synth.ClipGen.stagedClips(spark, "/root/testdata/sf0.001").head(1)
      graft.synth.ClipGen.clipsTablePath("/root/testdata/sf0.001")
    })
    val output = opt.getOrElse("output", "pipeline_out")
    val ckpt = opt.getOrElse("checkpoint", s"$output/_checkpoints")
    val watermark = opt.getOrElse("watermark", "10 minutes")
    val windowDur = opt.getOrElse("window", "1 day")
    val stateTtl = opt.getOrElse("state-ttl-ms", "1800000").toLong
    val trigger =
      opt.get("interval").map(Trigger.ProcessingTime(_)).getOrElse(Trigger.AvailableNow())

    val listener = new GraftQueryListener
    spark.streams.addListener(listener)

    import spark.implicits._

    def clipStream(): DataFrame =
      spark.readStream.schema(clipSchema).parquet(input)

    var sinks = Map.empty[String, ExactlyOnceSink]
    var upserts = Map.empty[String, graft.sink.UpsertSink]

    // ---- query 1: decode map → mapped-record sink (the reference's
    //      core topology, M1/M4 + F1/F4; --strict-max-failures swaps in
    //      the poison-pill decode)
    val q1 = if (!enabled.contains("mapped")) None else Some {
      val mappedSink = new ExactlyOnceSink(s"$output/mapped", Seq("out_id"))
      sinks += ("mapped" -> mappedSink)
      val typedClips = clipStream().as[graft.model.Clip]
      val decoded = opt.get("strict-max-failures") match {
        case Some(n) => ClipPipeline.decodeStageStrict(typedClips, n.toLong)
        case None    => ClipPipeline.decodeStage(typedClips)
      }
      val mapped = decoded.toDF()
        .withColumn("event_time", col("event_time").cast("timestamp"))
      Metrics.observed(mapped, "mapped_out")
        .writeStream
        .queryName("graft_mapped")
        .foreachBatch((df: DataFrame, id: Long) => mappedSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/mapped")
        .trigger(trigger)
        .start()
    }

    // ---- query 2: keyed stateful dedup decisions (D1)
    val q2 = if (!enabled.contains("dedup")) None else Some {
      val dedupSink = new ExactlyOnceSink(s"$output/dedup", Seq("clip_id", "occurrence"))
      sinks += ("dedup" -> dedupSink)
      val meta = clipStream()
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
          col("transcript"), col("event_time").cast("timestamp").as("event_time"),
          xxhash64(col("clip_id"), col("event_time")).as("event_id"))
        .withWatermark("event_time", watermark)
        .as[ClipMeta]
      ClipPipeline.dedupStage(meta, stateTtl).toDF()
        .writeStream
        .queryName("graft_dedup")
        .foreachBatch((df: DataFrame, id: Long) => dedupSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/dedup")
        .trigger(trigger)
        .start()
    }

    // ---- query 3: watermarked tumbling rollup (A3/D4), append mode —
    //      only finalized windows are committed
    val q3 = if (!enabled.contains("rollup")) None else Some {
      val rollupSink = new ExactlyOnceSink(s"$output/rollups", Seq("window_start", "codec"))
      sinks += ("rollup" -> rollupSink)
      val rollup = ClipPipeline.tumblingRollup(
        clipStream()
          .withColumn("event_time", col("event_time").cast("timestamp"))
          .withWatermark("event_time", watermark),
        windowDur)
      rollup.writeStream
        .queryName("graft_rollup")
        .outputMode("append")
        .foreachBatch((df: DataFrame, id: Long) => rollupSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/rollup")
        .trigger(trigger)
        .start()
    }

    // ---- query 5: session-window MERGE per clip_id (D1b) — the
    //      reference's within-message merge generalized; on --rocksdb
    //      this runs the transformWithState processor (typed state +
    //      event-time timers), otherwise the portable fMGWS twin, so a
    //      deployment exercises whichever state API its store supports
    val q5 = if (!enabled.contains("sessions")) None else Some {
      val sessSink = new ExactlyOnceSink(s"$output/sessions",
        Seq("clip_id", "session_start"))
      sinks += ("sessions" -> sessSink)
      val meta = clipStream()
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
          col("transcript"), col("event_time").cast("timestamp").as("event_time"),
          xxhash64(col("clip_id"), col("event_time")).as("event_id"))
        .withWatermark("event_time", watermark)
        .as[ClipMeta]
      val merged =
        if (opt.contains("rocksdb"))
          graft.streaming.TwsSessionMerge.sessionMergeStageTws(meta)
        else ClipPipeline.sessionMergeStage(meta)
      merged.toDF()
        .writeStream
        .queryName("graft_sessions")
        .foreachBatch((df: DataFrame, id: Long) => sessSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/sessions")
        .trigger(trigger)
        .start()
    }

    // ---- query 4: transcript-update interval join (J3; needs --updates)
    val q4 = if (!enabled.contains("join")) None else Some {
      val updDir = opt("updates")
      val joinSink = new ExactlyOnceSink(s"$output/joined", Seq("clip_id", "u_event_time"))
      sinks += ("join" -> joinSink)
      val updates = spark.readStream
        .schema(StructType(Seq(
          StructField("clip_id", StringType),
          StructField("u_transcript", StringType),
          StructField("u_event_time", TimestampNTZType))))
        .parquet(updDir)
        .withColumn("u_event_time", col("u_event_time").cast("timestamp"))
      val clips = clipStream()
        .select(col("clip_id"), col("transcript"),
          col("event_time").cast("timestamp").as("event_time"))
      val joined = ClipPipeline.transcriptUpdateJoin(clips, updates, watermark, "10 MINUTES")
      joined.writeStream
        .queryName("graft_join")
        .foreachBatch((df: DataFrame, id: Long) => joinSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/join")
        .trigger(trigger)
        .start()
    }

    // ---- query 6: keyed MERGE upsert into a bucketed snapshot chain
    //      (S3's Iceberg-MERGE shape) — the CURRENT-STATE view of the
    //      clip table: latest event time wins per clip_id, stale
    //      replays never regress a key, untouched buckets carry
    //      forward by reference
    // ---- query 7: per-source token-budget admission (the ingestion-
    //      time mixing control — s34's stateful operator as a
    //      deployable stage): each codec stratum admits clips in
    //      processing order until its running transcript-token total
    //      passes --token-budget; rows past the cut are still
    //      committed as rejected audit rows, never silently dropped.
    //      Requires --rocksdb (transformWithState). doc_id is
    //      xxhash64(clip_id, event_time) — the same per-OCCURRENCE
    //      identity the dedup pipeline keys on: bare clip_id repeats
    //      in the stream, and tied doc_ids would leave the fold's
    //      in-batch order (hence cum_tokens attribution and the
    //      sink's byte-identical replay) shuffle-order-dependent.
    val q7 = if (!enabled.contains("budget")) None else Some {
      val budgetSink = new ExactlyOnceSink(s"$output/budget", Seq("doc_id"))
      sinks += ("budget" -> budgetSink)
      val budget = opt.getOrElse("token-budget", "100000").toLong
      val docs = clipStream()
        .select(col("codec").as("source"),
          xxhash64(col("clip_id"), col("event_time")).as("doc_id"),
          col("transcript").as("text"))
      graft.streaming.StreamTokenBudget
        .stage(graft.streaming.StreamTokenBudget.docTokens(docs), budget)
        .toDF()
        .writeStream
        .queryName("graft_budget")
        .foreachBatch((df: DataFrame, id: Long) => budgetSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/budget")
        .trigger(trigger)
        .start()
    }

    val q6 = if (!enabled.contains("upsert")) None else Some {
      val upSink = new graft.sink.UpsertSink(s"$output/upsert",
        Seq("clip_id"), "ver")
      upserts += ("upsert" -> upSink)
      val keyed = clipStream()
        .select(col("clip_id"), col("sr_hz"), col("dur_ms"), col("codec"),
          col("transcript"),
          col("event_time").cast("timestamp").as("event_time"))
        .withColumn("ver", unix_micros(col("event_time")))
      Metrics.observed(keyed, "upsert_in")
        .writeStream
        .queryName("graft_upsert")
        .foreachBatch((df: DataFrame, id: Long) => upSink.write(df, id))
        .option("checkpointLocation", s"$ckpt/upsert")
        .trigger(trigger)
        .start()
    }

    (q1.toSeq ++ q2.toSeq ++ q3.toSeq ++ q5.toSeq ++ q4.toSeq ++ q6.toSeq ++
      q7.toSeq)
      .foreach(_.awaitTermination())
    // progress events arrive on the async listener bus — drain it
    // before detaching, or the summary can miss the final micro-batch
    if (!org.apache.spark.graftbridge.ListenerBridge
        .drainListenerBus(spark.sparkContext, 30000L))
      System.err.println(
        "[pipeline] WARN listener bus not drained in 30s; metrics summary may undercount")
    spark.streams.removeListener(listener)
    PipelineRun(sinks, upserts, listener)
  }
}
