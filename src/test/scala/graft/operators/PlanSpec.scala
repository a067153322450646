package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape regression tests: the properties that keep the engine
  * fast at 100 TB are asserted on the actual physical plans, not
  * hoped for — filter/column pushdown to the parquet scan, partition
  * pruning on date-partitioned layouts, broadcast join selection, and
  * shuffle-free co-located joins via bucketing (SURVEY.md §4).
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filter + projection reach the parquet scan (PushedFilters/ReadSchema)") {
    val plan = formatted(
      graft.SparkEntry.queries("q02_filter_project")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("LessThan(l_shipdate"))
    assert(plan.contains("LessThan(l_quantity,10.0)"))
    // column pruning: only the 4 needed columns are read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    assert(!readSchema.contains("l_extendedprice"))
    assert(readSchema.contains("l_quantity"))
  }

  test("metadata rollups never read the audio bytes column (column pruning)") {
    import spark.implicits._
    val clips = graft.synth.ClipGen.stagedClips(spark, "/root/testdata/sf0.001")
    val rollup = clips.toDF().groupBy("codec")
      .agg(count(lit(1)).as("n"), sum("dur_ms").as("d"))
    val readSchema = formatted(rollup).linesIterator
      .find(_.contains("ReadSchema:")).get
    assert(!readSchema.contains("bytes"), s"bytes must be pruned: $readSchema")
  }

  test("small dimension joins are planned as broadcast hash joins") {
    val plan = formatted(
      graft.SparkEntry.queries("q03_join_agg")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("date-partitioned layout gets partition pruning from the date filter (F2 at scale)") {
    val dir = Files.createTempDirectory("graft_part_").toString
    val clips = graft.synth.ClipGen.clipsMeta(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("event_time")))
    clips.write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === lit("2024-01-02").cast("date"))
    val plan = formatted(pruned)
    assert(plan.contains("PartitionFilters:"))
    assert(plan.contains("event_date"), plan)
    // and it actually scans a single partition's rows
    assert(pruned.count() > 0)
    assert(pruned.count() < clips.count() / 10)
  }

  test("ann top-k plans as two-phase aggregation — no per-query window sort (q36/q37 at 100 TB)") {
    // the old shape shuffled every scored (query, candidate) row to the
    // one task owning that query_id and sorted the full score list
    // there (Window.partitionBy(query_id)); the aggregator shape keeps
    // partial top-k map-side, so the exec plan must carry an
    // ObjectHashAggregate pair and no Window node at all
    val q36 = graft.SparkEntry.queries("q36_cosine_topk")(spark, "/root/testdata/sf0.001")
    val plan36 = formatted(q36)
    assert(!plan36.contains("Window"), s"q36 must not rank via window:\n$plan36")
    assert(plan36.contains("ObjectHashAggregate"), plan36)

    // q37 keeps one legitimate window: centroid ROUTING over
    // (queries × clusters) — a broadcast-sized input. The RANKING over
    // scored members must still be the aggregator.
    val q37 = graft.SparkEntry.queries("q37_ann_ivf")(spark, "/root/testdata/sf0.001")
    val plan37 = formatted(q37)
    assert(plan37.contains("ObjectHashAggregate"), plan37)
    // no window may rank by cosine — only the dist2 routing window
    // (broadcast-sized queries × clusters input) is allowed
    val cosineWindow = plan37.linesIterator.exists(l =>
      l.contains("windowspecdefinition") && l.contains("cosine"))
    assert(!cosineWindow, s"q37 final rank must not be a per-query window:\n$plan37")
  }

  test("bucketed tables join WITHOUT a shuffle (co-located join for 100 TB fact-fact joins)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val meta = graft.synth.ClipGen.clipsMeta(spark, "/root/testdata/sf0.001")
      meta.write.mode("overwrite")
        .bucketBy(8, "clip_id").sortBy("clip_id")
        .saveAsTable("graft_bucketed_a")
      meta.select(col("clip_id"), col("dur_ms").as("dur2"))
        .write.mode("overwrite")
        .bucketBy(8, "clip_id").sortBy("clip_id")
        .saveAsTable("graft_bucketed_b")
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "clip_id")
      val plan = formatted(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }

  test("chunking is a narrow 1:N — q60's only exchange is the output sort (zero-shuffle at 100 TB)") {
    val plan = formatted(
      graft.SparkEntry.queries("q60_chunk_documents")(spark, "/root/testdata/sf0.001"))
    val exchanges = plan.linesIterator.filter(_.contains("Arguments: ") )
      .filter(l => l.contains("hashpartitioning") || l.contains("rangepartitioning")).toSeq
    assert(plan.contains("Generate")) // posexplode, not a join
    assert(!plan.contains("hashpartitioning"),
      s"chunking itself must not shuffle:\n${exchanges.mkString("\n")}")
  }

  test("chunk dedup q62 plans as partial+final hash agg — exactly one hash exchange, no window") {
    val plan = formatted(
      graft.SparkEntry.queries("q62_chunk_dedup")(spark, "/root/testdata/sf0.001"))
    val hashEx = plan.linesIterator.count(_.contains("hashpartitioning"))
    assert(hashEx == 1, s"expected exactly one hash exchange (the md5 groupBy), got $hashEx:\n$plan")
    assert(!plan.contains("Window"), "no window sort in the dedup path")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
  }

  test("streaming near-dup banding: null guard reaches the scan, no re-expanded signature filter (s29 lesson)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = formatted(graft.streaming.StreamNearDup.bandedDocs(docs).toDF())
    // the guard must be the scan-pushable IsNotNull(text) — NOT a
    // Filter node containing the re-expanded minhash/shingle pipeline
    // (the round-5 10× regression: predicate pushdown re-evaluates a
    // computed column's defining expression inside the filter)
    assert(plan.contains("IsNotNull(text)"),
      s"text-null guard must reach PushedFilters:\n$plan")
    val filterLines = plan.linesIterator
      .filter(l => l.contains("Condition") && l.contains("minhash32")).toSeq
    assert(filterLines.isEmpty,
      s"no Filter may re-evaluate the signature:\n${filterLines.mkString("\n")}")
  }

  test("streaming embed near-dup banding: zero-norm guard never re-expands the plane dots (s31)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = formatted(graft.streaming.StreamEmbedNearDup.bandedVecs(emb).toDF())
    // the norm guard references only the raw vector column; if its
    // pushdown ever drags the 16-plane dot products into a Filter,
    // this catches it (an O(dim) norm re-expansion is accepted)
    val badFilter = plan.linesIterator.filter(l =>
      l.contains("Condition") && l.contains("md5")).toSeq
    assert(badFilter.isEmpty,
      s"zero-norm filter must not re-expand the hyperplane dots:\n${badFilter.mkString("\n")}")
  }

  test("connected components: every star round is equi-join shaped — no cartesian, no neighbor-list collect") {
    import spark.implicits._
    // a chain forces ≥2 star rounds; the converged plan (last smallStar
    // + label projection) must be hash-join shaped
    val pairs = (0L until 20L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val plan = formatted(cc)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"star rounds must stay equi-join shaped:\n$plan")
    assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
      "no neighbor-list aggregation — a hot node's neighborhood must never land on one task")
    assert(cc.as[(Long, Long)].collect().toMap.values.toSet == Set(0L))
  }

  test("quota sampling plans as the k-bounded aggregator — no per-stratum window sort (q70 at 100 TB)") {
    val plan = formatted(
      graft.SparkEntry.queries("q70_sample_quota")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("Window"),
      "per-stratum ranking must be the bounded aggregator, not row_number over the stratum")
    assert(plan.contains("ObjectHashAggregate"),
      s"QuotaSample should plan as ObjectHashAggregate (partial+final):\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "the quota join must broadcast")
  }

  test("decontamination probes a BROADCAST benchmark shingle set — no corpus-side shuffle join (q73)") {
    val plan = formatted(
      graft.SparkEntry.queries("q73_decontam")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingles are fixed-size — the probe must be map-side:\n$plan")
    // the only SortMergeJoin-shaped exchange allowed is none: corpus rows
    // reach the join through Generate (explode) + broadcast probe
    assert(!plan.contains("SortMergeJoin"),
      "the 100 TB corpus side must never shuffle for the decontamination probe")
    // regression lock for the staged-toks fix: passing split(..) inline
    // to the shingle builder re-evaluated the split per element_at in
    // the 5-gram lambda (5 splits per position — measured 4.6x on this
    // query). Staged, no plan line evaluates split more than once.
    plan.linesIterator.foreach { l =>
      val n = "split\\(".r.findAllIn(l).size
      assert(n <= 1, s"a plan node evaluates split() $n times — toks must be staged:\n$l")
    }
  }
}
