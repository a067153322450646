package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Batch operator unit tests: as-of join, broadcast lookup, dedup
  * families, ANN recall.
  */
class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoinBackward picks latest right row at or before left time, per key") {
    val left = Seq(
      (1L, t("2024-01-10 00:00:00"), "e1"),
      (1L, t("2024-01-20 00:00:00"), "e2"),
      (2L, t("2024-01-15 00:00:00"), "e3"),
      (3L, t("2024-01-15 00:00:00"), "e4")) // no right rows for key 3
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-05 00:00:00"), 100L, 1.0),
      (1L, t("2024-01-12 00:00:00"), 101L, 2.0),
      (1L, t("2024-01-12 00:00:00"), 102L, 3.0), // tie on time → larger ord wins
      (2L, t("2024-01-16 00:00:00"), 200L, 4.0)) // after e3 → no match
      .toDF("k", "rts", "ord", "v")
    val out = Joins.asofJoinBackward(left, right, "k", "ts", "rts", "ord", Seq("ord", "v"))
      .select("tag", "r_ord")
      .as[(String, Option[Long])].collect().toMap
    assert(out("e1") == Some(100L))
    assert(out("e2") == Some(102L)) // latest time 01-12, tie broken by ord
    assert(out("e3") == None)
    assert(out("e4") == None)
  }

  test("native AsofJoinExec matches the composed union+window as-of join") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id").as("custkey"), col("ts"))
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val native = Joins.asofJoinNative(ev, ord,
      "custkey", "o_custkey", "ts", "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    val composed = Joins.asofJoinBackward(ev,
      ord.withColumnRenamed("o_custkey", "custkey"),
      "custkey", "ts", "o_orderdate", "o_orderkey",
      Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("r_o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.size == composed.size)
    assert(native == composed)
    // and the physical plan actually uses the custom operator
    val plan = Joins.asofJoinNative(ev, ord,
      "custkey", "o_custkey", "ts", "o_orderdate", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
  }

  test("asofJoinBackward: a null value in the winning right row stays null (no stale backfill)") {
    val left = Seq((1L, t("2024-01-20 00:00:00"), "e")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, t("2024-01-05 00:00:00"), 100L, Some(10.0)),
      (1L, t("2024-01-12 00:00:00"), 101L, None)) // latest row: v is NULL
      .toDF("k", "rts", "ord", "v")
    val r = Joins.asofJoinBackward(left, right, "k", "ts", "rts", "ord", Seq("ord", "v"))
      .select("r_ord", "r_v").head()
    assert(r.getLong(0) == 101L)
    assert(r.isNullAt(1), "null from the winning row must not be backfilled from older rows")
  }

  test("native asof join survives collect() without a projection on top") {
    val left = Seq((1L, t("2024-01-20 00:00:00"))).toDF("k", "ts")
    val right = Seq((1L, t("2024-01-10 00:00:00"), 7L)).toDF("rk", "rts", "ord")
    val rows = Joins.asofJoinNative(left, right, "k", "rk", "ts", "rts", "ord").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(4) == 7L)
  }

  test("native minhash matches columnar twin on empty/degenerate arrays") {
    val df = Seq(Seq.empty[String], Seq("x")).toDF("sh")
    val both = df.select(
      graft.functions.MinHash32.minhash32(col("sh"), 4).as("a"),
      graft.functions.TextFunctions.minhashSignature(col("sh"), 4).as("b"))
      .collect()
    both.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("broadcastLookupJoin dedups lookup first-wins (MappingConfiguration.java:40-45)") {
    val facts = Seq("u", "v", "w").toDF("code2")
    val lookup = Seq(("u", "first", 1), ("u", "second", 2), ("v", "only", 7))
      .toDF("code", "cat", "line")
    val out = Joins.broadcastLookupJoin(facts, lookup, "code2", "code", "line")
      .select("code2", "cat").as[(String, Option[String])].collect().toMap
    assert(out("u") == Some("first"))
    assert(out("v") == Some("only"))
    assert(out("w") == None)
  }

  test("exactDedup groups identical normalized texts") {
    val docs = Seq(
      (1L, "Hello  World"),
      (2L, "  hello world "), // same after normalization
      (3L, "different"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(docs, "doc_id", "text")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("minhashLshPairs finds a heavily-overlapping pair, skips disjoint docs") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 38).map(i => s"w$i").mkString(" ") + " z1 z2"
    val c = (100 to 140).map(i => s"q$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngramJaccardPairs computes exact Jaccard over shingles") {
    val docs = Seq(
      (1L, "a b c d e", "x"),
      (2L, "a b c d e", "x"), // identical → jaccard 1.0
      (3L, "a b c d e", "y")) // different block → never compared
      .toDF("doc_id", "text", "lang")
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0)))
  }

  test("simhashPairs: identical docs at hamming 0; unrelated docs filtered") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content words here"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("simhashDocs native path equals columnar path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val a = Dedup.simhashDocs(docs, "doc_id", "text", useNative = false)
    val b = Dedup.simhashDocs(docs, "doc_id", "text", useNative = true)
    assert(a.join(b.withColumnRenamed("simhash", "s2"), "doc_id")
      .filter(col("simhash") =!= col("s2")).count() == 0)
  }

  test("IVF ANN: high top-5 recall vs brute force when clusters are real") {
    // deterministic well-separated clusters: 5 centers on distinct axes,
    // members = center + small deterministic jitter
    val vecs = for {
      c <- 0 until 5
      m <- 0 until 40
    } yield {
      val base = Array.fill(16)(0.05f)
      base(c * 3) = 1.0f
      base((c * 3 + 1) % 16) = 0.7f
      val jittered = base.zipWithIndex.map { case (v, d) =>
        v + 0.02f * (((c * 40 + m) * 31 + d * 7) % 11 - 5)
      }
      ((c * 40 + m).toLong, jittered.toSeq, c)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val exact = Ann.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopK(emb, queries, "vec_id", "embedding", "label", 5, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("embedNearDupPairs: banded LSH has non-vacuous recall vs brute force (q47)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // brute-force truth: all pairs with cosine >= 0.35 (the similar tail
    // of this corpus — max pair cosine is ~0.48)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val dot = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    def nrm(c: org.apache.spark.sql.Column) = sqrt(aggregate(c, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dot / (nrm(col("va")) * nrm(col("vb"))))
      .filter(col("cosine") >= 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Ann.embedNearDupPairs(emb, "vec_id", "embedding",
        nBits = 16, bands = 4, threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    val recall = (truth & banded).size.toDouble / truth.size
    // 4 bands x 4 bits at cosine 0.35 expects ~0.45 recall; the old
    // single 16-bit bucket measured 0.0 here (vacuous by construction)
    assert(recall >= 0.25, s"banded recall $recall over ${truth.size} true pairs")
    assert(banded.subsetOf(truth), "banding only blocks candidates; cosine filter is exact")
  }

  test("embedNearDupPairs: planted near-duplicates are found with >=0.9 recall") {
    // 60 base vectors + a jittered twin each (cosine ~0.999) — the
    // regime the operator ships for; banding must not lose these
    val base = (0 until 60).map { i =>
      (i.toLong, (0 until 64).map(d => math.sin(i * 97 + d * 13).toFloat))
    }
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.zipWithIndex.map { case (x, d) => x + 0.01f * ((id + d) % 3 - 1) })
    }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    val found = Ann.embedNearDupPairs(emb, "vec_id", "embedding",
        nBits = 16, bands = 4, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hit = (0 until 60).count(i => found.contains((i.toLong, i + 1000L)))
    assert(hit >= 54, s"found $hit/60 planted twins")
  }

  test("StructRewrite rewires every nested ref; a null ref quarantines the whole bundle (M10)") {
    // mirrors AimLabMapperTests' request-params assertions: every entry
    // of the surviving bundle points at the rewritten reference, the
    // poisoned bundle is skipped wholesale (not partially rewritten)
    val bundles = Seq(
      (1L, Seq(("obs", "p1"), ("enc", "p1"))),
      (2L, Seq(("obs", "p2"), ("enc", null))), // unresolvable → quarantine
      (3L, Seq.empty[(String, String)]),       // no entries → nothing missing
      (4L, null)                               // null bundle → quarantine, not vanish
    ).toDF("msg_id", "raw")
      .select(col("msg_id"), expr(
        "transform(raw, x -> named_struct('kind', x._1, 'ref', x._2))").as("entries"))
    val (ok, bad) = graft.operators.StructRewrite.rewriteRefs(
      bundles, "entries", "ref", r => concat(lit("Patient/"), r))
    val okRows = ok.select(col("msg_id"), col("entries")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getString(0), e.getString(1)))).toMap
    assert(okRows.keySet == Set(1L, 3L))
    assert(okRows(1L) == Seq(("obs", "Patient/p1"), ("enc", "Patient/p1")))
    assert(okRows(3L).isEmpty)
    assert(bad.select("msg_id").as[Long].collect().toSet == Set(2L, 4L),
      "rewritten + quarantined must partition the input, incl. null bundles")
    // the quarantined bundle keeps its ORIGINAL entries (auditable)
    val badEntries = bad.filter(col("msg_id") === 2).select(col("entries"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getString(0), e.getString(1)))
    assert(badEntries == Seq(("obs", "p2"), ("enc", null)))
  }

  test("cosineTopK is exact: neighbor of identical vector ranks first") {
    val v1 = (1 to 8).map(_.toFloat)
    val v2 = v1 // identical direction
    val v3 = (1 to 8).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val top = Ann.cosineTopK(emb, emb.filter(col("vec_id") === 1), "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 2L)
  }

  test("TopKHits partial buffers stay k-bounded (shuffle carries <=2k rows/query/partition)") {
    val agg = new TopKHits(5)
    var buf = agg.zero
    (1 to 1000).foreach { i =>
      buf = agg.reduce(buf, ScoredHit(i.toLong, i / 1000.0, -1))
      assert(buf.length <= 10, s"buffer ${buf.length} exceeded 2k after $i rows")
    }
    // merge keeps the bound too, and loses none of the true top-k
    var other = agg.zero
    (1001 to 1400).foreach(i => other = agg.reduce(other, ScoredHit(i.toLong, i / 1000.0, -1)))
    val merged = agg.merge(buf, other)
    assert(merged.length <= 10)
    assert(agg.finish(merged).map(_.neighbor_id) ==
      Seq(1400L, 1399L, 1398L, 1397L, 1396L))
  }

  test("TopKHits ordering matches the window it replaced: NaN ranks above all, ties by id asc") {
    val agg = new TopKHits(3)
    val hits = Seq(
      ScoredHit(7L, Double.NaN, -1), ScoredHit(3L, 0.9, -1),
      ScoredHit(5L, 0.9, -1), ScoredHit(1L, 0.2, -1))
    val out = agg.finish(hits.foldLeft(agg.zero)(agg.reduce))
    // Spark's desc and DuckDB's ORDER BY DESC both place NaN first;
    // equal cosines break by neighbor_id ascending
    assert(out.map(_.neighbor_id) == Seq(7L, 3L, 5L))
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("connectedComponents: path graph (label-propagation worst case) collapses to its min") {
    // 0-1-2-...-9 as a chain, given in descending order with some
    // reversed and duplicated edges — O(log n) star rounds must still
    // resolve every node to 0
    val chain = (0L until 9L).map(i => (i + 1, i)) ++ Seq((3L, 4L), (5L, 6L))
    val m = ccMap(chain)
    assert(m == (1L to 9L).map(_ -> 0L).toMap + (0L -> 0L))
  }

  test("connectedComponents: multiple components + transitive A~B~C with A≁C") {
    val m = ccMap(Seq(
      (10L, 20L), (20L, 30L), // 10-20-30 transitively (10≁30 directly)
      (7L, 5L),               // {5, 7}
      (100L, 101L)))          // {100, 101}
    assert(m == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 7L -> 5L, 100L -> 100L, 101L -> 100L))
  }

  test("connectedComponents: star already centered at a non-min node re-centers") {
    // hub 50 with leaves, min 1 a leaf: cluster id must be 1, not 50
    val m = ccMap(Seq((50L, 60L), (50L, 70L), (50L, 1L)))
    assert(m == Map(50L -> 1L, 60L -> 1L, 70L -> 1L, 1L -> 1L))
  }

  test("connectedComponents: empty and self-pair inputs produce no rows") {
    assert(ccMap(Seq.empty).isEmpty)
    assert(ccMap(Seq((4L, 4L))).isEmpty) // self-pair is not an edge
  }

  test("QuotaSample partial buffers stay quota-bounded with a data-dependent k") {
    val agg = new QuotaSample
    val q = 4
    var buf = agg.zero
    (1 to 500).foreach { i =>
      buf = agg.reduce(buf, SampleCand(i.toLong, f"${(i * 37) % 500}%032d", q))
      assert(buf.length <= 2 * q, s"buffer ${buf.length} exceeded 2*quota after $i rows")
    }
    var other = agg.zero
    (501 to 700).foreach(i => other = agg.reduce(other, SampleCand(i.toLong, f"${(i * 37) % 997}%032d", q)))
    val merged = agg.merge(buf, other)
    assert(merged.length <= 2 * q)
    val out = agg.finish(merged)
    assert(out.length == q)
    assert(out.map(_.rn) == (1L to q.toLong)) // ranks are 1..quota in key order
  }

  test("QuotaSample equals the window-rank it replaces (exact quota, md5 order, id tiebreak)") {
    val n = 97
    val cands = (1 to n).map { i =>
      SampleCand(i.toLong,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"q:$i"),
        (n + 4) / 5)
    }
    // reference: full sort by (key, id), take quota
    val expect = cands.sortBy(c => (c.key, c.doc_id)).take((n + 4) / 5)
      .zipWithIndex.map { case (c, i) => SampledDoc(c.doc_id, i + 1L) }
    // aggregator over shuffled partials (3 partitions merged out of
    // order); fixed seed so a merge-order-dependent failure replays
    val got = (1 to 5).map { seed =>
      val agg = new QuotaSample
      val parts = new scala.util.Random(seed).shuffle(cands.toVector)
        .grouped(33).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      agg.finish(parts.reduce(agg.merge))
    }
    got.foreach(g => assert(g == expect))
  }

  test("q71 packing conserves tokens and never overflows the pack budget") {
    val out = graft.queries.MixQueries.defs.find(_.name == "q71_seq_pack").get
      .fn(spark, "/root/testdata/sf0.001")
    val rows = out.select("source", "pack_id", "doc_id", "tok_from", "n_toks")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // every span is positive and within the budget
    assert(rows.forall { case (_, _, _, from, n) => n > 0 && from >= 0 && n <= 128 })
    // per-pack token totals: exactly 128 for every non-final pack per source
    val perPack = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._5).sum)
    val lastPack = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
    perPack.foreach { case ((src, pid), tot) =>
      if (pid < lastPack(src)) assert(tot == 128L, s"pack ($src,$pid) holds $tot")
      else assert(tot > 0L && tot <= 128L)
    }
    // per-doc spans reassemble the whole document exactly once
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        size(split(graft.functions.TextFunctions.normalizeTranscript(col("text")), " "))
          .cast("long").as("n_tok"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._3).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      assert(sorted.map(_._5).sum == docs(doc), s"doc $doc spans lose tokens")
      // contiguous, non-overlapping
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4)
        case _ =>
      }
    }
  }

  test("q75 packs exactly the q48 keep-list: same docs, full token conservation") {
    val sf = "/root/testdata/sf0.001"
    val mix = graft.queries.MixQueries.defs.find(_.name == "q75_curated_mix").get
      .fn(spark, sf)
      .select("doc_id", "n_toks").as[(Long, Long)].collect()
    val kept = graft.queries.CurationQueries.defs
      .find(_.name == "q48_curation_keeplist").get.fn(spark, sf)
      .select(col("doc_id"), col("n_tokens").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(mix.nonEmpty && kept.nonEmpty)
    // every packed doc is a kept doc and vice versa
    assert(mix.map(_._1).toSet == kept.keySet,
      "packed doc set must equal the curation keep-list")
    // per-doc spans sum to the doc's curated token count
    mix.groupBy(_._1).foreach { case (doc, spans) =>
      assert(spans.map(_._2).sum == kept(doc), s"doc $doc loses tokens in the mix")
    }
  }
}
