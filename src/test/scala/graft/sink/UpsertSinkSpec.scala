package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Keyed MERGE sink semantics: upsert-by-key across batches, replay
  * idempotence, snapshot isolation of the latest pointer.
  */
class UpsertSinkSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (String, Int, String)*): DataFrame =
    rows.toDF("k", "v", "payload")

  test("upserts by key across batches; latest version wins inside a batch") {
    val dir = Files.createTempDirectory("upsert_").toString
    val sink = new UpsertSink(dir, Seq("k"), "v")

    sink.write(df(("a", 1, "a1"), ("b", 1, "b1")), 0)
    sink.write(df(("a", 2, "a2-lo"), ("a", 3, "a2-hi"), ("c", 1, "c1")), 1)

    val out = sink.readLatest(spark)
      .select("k", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(out == Set(
      ("a", 3, "a2-hi"), // updated: key matched, max version in batch won
      ("b", 1, "b1"), // untouched key carried forward
      ("c", 1, "c1"))) // inserted
  }

  test("version guard: a NEW batch carrying a stale version cannot regress a key") {
    val dir = Files.createTempDirectory("upsert_stale_").toString
    val sink = new UpsertSink(dir, Seq("k"), "v")
    sink.write(df(("a", 5, "a5")), 0)
    // batch 1 is a fresh batchId (not a replay) but its 'a' row is an
    // out-of-order STALE version — MERGE must keep v5 and still insert d
    sink.write(df(("a", 3, "stale"), ("d", 1, "d1")), 1)
    val out = sink.readLatest(spark)
      .select("k", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(out == Set(("a", 5, "a5"), ("d", 1, "d1")),
      s"stale version must not overwrite: $out")
    assert(sink.latestCommitted.contains(1L))
  }

  test("replayed batchId is a no-op; latest pointer stays consistent") {
    val dir = Files.createTempDirectory("upsert_replay_").toString
    val sink = new UpsertSink(dir, Seq("k"), "v")
    sink.write(df(("a", 1, "a1")), 0)
    sink.write(df(("a", 2, "a2")), 1)
    // replay an OLD batch (post-crash at-least-once delivery)
    sink.write(df(("a", 99, "stale-replay")), 0)
    val out = sink.readLatest(spark)
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(out == Set(("a", "a2")), "replay must not regress the table")
    assert(sink.latestCommitted.contains(1L))
  }

  test("crash between marker and pointer swing is repaired on replay") {
    val dir = Files.createTempDirectory("upsert_crash_").toString
    val sink = new UpsertSink(dir, Seq("k"), "v")
    sink.write(df(("a", 1, "a1")), 0)
    // simulate the crash window: batch 1 committed its marker+snapshot
    // but the _latest pointer still names batch 0
    sink.write(df(("a", 2, "a2")), 1)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_latest"),
      "0".getBytes("UTF-8"))
    assert(sink.latestCommitted.contains(0L))
    // replay of batch 1 (at-least-once delivery) must finish the commit
    sink.write(df(("a", 99, "stale")), 1)
    assert(sink.latestCommitted.contains(1L))
    val out = sink.readLatest(spark)
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(out == Set(("a", "a2")))
  }

  test("bucketed copy-on-write: untouched buckets carry forward by reference, byte-identical") {
    val dir = Files.createTempDirectory("upsert_bucket_").toString
    val sink = new UpsertSink(dir, Seq("k"), "v", numBuckets = 8)

    // batch 0: 32 keys — spread across (almost certainly all) 8 buckets
    sink.write((0 until 32).map(i => (s"k$i", 1, s"p$i")).toDF("k", "v", "payload"), 0)
    val m0 = sink.latestManifest
    assert(m0.size >= 4, s"expected keys spread over several buckets, got $m0")

    import scala.jdk.CollectionConverters._
    def dirBytesHash(d: String): Map[String, (Long, String)] = {
      val stream = Files.list(java.nio.file.Paths.get(d))
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val bytes = Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5")
          p.getFileName.toString ->
            (bytes.length.toLong, md.digest(bytes).map("%02x".format(_)).mkString)
        }.toMap
      finally stream.close()
    }

    // batch 1: a single key — exactly ONE bucket may be rewritten
    sink.write(Seq(("k0", 2, "p0v2")).toDF("k", "v", "payload"), 1)
    val m1 = sink.latestManifest
    val changed = m1.filter { case (b, d) => m0.get(b).exists(_ != d) }.keys.toSet
    assert(changed.size == 1, s"one touched bucket expected, changed: $changed")
    assert(m1.keySet == m0.keySet, "bucket set is fixed")
    val untouched = (m1.keySet -- changed).toSeq.sorted
    assert(untouched.nonEmpty)
    // untouched buckets: SAME path (never rewritten — reference carry)
    untouched.foreach(b => assert(m1(b) == m0(b),
      s"untouched bucket $b must carry the same data dir"))
    // and the files at that path are byte-identical after the commit
    val probe = m0(untouched.head)
    val before = dirBytesHash(probe)
    sink.write(Seq(("k0", 3, "p0v3")).toDF("k", "v", "payload"), 2)
    val after = dirBytesHash(probe)
    assert(before == after,
      s"untouched bucket files must be byte-identical: $before vs $after")

    // correctness unchanged: merged view = latest version per key
    val out = sink.readLatest(spark)
      .select("k", "v", "payload").as[(String, Int, String)].collect().toSet
    assert(out.size == 32)
    assert(out.contains(("k0", 3, "p0v3")))
    assert(out.contains(("k1", 1, "p1")))
  }

  test("bucket count is pinned at first write; a reopened sink adopts the stored layout") {
    val dir = Files.createTempDirectory("upsert_pin_").toString
    new UpsertSink(dir, Seq("k"), "v", numBuckets = 4)
      .write(df(("a", 1, "a1"), ("b", 1, "b1")), 0)
    // reopened with a DIFFERENT requested bucket count: layout must not shift
    val reopened = new UpsertSink(dir, Seq("k"), "v", numBuckets = 32)
    reopened.write(df(("a", 2, "a2"), ("c", 1, "c1")), 1)
    assert(reopened.latestManifest.keySet.forall(_ < 4),
      s"pinned 4-bucket layout expected: ${reopened.latestManifest}")
    val out = reopened.readLatest(spark)
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(out == Set(("a", "a2"), ("b", "b1"), ("c", "c1")))
  }

  test("streaming foreachBatch end-to-end: stream of updates collapses to latest per key") {
    val base = Files.createTempDirectory("upsert_stream_").toString
    // 3 files → 3 micro-batches of key updates
    Seq(("k1", 1, "x1"), ("k2", 1, "y1")).toDF("k", "v", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/in")
    Seq(("k1", 2, "x2")).toDF("k", "v", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/in")
    Seq(("k2", 3, "y3"), ("k3", 1, "z1")).toDF("k", "v", "payload")
      .coalesce(1).write.mode("append").parquet(s"$base/in")

    val sink = new UpsertSink(s"$base/out", Seq("k"), "v")
    val q = spark.readStream
      .schema("k STRING, v INT, payload STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
      .writeStream
      .foreachBatch((d: DataFrame, id: Long) => sink.write(d, id))
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = sink.readLatest(spark)
      .select("k", "payload").as[(String, String)].collect().toSet
    // note: file order across micro-batches follows modification time;
    // final state must hold exactly one row per key with a payload
    // from one of that key's updates
    assert(out.map(_._1) == Set("k1", "k2", "k3"))
    assert(out.size == 3)
  }
}
