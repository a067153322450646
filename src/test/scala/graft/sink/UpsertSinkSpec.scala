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
