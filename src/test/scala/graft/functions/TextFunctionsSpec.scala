package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._
import graft.streaming.ClipPipeline

/** Scalar-function unit tests, table-driven from the reference's
  * parameterized cases (SURVEY.md §5:
  * AimLabMapperTests.java:58-90, Hl7LabMapperTests.java:45-53,113-133).
  */
class TextFunctionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(col: org.apache.spark.sql.Column, input: String): org.apache.spark.sql.Row =
    Seq(input).toDF("s").select(col.as("r")).head()

  test("parseQuantity: comparator values (reference AimLabMapperTests.java:68-90)") {
    val cases = Seq(
      "<42" -> (("<", 42.0, null)),
      ">= 3.5" -> ((">=", 3.5, null)),
      "17" -> ((null, 17.0, null)),
      "  7.5 " -> ((null, 7.5, null)),
      "<= -2.25" -> (("<=", -2.25, null)),
      "n/a" -> ((null, null, "n/a")),
      "3-9" -> ((null, null, "3-9")), // numeric range → string fallback
      "" -> ((null, null, "")))
    for ((in, (cmp, v, txt)) <- cases) {
      val r = one(parseQuantity(col("s")), in).getStruct(0)
      assert(r.getAs[String]("comparator") == cmp, s"cmp of '$in'")
      assert(r.getAs[java.lang.Double]("value") == v, s"value of '$in'")
      assert(r.getAs[String]("text") == txt, s"text of '$in'")
    }
  }

  test("parseReferenceRange: open bounds + garbage (AimLabMapperTests.java:58-66,128-150)") {
    val cases = Seq(
      "10-20" -> ((10.0, 20.0, null)),
      "- <90" -> ((null, 90.0, null)),
      ">10-" -> ((10.0, null, null)),
      "5 - 15" -> ((5.0, 15.0, null)),
      "text10-9" -> ((null, null, "text10-9")),
      "1 - test" -> ((null, null, "1 - test")),
      "7" -> ((null, null, "7")),
      "" -> ((null, null, "")))
    for ((in, (lo, hi, txt)) <- cases) {
      val r = one(parseReferenceRange(col("s")), in).getStruct(0)
      assert(r.getAs[java.lang.Double]("low") == lo, s"low of '$in'")
      assert(r.getAs[java.lang.Double]("high") == hi, s"high of '$in'")
      assert(r.getAs[String]("text") == txt, s"text of '$in'")
    }
  }

  test("sanitizeId: replacement + 64-char truncation (BaseMapper.java:235-241)") {
    val r = one(sanitizeId(col("s")), "a b!c" + "x" * 100).getString(0)
    assert(r.startsWith("a-b-c"))
    assert(r.length == 64)
  }

  test("stripPrefix removes only the leading system prefix (LaboratoryReport.java:91-100)") {
    assert(one(stripPrefix(col("s"), "SWISSLAB_"), "SWISSLAB_123").getString(0) == "123")
    assert(one(stripPrefix(col("s"), "SWISSLAB_"), "OTHER_123").getString(0) == "OTHER_123")
  }

  test("normalizeTranscript Column and JVM twins agree") {
    val inputs = Seq("  Hello   WORLD. ", "", "a", "x.y.", "  A  B.  ", "tab\tsep")
    for (in <- inputs) {
      val colV = one(normalizeTranscript(col("s")), in).getString(0)
      assert(colV == ClipPipeline.normalizeTranscriptJvm(in), s"input '$in'")
    }
  }

  test("tokenCount: empty → 0, collapsed whitespace counted once") {
    assert(one(tokenCount(normalizeTranscript(col("s"))), "").getInt(0) == 0)
    assert(one(tokenCount(normalizeTranscript(col("s"))), " a   b  c ").getInt(0) == 3)
  }

  test("simhash32 Column formula equals the native Catalyst expression") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val both = docs.select(
      simhash32Col(tokens(col("text"))).as("a"),
      SimHash32.simhash32(tokens(col("text"))).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("simhash32 of empty token array is 0; hamming distance works") {
    val r = Seq(Seq.empty[String]).toDF("t")
      .select(SimHash32.simhash32(col("t"))).head().getLong(0)
    assert(r == 0L)
    val h = Seq((5L, 1L)).toDF("a", "b")
      .select(SimHash32.hammingDistance(col("a"), col("b"))).head().getInt(0)
    assert(h == 1)
  }

  test("fingerprint: < 5 tokens falls back to md5 of normalized text") {
    val fp = one(fingerprint(col("s")), "only three words").getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("only three words".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(fp == md)
  }

  test("langId picks lexicographically smallest language on ties") {
    // no marker hits at all → all scores 0 → tie → 'de'
    assert(one(langId(col("s")), "zzz qqq").getString(0) == "de")
  }

  test("minhash32 native expression equals the columnar md5 formula") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val sh = wordShingles(col("text"), 3)
    val both = docs.select(
      minhashSignature(sh, 8).as("a"),
      MinHash32.minhash32(sh, 8).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("q60 chunking formula pinned across regimes the fixture never reaches (n=1..200, exact boundary, empty, NULL)") {
    // Fixture docs top out at ~100 tokens (2 chunks), so chunk_idx ≥ 2,
    // the exact-boundary case n−64 = k·48 (n = 112: final window ends
    // exactly at the last token), the minimum 17-token final window
    // (n = 113) and the empty/NULL-doc zero-chunk rule would otherwise
    // be verified by nothing. Reference chunker implemented
    // independently here; md5 of the joined window text included so
    // content (not just the counts) is pinned.
    val counts = Seq(1, 63, 64, 65, 112, 113, 200)
    val rows = counts.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"t$k").mkString(" "), "en", "synth", 0L)
    } ++ Seq((100L, "", "en", "synth", 0L), (101L, null: String, "en", "synth", 0L))
    val dir = java.nio.file.Files.createTempDirectory("q60_pin_").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.defs
      .find(_.name == "q60_chunk_documents").get
      .fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSet
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = counts.zipWithIndex.flatMap { case (n, i) =>
      val extra = (math.max(n - 64, 0) + 47) / 48
      (0 to extra).map { idx =>
        val start = idx * 48
        val toks = (start + 1 to math.min(start + 64, n)).map(k => s"t$k")
        (i.toLong, idx, start, toks.size, md5(toks.mkString(" ")))
      }
    }.toSet // doc 100 (empty) and 101 (NULL) contribute NO chunks
    assert(got == want,
      s"extra=${got -- want}\nmissing=${want -- got}")
    // sanity on the regimes this test exists for
    assert(want.exists(_._2 >= 2), "must cover chunk_idx >= 2")
    assert(want.exists(c => c._1 == 4L && c._4 == 64), "n=112 final window is full-length")
    assert(want.exists(c => c._1 == 5L && c._4 == 17), "n=113 final window is the 17-token minimum")
  }
}
