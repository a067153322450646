package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.audio.Codecs
import graft.streaming.ClipPipeline

/** Property-based checks over the engine's pure kernels — the
  * surfaces where a single missed edge case silently poisons parity:
  *  - JVM twin functions MUST equal their Catalyst twins on arbitrary
  *    input (the decode map normalizes in the JVM, every oracle
  *    normalizes columnar — divergence = wrong answers, not a crash);
  *  - codecs must be total (any byte blob → Right or Left, never
  *    throw) and self-consistent with their unfused twins.
  *
  * ScalaCheck generators sampled with FIXED seeds (no scalatestplus
  * bridge ships here, and deterministic cases make failures
  * reproducible across rounds).
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // strings that actually stress the normalizer: unicode, all the
  // whitespace classes the regex names, trailing dots, empties
  private val transcriptGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf(" ", "\t", "\n", "\r", "\f", "  ", "."),
    Gen.oneOf("Ü", "ß", "日本", "ø", "İ", "ı"), // case-mapping edges incl. dotted/dotless I
    Gen.const(""))).map(_.mkString)

  test("normalizeTranscriptJvm equals the Catalyst normalizeTranscript on arbitrary strings") {
    val strs = sample(transcriptGen, 300).toList
    assert(strs.size >= 250, "generator must produce cases")
    val viaCatalyst = strs.toDF("t")
      .select(graft.functions.TextFunctions.normalizeTranscript(col("t")))
      .as[String].collect().toSeq
    val viaJvm = strs.map(ClipPipeline.normalizeTranscriptJvm)
    viaCatalyst.zip(viaJvm).zip(strs).foreach { case ((c, j), in) =>
      assert(c == j, s"divergence on input ${in.map(_.toInt.toHexString)}")
    }
  }

  test("decode is total: arbitrary bytes never throw, for every codec") {
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    for {
      bytes <- sample(bytesGen, 150)
      codec <- Seq("pcm16le", "ulaw", "alaw", "adpcm", "opus")
    } {
      Codecs.decode(codec, bytes)     // Either, never throws
      Codecs.summarize(codec, bytes)  // fused twin, same totality
      Codecs.frameEnergies(codec, bytes, 7)
    }
  }

  test("G.711 round-trip: encode∘decode is identity on the decoder's own output domain") {
    // μ-law and A-law are 256-entry laws: decode(b) must re-encode to b
    // for every byte (the canonical involution check), modulo the
    // ±0 ambiguity μ-law's 0x7f/0xff share
    for (b <- 0 until 256) {
      val u = Codecs.ulawDecodeSample(b.toByte)
      assert((Codecs.ulawEncodeSample(u) & 0xff) == b ||
        (u == 0 && Set(0x7f, 0xff).contains(b)), s"ulaw byte $b → $u")
      val a = Codecs.alawDecodeSample(b.toByte)
      assert((Codecs.alawEncodeSample(a) & 0xff) == b, s"alaw byte $b → $a")
    }
  }

  test("summarize equals decode+stats on arbitrary payloads (all codecs)") {
    val samplesGen = Gen.listOfN(257,
      Gen.choose(-1.0f, 1.0f).map(v => v * 0.99f)).map(_.toArray)
    for {
      samples <- sample(samplesGen, 40)
      codec <- Seq("pcm16le", "ulaw", "alaw", "adpcm")
    } {
      val bytes = Codecs.encode(codec, samples)
      val st = Codecs.summarize(codec, bytes).toOption.get
      val dec = Codecs.decode(codec, bytes).toOption.get
      assert(st.n == dec.length)
      var sumSq = 0.0
      dec.foreach(v => sumSq += v.toDouble * v)
      assert(st.sumSq == sumSq, s"$codec sumSq")
    }
  }

  test("parseDurationUs: units compose and reject garbage") {
    assert(ClipPipeline.parseDurationUs("10 MINUTES") == 10L * 60 * 1000000)
    assert(ClipPipeline.parseDurationUs("2 hours") == 2L * 3600 * 1000000)
    sample(Gen.choose(1L, 10000L), 50).foreach { n =>
      assert(ClipPipeline.parseDurationUs(s"$n SECONDS") == n * 1000000L)
    }
    intercept[IllegalArgumentException](ClipPipeline.parseDurationUs("10 fortnights"))
    intercept[IllegalArgumentException](ClipPipeline.parseDurationUs("soon"))
  }

  // covers magnitudes across the float range, exact powers of two,
  // subnormal-adjacent values, zeros and sign flips — any ordering or
  // widening difference between the native fold and the HOF fold
  // would surface as a bit-level mismatch here
  private val vecGen: Gen[Seq[Float]] =
    Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-1.0f, 1.0f),
      Gen.choose(-1e6f, 1e6f),
      Gen.oneOf(0.0f, -0.0f, 1.5e-7f, -3.25f, 1024.0f))))

  test("native dot_d / norm_d are bit-identical to the interpreted HOF folds") {
    val pairs = sample(vecGen.flatMap(a => vecGen.map(b => (a, a.take(b.size).toSeq))), 200)
      .map { case (a, b) => (a, if (b.size == a.size) b else a) } // equal lengths
    assert(pairs.size >= 150)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      graft.functions.VecMath.dotD(col("a"), col("b")).as("dn"),
      graft.operators.Ann.dotHofD(col("a"), col("b")).as("dh"),
      graft.functions.VecMath.normD(col("a")).as("nn"),
      graft.operators.Ann.normHofD(col("a")).as("nh")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot mismatch: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"norm mismatch: $r")
    }
    // null / length-mismatch semantics follow zip_with padding
    val edge = Seq((Seq(1.0f, 2.0f), Seq(1.0f)), (Seq.empty[Float], Seq.empty[Float]))
      .toDF("a", "b")
      .select(graft.functions.VecMath.dotD(col("a"), col("b")).as("dn"),
        graft.operators.Ann.dotHofD(col("a"), col("b")).as("dh"))
      .collect()
    edge.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1),
      s"null semantics diverge: $r"))
    assert(edge(0).isNullAt(0) && edge(1).getDouble(0) == 0.0)
  }
}
