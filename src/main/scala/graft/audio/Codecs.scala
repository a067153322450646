package graft.audio

/** Pure-JVM audio codecs for the clip payload.
  *
  * This is the decode front-end of the per-record map stage — the
  * analogue of the reference's serde layer
  * (/root/reference/src/main/java/de/unimarburg/diz/labtofhir/serializer/Hl7Deserializer.java:22-34):
  * opaque bytes in, typed domain value out, malformed input surfaced as
  * `Left(reason)` (the engine quarantines instead of the reference's
  * hard client shutdown, KafkaConfiguration.java:34-41).
  *
  * Codecs (all public-spec, self-contained implementations):
  *  - `pcm16le` — 16-bit little-endian linear PCM (identity container)
  *  - `ulaw`    — ITU-T G.711 μ-law, 8 bits/sample
  *  - `alaw`    — ITU-T G.711 A-law, 8 bits/sample
  *  - `adpcm`   — IMA/DVI ADPCM, 4 bits/sample with a 4-byte state header
  *
  * All decoders return normalized Float samples in [-1, 1).
  */
object Codecs {

  val Supported: Set[String] = Set("pcm16le", "ulaw", "alaw", "adpcm")

  // ---------------------------------------------------------------- pcm16le

  def pcm16leEncode(pcm: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      out(2 * i) = (pcm(i) & 0xff).toByte
      out(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def pcm16leDecode(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
      i += 1
    }
    out
  }

  // ------------------------------------------------------------ G.711 μ-law

  private final val UlawBias = 0x84
  private final val UlawClip = 32635

  def ulawEncodeSample(pcm: Short): Byte = {
    var s = pcm.toInt
    val sign = if (s < 0) 0x80 else 0
    if (s < 0) s = -s
    if (s > UlawClip) s = UlawClip
    s += UlawBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)).toByte
  }

  def ulawDecodeSample(b: Byte): Short = {
    val u = (~b) & 0xff
    val sign = u & 0x80
    val exp = (u >> 4) & 0x07
    val man = u & 0x0f
    var s = (((man << 3) + UlawBias) << exp) - UlawBias
    if (sign != 0) s = -s
    s.toShort
  }

  def ulawEncode(pcm: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](pcm.length)
    var i = 0
    while (i < pcm.length) { out(i) = ulawEncodeSample(pcm(i)); i += 1 }
    out
  }

  def ulawDecode(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = ulawDecodeSample(bytes(i)); i += 1 }
    out
  }

  // ------------------------------------------------------------ G.711 A-law

  def alawEncodeSample(pcm: Short): Byte = {
    var s = pcm.toInt
    val sign = if (s >= 0) 0x80 else 0
    if (s < 0) s = -s - 1
    if (s > UlawClip) s = UlawClip
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val man =
      if (exp == 0) (s >> 4) & 0x0f // exp 0 also covers s < 256 after loop ends at exp 0
      else (s >> (exp + 3)) & 0x0f
    ((sign | (exp << 4) | man) ^ 0x55).toByte
  }

  def alawDecodeSample(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    val sign = a & 0x80
    val exp = (a >> 4) & 0x07
    val man = a & 0x0f
    var s =
      if (exp == 0) (man << 4) + 8
      else ((man << 4) + 0x108) << (exp - 1)
    if (sign == 0) s = -s
    s.toShort
  }

  def alawEncode(pcm: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](pcm.length)
    var i = 0
    while (i < pcm.length) { out(i) = alawEncodeSample(pcm(i)); i += 1 }
    out
  }

  def alawDecode(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = alawDecodeSample(bytes(i)); i += 1 }
    out
  }

  // ------------------------------------------------ G.711 decode tables
  // 256-entry lookup twins of the arithmetic decoders, built FROM them
  // so bit-identity holds by construction: the per-sample hot loops
  // (summarize, frameEnergies, foreachPcm) replace ~10 bit ops + a call
  // with one L1 load per byte. The arithmetic forms stay the public
  // API — q56's oracle and CodecsSpec pin them against independent SQL.
  private final val UlawTable: Array[Short] =
    Array.tabulate(256)(i => ulawDecodeSample(i.toByte))
  private final val AlawTable: Array[Short] =
    Array.tabulate(256)(i => alawDecodeSample(i.toByte))

  // ------------------------------------------------------------- IMA ADPCM

  private final val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499,
    2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845,
    8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
    24623, 27086, 29794, 32767)

  private final val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIndex(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def clampPcm(s: Int): Int =
    if (s > 32767) 32767 else if (s < -32768) -32768 else s

  /** Layout: [predictor lo][predictor hi][index][nSamples parity pad],
    * then ceil(n/2) bytes of packed 4-bit codes (low nibble first).
    */
  def adpcmEncode(pcm: Array[Short]): Array[Byte] = {
    val n = pcm.length
    val out = new Array[Byte](4 + (n + 1) / 2)
    var predictor: Int = if (n > 0) pcm(0).toInt else 0
    var index = 0
    out(0) = (predictor & 0xff).toByte
    out(1) = ((predictor >> 8) & 0xff).toByte
    out(2) = index.toByte
    out(3) = (n & 1).toByte
    var i = 0
    while (i < n) {
      val step = StepTable(index)
      var diff = pcm(i) - predictor
      var code = 0
      if (diff < 0) { code = 8; diff = -diff }
      var tmp = diff
      var vpdiff = step >> 3
      if (tmp >= step) { code |= 4; tmp -= step; vpdiff += step }
      if (tmp >= (step >> 1)) { code |= 2; tmp -= step >> 1; vpdiff += step >> 1 }
      if (tmp >= (step >> 2)) { code |= 1; vpdiff += step >> 2 }
      predictor = clampPcm(if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
      index = clampIndex(index + IndexTable(code))
      val pos = 4 + (i >> 1)
      if ((i & 1) == 0) out(pos) = (code & 0x0f).toByte
      else out(pos) = (out(pos) | ((code & 0x0f) << 4)).toByte
      i += 1
    }
    out
  }

  /** Parse the 4-byte ADPCM header → (initial predictor, initial
    * index, sample count). ONE implementation shared by the plain
    * decoder and both fused kernels ([[summarize]], [[frameEnergies]])
    * — the header is where a malformed payload turns into a negative
    * sample count (header-only payload with the odd-parity bit set),
    * and that check must not drift between the three loops.
    */
  private def adpcmHeader(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 4, s"adpcm payload too short: ${bytes.length}")
    var predictor = ((bytes(1) & 0xff) << 8) | (bytes(0) & 0xff)
    if ((predictor & 0x8000) != 0) predictor -= 0x10000
    val index = clampIndex(bytes(2) & 0xff)
    val oddTail = (bytes(3) & 0x01) == 1
    val nPacked = (bytes.length - 4) * 2
    val n = if (oddTail) nPacked - 1 else nPacked
    require(n >= 0, s"adpcm truncated payload: parity byte claims a sample beyond ${bytes.length} bytes")
    (predictor, index, n)
  }

  def adpcmDecode(bytes: Array[Byte]): Array[Short] = {
    var (predictor, index, n) = adpcmHeader(bytes)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val raw = bytes(4 + (i >> 1)) & 0xff
      val code = if ((i & 1) == 0) raw & 0x0f else (raw >> 4) & 0x0f
      val step = StepTable(index)
      var vpdiff = step >> 3
      if ((code & 4) != 0) vpdiff += step
      if ((code & 2) != 0) vpdiff += step >> 1
      if ((code & 1) != 0) vpdiff += step >> 2
      predictor = clampPcm(if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
      index = clampIndex(index + IndexTable(code))
      out(i) = predictor.toShort
      i += 1
    }
    out
  }

  // --------------------------------------------------------------- dispatch

  /** Encode float samples in [-1,1) with the named codec. */
  def encode(codec: String, samples: Array[Float]): Array[Byte] = {
    val pcm = new Array[Short](samples.length)
    var i = 0
    while (i < samples.length) {
      val v = math.round(samples(i) * 32767.0f)
      pcm(i) = clampPcm(v).toShort
      i += 1
    }
    codec match {
      case "pcm16le" => pcm16leEncode(pcm)
      case "ulaw"    => ulawEncode(pcm)
      case "alaw"    => alawEncode(pcm)
      case "adpcm"   => adpcmEncode(pcm)
      case other     => throw new IllegalArgumentException(s"unknown codec: $other")
    }
  }

  /** Decode to normalized floats; malformed input → Left(reason). The
    * Either (instead of an exception that kills the stream) is the
    * engine's deliberate divergence from the reference's poison-pill
    * shutdown (README.md:85-89).
    */
  def decode(codec: String, bytes: Array[Byte]): Either[String, Array[Float]] = {
    if (bytes == null) return Left("null payload")
    try {
      val pcm: Array[Short] = codec match {
        case "pcm16le" =>
          if (bytes.length % 2 != 0) return Left(s"pcm16le odd byte count ${bytes.length}")
          pcm16leDecode(bytes)
        case "ulaw"  => ulawDecode(bytes)
        case "alaw"  => alawDecode(bytes)
        case "adpcm" => adpcmDecode(bytes)
        case other   => return Left(s"unknown codec: $other")
      }
      val out = new Array[Float](pcm.length)
      var i = 0
      while (i < pcm.length) { out(i) = pcm(i) / 32768.0f; i += 1 }
      Right(out)
    } catch {
      case e: Exception => Left(s"decode failure: ${e.getMessage}")
    }
  }

  /** One-pass PCM statistics (int16 domain accumulation). */
  final case class PcmStats(
      n: Int, sumSq: Double, peak: Double, zeroCrossings: Int, clipped: Int)

  /** Decode + summarize WITHOUT materializing the sample array — the
    * fused hot path of the per-record map stage. Semantically
    * equivalent to `decode(...)` followed by a stats pass (asserted in
    * CodecsSpec); avoids one Float allocation per sample, which at
    * ~20 M samples/s/core is the difference between GC-bound and
    * compute-bound decode.
    */
  def summarize(codec: String, bytes: Array[Byte]): Either[String, PcmStats] = {
    if (bytes == null) return Left("null payload")

    var n = 0
    var sumSq = 0.0
    var peakAbs = 0
    var zc = 0
    var clipped = 0
    var prevNonNeg = true
    var first = true

    @inline def acc(s: Int): Unit = {
      val v = s / 32768.0
      sumSq += v * v
      val a = math.abs(s)
      if (a > peakAbs) peakAbs = a
      if (a >= 32736) clipped += 1 // |v| >= 0.999
      val nonNeg = s >= 0
      if (!first && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      first = false
      n += 1
    }

    try {
      codec match {
        case "pcm16le" =>
          if (bytes.length % 2 != 0) return Left(s"pcm16le odd byte count ${bytes.length}")
          var i = 0
          while (i < bytes.length) {
            acc((((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort.toInt)
            i += 2
          }
        case "ulaw" =>
          var i = 0
          while (i < bytes.length) { acc(UlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "alaw" =>
          var i = 0
          while (i < bytes.length) { acc(AlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "adpcm" =>
          var (predictor, index, total) = adpcmHeader(bytes)
          var i = 0
          while (i < total) {
            val raw = bytes(4 + (i >> 1)) & 0xff
            val code = if ((i & 1) == 0) raw & 0x0f else (raw >> 4) & 0x0f
            val step = StepTable(index)
            var vpdiff = step >> 3
            if ((code & 4) != 0) vpdiff += step
            if ((code & 2) != 0) vpdiff += step >> 1
            if ((code & 1) != 0) vpdiff += step >> 2
            predictor = clampPcm(if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
            index = clampIndex(index + IndexTable(code))
            acc(predictor)
            i += 1
          }
        case other => return Left(s"unknown codec: $other")
      }
      if (n == 0) Left("empty payload")
      else Right(PcmStats(n, sumSq, peakAbs / 32768.0, zc, clipped))
    } catch {
      case e: Exception => Left(s"decode failure: ${e.getMessage}")
    }
  }

  /** Per-frame energies (sum of squared normalized samples per
    * `frameLen`-sample window) computed INSIDE the codec loop — the
    * fused twin of `decode(...)` + framing for the 1:N frame stage
    * (same trick as [[summarize]]: no Float array per clip; measured
    * ~2× on p04). Bit-identical to the unfused path: s/32768.0 is
    * exact for int16 in both float and double, and the per-frame sum
    * runs in the same order.
    */
  def frameEnergies(codec: String, bytes: Array[Byte],
      frameLen: Int): Either[String, Array[Double]] = {
    if (bytes == null) return Left("null payload")
    require(frameLen > 0, s"frameLen must be positive: $frameLen")

    var energies: Array[Double] = null
    var fi = 0       // current frame
    var inFrame = 0  // samples consumed in current frame

    @inline def alloc(n: Int): Unit =
      energies = new Array[Double]((n + frameLen - 1) / frameLen)

    @inline def acc(s: Int): Unit = {
      if (inFrame == frameLen) { fi += 1; inFrame = 0 }
      val v = s / 32768.0
      energies(fi) += v * v
      inFrame += 1
    }

    try {
      codec match {
        case "pcm16le" =>
          if (bytes.length % 2 != 0) return Left(s"pcm16le odd byte count ${bytes.length}")
          alloc(bytes.length / 2)
          var i = 0
          while (i < bytes.length) {
            acc((((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort.toInt)
            i += 2
          }
        case "ulaw" =>
          alloc(bytes.length)
          var i = 0
          while (i < bytes.length) { acc(UlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "alaw" =>
          alloc(bytes.length)
          var i = 0
          while (i < bytes.length) { acc(AlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "adpcm" =>
          var (predictor, index, total) = adpcmHeader(bytes)
          alloc(total)
          var i = 0
          while (i < total) {
            val raw = bytes(4 + (i >> 1)) & 0xff
            val code = if ((i & 1) == 0) raw & 0x0f else (raw >> 4) & 0x0f
            val step = StepTable(index)
            var vpdiff = step >> 3
            if ((code & 4) != 0) vpdiff += step
            if ((code & 2) != 0) vpdiff += step >> 1
            if ((code & 1) != 0) vpdiff += step >> 2
            predictor = clampPcm(if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
            index = clampIndex(index + IndexTable(code))
            acc(predictor)
            i += 1
          }
        case other => return Left(s"unknown codec: $other")
      }
      // mirror summarize's F3 empty guard so the fused twins agree on
      // every malformed/degenerate payload, not just well-formed ones
      if (energies.isEmpty) Left("empty payload") else Right(energies)
    } catch {
      case e: Exception => Left(s"decode failure: ${e.getMessage}")
    }
  }

  /** Stream decoded int16 PCM through `f` without materializing the
    * sample array — the visitor form of [[decode]] for fused secondary
    * consumers (the resample stage). [[summarize]] keeps its dedicated
    * loops: it is THE scaling-gate hot path and must not depend on the
    * JIT inlining a megamorphic callback. Returns the sample count;
    * same error surface as decode/summarize (empty → Left).
    */
  def foreachPcm(codec: String, bytes: Array[Byte])(f: Int => Unit)
      : Either[String, Int] = {
    if (bytes == null) return Left("null payload")
    try {
      var n = 0
      codec match {
        case "pcm16le" =>
          if (bytes.length % 2 != 0) return Left(s"pcm16le odd byte count ${bytes.length}")
          n = bytes.length / 2
          var i = 0
          while (i < bytes.length) {
            f((((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort.toInt)
            i += 2
          }
        case "ulaw" =>
          n = bytes.length
          var i = 0
          while (i < n) { f(UlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "alaw" =>
          n = bytes.length
          var i = 0
          while (i < n) { f(AlawTable(bytes(i) & 0xff).toInt); i += 1 }
        case "adpcm" =>
          var (predictor, index, total) = adpcmHeader(bytes)
          n = total
          var i = 0
          while (i < total) {
            val raw = bytes(4 + (i >> 1)) & 0xff
            val code = if ((i & 1) == 0) raw & 0x0f else (raw >> 4) & 0x0f
            val step = StepTable(index)
            var vpdiff = step >> 3
            if ((code & 4) != 0) vpdiff += step
            if ((code & 2) != 0) vpdiff += step >> 1
            if ((code & 1) != 0) vpdiff += step >> 2
            predictor = clampPcm(if ((code & 8) != 0) predictor - vpdiff else predictor + vpdiff)
            index = clampIndex(index + IndexTable(code))
            f(predictor)
            i += 1
          }
        case other => return Left(s"unknown codec: $other")
      }
      if (n == 0) Left("empty payload") else Right(n)
    } catch {
      case e: Exception => Left(s"decode failure: ${e.getMessage}")
    }
  }

  /** Narrowband tone power at `freqHz` via the Goertzel recurrence
    * (O(n) streaming, allocation-free), fused into the single decode
    * pass over [[foreachPcm]] — the telephony-style tone/hum detector
    * (the audio analogue of the reference's code-map gating, SURVEY.md
    * §2.7). The oracle's ground truth recomputes the same quantity by
    * DIRECT DFT accumulation ([[IndependentDecoder.tonePower]]) — a
    * different algorithm and numeric path, so agreement is evidence,
    * not a tautology.
    */
  def goertzelPowerAt(codec: String, bytes: Array[Byte], srHz: Int,
      freqHz: Double): Either[String, Double] = {
    require(srHz > 0, s"srHz must be positive: $srHz")
    require(freqHz > 0 && freqHz < srHz / 2.0,
      s"probe frequency $freqHz outside (0, ${srHz / 2.0}) for sr $srHz")
    val w = 2.0 * math.Pi * freqHz / srHz
    val coeff = 2.0 * math.cos(w)
    var s1 = 0.0 // s[n-1]
    var s2 = 0.0 // s[n-2]
    foreachPcm(codec, bytes) { s =>
      val x = s / 32768.0
      val s0 = x + coeff * s1 - s2
      s2 = s1
      s1 = s0
    }.map { n =>
      // n ≥ 1 here: foreachPcm Lefts empty payloads itself.
      // |X(f)|² from the recurrence tail; normalized by n² so a unit
      // sine at exactly f yields ~(amplitude/2)² independent of length
      val mag2 = s1 * s1 + s2 * s2 - coeff * s1 * s2
      mag2 / (n.toDouble * n.toDouble)
    }
  }

  /** Fused decode → linear resample → RMS: streams samples through the
    * interpolator, materializing NEITHER the input nor the output
    * array (the unfused decode+[[resampleLinear]] pair allocates ~2
    * float arrays per clip — measured ~4× slower at 100k clips).
    * Arithmetic is identical to the unfused path (same integer
    * position math, same double interpolation of float samples;
    * asserted in CodecsSpec). Returns (n_in, n_out, rms_out).
    */
  def resampleStats(codec: String, bytes: Array[Byte], inRate: Int,
      outRate: Int): Either[String, (Int, Int, Double)] = {
    require(inRate > 0 && outRate > 0, s"rates must be positive: $inRate→$outRate")
    var prev = 0.0f
    var i = -1L // index of the last sample received
    var j = 0L  // next output index to emit
    var sumSq = 0.0
    var emitted = 0L
    @inline def emit(v: Float): Unit = { sumSq += v.toDouble * v; emitted += 1 }
    foreachPcm(codec, bytes) { s =>
      val cur = s / 32768.0f
      i += 1
      if (i > 0) {
        // emit every output whose floor position is the previous sample
        while ((j * inRate) / outRate == i - 1) {
          val frac = ((j * inRate) % outRate).toDouble / outRate
          emit((prev * (1.0 - frac) + cur * frac).toFloat)
          j += 1
        }
      }
      prev = cur
    }.map { nIn =>
      val nOut = ((nIn - 1).toLong * outRate / inRate + 1).toInt
      while (emitted < nOut) emit(prev) // tail: floor position == n_in − 1
      (nIn, nOut, if (nOut == 0) 0.0 else math.sqrt(sumSq / nOut))
    }
  }

  /** Linear-interpolation sample-rate conversion — the audio analogue
    * of the multimodal "resize" op (uniform model-ingest rate for a
    * training pipeline). Output length is the deterministic
    * `floor((n_in − 1) · outRate / inRate) + 1` (SQL-expressible, so
    * the q57 oracle can check it), output sample j interpolates the
    * two input samples around position j·inRate/outRate. Position
    * arithmetic is integer (j·inRate exact in Long), so results are
    * bit-stable across platforms.
    */
  def resampleLinear(samples: Array[Float], inRate: Int,
      outRate: Int): Array[Float] = {
    require(inRate > 0 && outRate > 0, s"rates must be positive: $inRate→$outRate")
    if (samples.isEmpty || inRate == outRate) return samples
    val nOut = ((samples.length - 1).toLong * outRate / inRate).toInt + 1
    val out = new Array[Float](nOut)
    var j = 0
    while (j < nOut) {
      val num = j.toLong * inRate // exact integer position numerator
      val i = (num / outRate).toInt
      val frac = (num % outRate).toDouble / outRate
      out(j) =
        if (i + 1 < samples.length)
          (samples(i) * (1.0 - frac) + samples(i + 1) * frac).toFloat
        else samples(samples.length - 1)
      j += 1
    }
    out
  }

  /** Goertzel power over a buffered analysis window (the filterbank
    * kernel behind [[audioFingerprint]]): same recurrence and n²
    * normalization as [[goertzelPowerAt]], but over `w` pre-decoded
    * samples at effective rate `srE` so the full-grid scan can
    * probe many candidates without re-decoding.
    */
  private[audio] def goertzelPowerWin(buf: Array[Double], w: Int,
      freqHz: Double, srE: Double): Double = {
    val om = 2.0 * math.Pi * freqHz / srE
    val coeff = 2.0 * math.cos(om)
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < w) {
      val s0 = buf(i) + coeff * s1 - s2
      s2 = s1
      s1 = s0
      i += 1
    }
    (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (w.toDouble * w.toDouble)
  }

  /** Content-level audio fingerprint (dominant two-tone signature,
    * [[Fingerprint]]): fused decode → decimated 0.125 s window →
    * full-grid Goertzel filterbank argmax. Ground-truth twin:
    * [[IndependentDecoder.dftFingerprint]] (direct DFT over the
    * independently decoded PCM); the two are hard-asserted equal for
    * every staged clip in `ClipGen` staging.
    */
  def audioFingerprint(codec: String, bytes: Array[Byte],
      srHz: Int): Either[String, (Int, Int)] = {
    val k = Fingerprint.decimation(srHz)
    val maxW = Fingerprint.windowLen(srHz)
    val buf = new Array[Double](maxW)
    var w = 0
    var idx = 0
    foreachPcm(codec, bytes) { s =>
      if (w < maxW && idx % k == 0) { buf(w) = s / 32768.0; w += 1 }
      idx += 1
    }.map { _ =>
      val srE = srHz.toDouble / k
      Fingerprint.estimate(f => goertzelPowerWin(buf, w, f, srE))
    }
  }

  /** Everything the audio-curation queries need from one clip in ONE
    * decode pass: [[summarize]] stats + the 500 Hz probe-tone power
    * ([[goertzelPowerAt]]) + the content fingerprint
    * ([[audioFingerprint]]) — accumulator arithmetic mirrored
    * operation-for-operation from each standalone kernel (asserted
    * bit-identical in CodecsSpec), so q67/s28 pay one decode where
    * three chained calls would pay three.
    */
  final case class CurationProfile(
      stats: PcmStats, tonePower: Double, fpF1: Int, fpF2: Int)

  def curationProfile(codec: String, bytes: Array[Byte],
      srHz: Int): Either[String, CurationProfile] = {
    require(srHz > 0, s"srHz must be positive: $srHz")
    // summarize accumulators
    var sumSq = 0.0
    var peakAbs = 0
    var zc = 0
    var clipped = 0
    var prevNonNeg = true
    var first = true
    // goertzelPowerAt(500 Hz) recurrence
    val om = 2.0 * math.Pi * 500.0 / srHz
    val coeff = 2.0 * math.cos(om)
    var s1 = 0.0
    var s2 = 0.0
    // fingerprint window
    val k = Fingerprint.decimation(srHz)
    val maxW = Fingerprint.windowLen(srHz)
    val buf = new Array[Double](maxW)
    var w = 0
    var idx = 0
    foreachPcm(codec, bytes) { s =>
      val v = s / 32768.0
      sumSq += v * v
      val a = math.abs(s)
      if (a > peakAbs) peakAbs = a
      if (a >= 32736) clipped += 1
      val nonNeg = s >= 0
      if (!first && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      first = false
      val s0 = v + coeff * s1 - s2
      s2 = s1
      s1 = s0
      if (w < maxW && idx % k == 0) { buf(w) = v; w += 1 }
      idx += 1
    }.map { n =>
      val tone = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n.toDouble)
      val srE = srHz.toDouble / k
      val (f1, f2) = Fingerprint.estimate(f => goertzelPowerWin(buf, w, f, srE))
      CurationProfile(PcmStats(n, sumSq, peakAbs / 32768.0, zc, clipped),
        tone, f1, f2)
    }
  }

  /** Signal-to-noise ratio in dB of `decoded` against `original`. */
  def snrDb(original: Array[Float], decoded: Array[Float]): Double = {
    require(original.length == decoded.length, "length mismatch")
    var sig = 0.0
    var noise = 0.0
    var i = 0
    while (i < original.length) {
      val o = original(i).toDouble
      val d = decoded(i).toDouble
      sig += o * o
      noise += (o - d) * (o - d)
      i += 1
    }
    if (noise == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(sig / noise)
  }
}
