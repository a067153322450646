package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Test-only oracle decoder, implemented independently of
  * [[Codecs]] (table-driven G.711 expansion instead of arithmetic
  * reconstruction; ByteBuffer-based PCM) so decode bugs can't hide
  * behind shared code. Tables built from the ITU-T G.711 definition.
  */
object IndependentDecoder {

  /** μ-law expansion table built by inverting the segment layout. */
  private lazy val ulawTable: Array[Short] = {
    val t = new Array[Short](256)
    for (b <- 0 until 256) {
      val u = ~b & 0xff
      val sign = (u & 0x80) != 0
      val exponent = (u >> 4) & 0x07
      val mantissa = u & 0x0f
      val magnitude = (((mantissa << 3) | 0x84) << exponent) - 0x84
      t(b) = (if (sign) -magnitude else magnitude).toShort
    }
    t
  }

  /** A-law expansion table from the G.711 segment definition. */
  private lazy val alawTable: Array[Short] = {
    val t = new Array[Short](256)
    for (b <- 0 until 256) {
      val a = (b ^ 0x55) & 0xff
      val sign = (a & 0x80) != 0
      val exponent = (a >> 4) & 0x07
      val mantissa = a & 0x0f
      val magnitude =
        if (exponent == 0) (mantissa << 4) | 0x8
        else ((mantissa << 4) | 0x108) << (exponent - 1)
      t(b) = (if (sign) magnitude else -magnitude).toShort
    }
    t
  }

  def decode(codec: String, bytes: Array[Byte]): Array[Float] = codec match {
    case "pcm16le" =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val out = new Array[Float](bytes.length / 2)
      for (i <- out.indices) out(i) = bb.getShort() / 32768.0f
      out
    case "ulaw" => bytes.map(b => ulawTable(b & 0xff) / 32768.0f)
    case "alaw" => bytes.map(b => alawTable(b & 0xff) / 32768.0f)
    case other  => throw new IllegalArgumentException(other)
  }
}
