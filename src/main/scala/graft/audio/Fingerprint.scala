package graft.audio

/** Content-level audio fingerprint: the dominant two-tone signature
  * of a clip, recovered by a coarse→fine filterbank argmax over a
  * short decimated analysis window.
  *
  * The fingerprint is the pair (f1, f2) of grid frequencies (Hz) that
  * maximize narrowband power in the low band (100–490 Hz, 10 Hz grid)
  * and the high band (500–1314 Hz, 37 Hz grid). It is
  * sample-rate-, codec-, phase- and (mostly) duration-invariant: the
  * same underlying waveform re-encoded at a different rate or codec
  * lands on the same fingerprint, which is what makes it a usable
  * cross-codec duplicate key for corpus dedup (q66–q68, s28) — the
  * audio analogue of the text pipeline's MinHash/SimHash keys.
  *
  * Two independent numeric paths compute it (the oracle pattern of
  * `q58`/`p01`): the engine fuses a Goertzel filterbank into the
  * decode pass ([[Codecs.audioFingerprint]]); the ground truth
  * re-derives it by direct DFT accumulation over the independently
  * decoded PCM ([[IndependentDecoder.dftFingerprint]]). This object
  * holds only the SHARED CONTROL logic — grids, decimation, window
  * sizing, scan order — which is definitional (like the q58 probe
  * frequency), not evidential; the evidence is the two decode+power
  * numeric paths agreeing on every staged clip, hard-asserted at
  * staging time in `ClipGen`.
  *
  * Cost shape for 100 TB: the window is ≤ 0.125 s at ≤ 11 025 Hz
  * effective rate (≤ 1 378 samples) and the scan probes the full
  * 63-point grid over it (≤ ~87k multiply-adds per clip — orders of
  * magnitude below the decode itself), so the per-clip fingerprint
  * cost is O(1): it pipelines inside the same narrow map stage as
  * `summarize`, no extra shuffle, no PCM materialization. A
  * coarse→fine scan is deliberately NOT used: with a 0.125 s
  * rectangular window the mainlobe half-width is 8 Hz, so any coarse
  * probe grid sparser than the final grid sits in the sidelobe floor
  * for most true tones (measured: a 250 Hz tone registers ~1e-5 of
  * its peak power at probes 40 Hz away) and the coarse argmax
  * degenerates to leakage noise — resolution this sharp makes a
  * hierarchy unsound, and the full grid is cheap enough not to need
  * one.
  *
  * Reference analogue: the deterministic per-record feature
  * derivation of `/root/reference/src/main/java/de/unimarburg/diz/
  * labtofhir/mapper/LoincMapper.java` (code normalization as a
  * grouping key), lifted to audio content.
  */
object Fingerprint {

  /** Low band: 100..490 Hz in 10 Hz steps (40 candidates). */
  val F1Grid: Array[Int] = (100 to 490 by 10).toArray

  /** High band: 500 + 37·j Hz, j = 0..22 (23 candidates). */
  val F2Grid: Array[Int] = Array.tabulate(23)(j => 500 + 37 * j)

  /** Keep every k-th sample so the effective rate is ≤ 11 025 Hz.
    * The Nyquist of the decimated stream (≥ 4 kHz for our rates) is
    * far above the 1 314 Hz top of the tone grid, so decimation
    * WITHOUT an anti-alias filter is exact for in-grid content, not
    * an approximation — and it caps the per-clip analysis cost
    * independently of the source rate.
    */
  def decimation(srHz: Int): Int = {
    require(srHz > 0, s"srHz must be positive: $srHz")
    (srHz + 11024) / 11025
  }

  /** Analysis-window length: 0.125 s of effective-rate samples
    * (1 000 @ 8 kHz effective, 1 378 @ 11 025 Hz). Frequency
    * resolution 8 Hz — inside the 10 Hz f1 grid spacing.
    */
  def windowLen(srHz: Int): Int = {
    val k = decimation(srHz)
    math.max(1, (srHz.toDouble / k / 8.0).toInt)
  }

  /** Full-grid argmax over both bands. `power(freqHz)` is the
    * side-specific numeric kernel. Scan order is ascending and ties
    * keep the FIRST candidate (strict `>` replacement), identically
    * on both sides.
    */
  def estimate(power: Double => Double): (Int, Int) = {
    def argmax(cands: Array[Int]): Int = {
      var best = 0
      var bestP = -1.0
      var i = 0
      while (i < cands.length) {
        val p = power(cands(i).toDouble)
        if (p > bestP) { bestP = p; best = i }
        i += 1
      }
      best
    }
    (F1Grid(argmax(F1Grid)), F2Grid(argmax(F2Grid)))
  }
}
