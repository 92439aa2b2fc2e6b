package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Pure-JDK audio codec backing the multimodal operators — real
  * `javax.sound.sampled` WAV (RIFF) encode and decode. No external codec
  * library: everything here ships with the JVM, so the operators work on
  * any executor. Completes the multimodal family next to [[ImageCodec]]
  * (ref capability: binary-asset ingestion, `ref:P/storage/` loaders; the
  * audio feature surface itself is a north-star training-pipeline
  * extension, not a reference operator).
  *
  * Like the image path, synthesis is deterministic per id so the DuckDB
  * oracle predicts the DECODER's output in closed form — a hash match
  * certifies the real encode→decode round trip, not a stub.
  *
  * Determinism notes (the oracle relies on these):
  *  - WAV PCM is lossless; 16-bit samples round-trip bit-exact.
  *  - sample sums and sum-of-squares accumulate in Long (exact for any
  *    corpus that fits in memory: |s| ≤ 32768 ⇒ s² ≤ 2³⁰, overflow needs
  *    ≥ 2³³ samples) and divide once, so the mean of a two-level
  *    waveform {a,b} in equal counts is exactly (a+b)/2 and its RMS is
  *    exactly sqrt((a²+b²)/2) — both IEEE-exact, since the integer
  *    numerators are < 2⁵³ and both JVM and DuckDB use correctly-rounded
  *    division and sqrt.
  *  - WAV is uncompressed, so unlike image formats there is no
  *    decompression-bomb vector: decoded size is bounded by payload size
  *    (the `AudioInputStream` reads from the byte array and cannot
  *    manufacture data beyond it, whatever the header's frame count
  *    claims).
  */
object AudioCodec {

  /** Encode interleaved 16-bit signed PCM frames as a WAV payload via the
    * real `javax.sound.sampled` writer (little-endian, `channels`-way
    * interleaved — `samples.length` must be a multiple of `channels`).
    */
  def pcmWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0,
      s"samples (${samples.length}) not a multiple of channels ($channels)")
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /*signed*/ true, /*bigEndian*/ false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  // ---- deterministic synthesis formulas (mirrored verbatim in the DuckDB
  // oracle; keep the two in lockstep) ----------------------------------------
  //   sample_rate = 8000        channels = 1 + id % 2
  //   frames      = 400 + (id % 50) * 2                  (always even)
  //   a = (id*37) % 20000 - 10000   b = (id*53) % 20000 - 10000
  //   mono:   sample i = if (i even) a else b
  //   stereo: frame f  = (left a, right b)
  // either way the a:b sample count is exactly 1:1, so
  //   mean = (a+b)/2      rms = sqrt((a²+b²)/2)
  //   duration_ms = frames * 1000 / 8000 = frames / 8    (exact double)
  def synthWav(id: Long): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val frames = (400 + (id % 50) * 2).toInt
    val a = (id * 37 % 20000 - 10000).toShort
    val b = (id * 53 % 20000 - 10000).toShort
    val samples = new Array[Short](frames * channels)
    var i = 0
    while (i < samples.length) {
      // mono alternates per sample; stereo interleaves (a,b) per frame —
      // in both layouts even positions get a, odd get b
      samples(i) = if (i % 2 == 0) a else b
      i += 1
    }
    pcmWav(8000, channels, samples)
  }

  /** Decode a WAV payload to
    * (duration_ms, sample_rate, channels, mean_amp, rms) over ALL samples
    * (all channels pooled). None for null / unrecognized / corrupt /
    * non-16-bit-PCM payloads — a bad asset must yield a null row, never a
    * task failure.
    */
  def decodeStats(bytes: Array[Byte]): Option[(Double, Int, Int, Double, Double)] = {
    if (bytes == null) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return None
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n == 0) return None
        var sum = 0L
        var sumSq = 0L
        var i = 0
        if (fmt.isBigEndian) {
          while (i < n) {
            val s = (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
            sum += s; sumSq += s.toLong * s; i += 1
          }
        } else {
          while (i < n) {
            val s = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
            sum += s; sumSq += s.toLong * s; i += 1
          }
        }
        val ch = fmt.getChannels
        val durMs = (n / ch) * 1000.0 / fmt.getSampleRate
        Some((durMs, fmt.getSampleRate.toInt, ch,
          sum.toDouble / n, math.sqrt(sumSq.toDouble / n)))
      } finally ais.close()
    } catch {
      // UnsupportedAudioFileException for unrecognized bytes, IOException /
      // runtime parse errors for recognized-but-corrupt headers — all None
      case scala.util.control.NonFatal(_) => None
    }
  }

  // ---- perceptual fingerprint (audio dHash) -------------------------------

  /** Fingerprint geometry: 65 equal windows → 64 energy-delta bits, the
    * audio analogue of [[ImageCodec.dHash]]'s 9×8 grid (Haitsma/Kalker
    * ISMIR'02 reduced to one band: bit w = "does window w+1 carry more
    * energy than window w"). 64 bits compare by Hamming distance through
    * the same [[Dedup.hammingPairs]] banding as the image path.
    */
  val FP_WINDOWS: Int = 65

  /** Perceptual fingerprint of a WAV payload: decode, split the pooled
    * sample stream into [[FP_WINDOWS]] equal windows (tail remainder
    * dropped), sum each window's energy exactly in Long (|s| ≤ 2¹⁵ ⇒
    * s² ≤ 2³⁰; overflow needs ≥ 2³³ samples per window), emit bit w = 1
    * iff E(w+1) > E(w). GAIN-INVARIANT by construction: scaling every
    * sample by a constant scales every window energy by its square, so
    * every strict `>` (and every tie) is preserved — a re-mastered /
    * volume-shifted copy fingerprints identically, which is the whole
    * point of a perceptual hash. None for null / undecodable /
    * non-16-bit-PCM payloads or streams shorter than one sample per
    * window (a bad asset yields a null row, never a task failure).
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    // fast path: canonical RIFF/WAVE PCM16 little-endian (what every WAV
    // this library writes is) — a direct chunk walk, no SPI discovery.
    // The per-asset SPI stream was the fingerprint sweep's whole cost at
    // the 10x scale check (~5 ms/asset); the chunk walk is branch-exact
    // for the canonical layout and anything unusual (big-endian, float,
    // compressed, exotic chunk order) falls back to the javax.sound path
    riffPcm16Data(bytes) match {
      case Some((data, off, len)) => fingerprintOf(data, off, len, bigEndian = false)
      case None =>
        try {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
                fmt.getSampleSizeInBits != 16) return None
            val data = ais.readAllBytes()
            fingerprintOf(data, 0, data.length, fmt.isBigEndian)
          } finally ais.close()
        } catch {
          case scala.util.control.NonFatal(_) => None
        }
    }
  }

  /** Locate the PCM payload of a canonical RIFF/WAVE container with a
    * plain 16-bit integer-PCM `fmt ` chunk: returns (buffer, offset,
    * byte length) of the `data` chunk, or None for anything that is not
    * exactly that (the caller then uses the full SPI decode).
    */
  private[graft] def riffPcm16Data(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
    def le32(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def le16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def tag(i: Int, t: String): Boolean =
      b(i) == t(0).toByte && b(i + 1) == t(1).toByte &&
        b(i + 2) == t(2).toByte && b(i + 3) == t(3).toByte
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= b.length) {
      val size = le32(pos + 4)
      if (size < 0 || pos + 8 + size > b.length) return None
      if (tag(pos, "fmt ")) {
        // wFormatTag 1 (integer PCM), 16 bits/sample — anything else is
        // the SPI's job
        if (size < 16 || le16(pos + 8) != 1 || le16(pos + 22) != 16) return None
        fmtOk = true
      } else if (tag(pos, "data")) {
        return if (fmtOk) Some((b, pos + 8, size)) else None
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Windowed energy-delta hash over a 16-bit PCM byte slice. */
  private[graft] def fingerprintOf(data: Array[Byte], off: Int, len: Int,
                            bigEndian: Boolean): Option[Long] = {
    val n = len / 2
    val win = n / FP_WINDOWS
    if (win == 0) return None
    val energy = new Array[Long](FP_WINDOWS)
    var w = 0
    while (w < FP_WINDOWS) {
      var e = 0L
      var i = w * win
      val end = i + win
      while (i < end) {
        val s =
          if (bigEndian) (data(off + 2 * i).toInt << 8) | (data(off + 2 * i + 1) & 0xff)
          else (data(off + 2 * i + 1).toInt << 8) | (data(off + 2 * i) & 0xff)
        e += s.toLong * s
        i += 1
      }
      energy(w) = e
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < FP_WINDOWS - 1) {
      if (energy(b + 1) > energy(b)) h |= 1L << b
      b += 1
    }
    Some(h)
  }

  /** Mono WAV whose [[audioFingerprint]] is exactly `code` — the audio
    * twin of [[ImageCodec.patternPng]]: window w holds an alternating
    * ±a(w) square wave with a(0) = 1000 and a(w+1) = a(w) + (bit w of
    * code) · 100, so E(w+1) > E(w) iff the bit is set and E ties exactly
    * otherwise (bit 0). Amplitudes stay ≤ 7400, so any `gain` ≤ 4 is
    * clipping-free; a gain ≠ 1 copy differs byte-wise but fingerprints
    * identically (the gain-invariance contract above) — the planted
    * "re-mastered duplicate" for the perceptual-dedup oracle.
    */
  def patternWav(code: Long, gain: Int = 1): Array[Byte] = {
    require(gain >= 1 && gain <= 4, s"gain must be in [1, 4], got $gain")
    val win = 64
    val samples = new Array[Short](FP_WINDOWS * win)
    var a = 1000
    var w = 0
    while (w < FP_WINDOWS) {
      var i = 0
      while (i < win) {
        val s = if (i % 2 == 0) a * gain else -a * gain
        samples(w * win + i) = s.toShort
        i += 1
      }
      if (w < FP_WINDOWS - 1 && ((code >>> w) & 1L) == 1L) a += 100
      w += 1
    }
    pcmWav(8000, 1, samples)
  }
}
