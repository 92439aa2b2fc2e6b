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
}
