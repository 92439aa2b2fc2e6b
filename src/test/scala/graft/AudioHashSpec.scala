package graft

import org.apache.spark.sql.functions._
import graft.operators.{AudioCodec, Dedup, Multimodal}

/** Perceptual audio fingerprinting (`AudioCodec.audioFingerprint`,
  * `patternWav`) and Hamming-banded audio dedup — the audio twin of
  * ImageHashSpec.
  */
class AudioHashSpec extends SparkSpec {

  test("patternWav fingerprint round-trips the code exactly (incl. edge codes)") {
    val rnd = new scala.util.Random(7L)
    val codes = Seq(0L, -1L, Long.MinValue, Long.MaxValue,
      0x5555555555555555L, 0xaaaaaaaaaaaaaaaaL) ++
      Seq.fill(50)(rnd.nextLong())
    codes.foreach { c =>
      val got = AudioCodec.audioFingerprint(AudioCodec.patternWav(c))
      assert(got.contains(c), s"code $c round-tripped to $got")
    }
  }

  test("fingerprint is EXACTLY gain-invariant (re-mastered copy = same hash)") {
    val rnd = new scala.util.Random(11L)
    Seq.fill(20)(rnd.nextLong()).foreach { c =>
      val base = AudioCodec.audioFingerprint(AudioCodec.patternWav(c, gain = 1))
      (2 to 4).foreach { g =>
        val loud = AudioCodec.audioFingerprint(AudioCodec.patternWav(c, gain = g))
        assert(loud == base, s"code $c gain $g drifted: $base vs $loud")
        // and the payloads really are byte-distinct — the invariance is
        // perceptual, not an accidental byte equality
        assert(!java.util.Arrays.equals(
          AudioCodec.patternWav(c, gain = 1), AudioCodec.patternWav(c, gain = g)))
      }
    }
  }

  test("fast RIFF parse equals the SPI decode on every synthesized payload") {
    // the fingerprint's fast path (direct chunk walk) must agree with the
    // javax.sound fallback bit-for-bit on the canonical WAVs this library
    // writes — both fingerprints and raw PCM location
    val rnd = new scala.util.Random(13L)
    val payloads = Seq.fill(20)(AudioCodec.patternWav(rnd.nextLong())) ++
      (0L to 5L).map(AudioCodec.synthWav)
    payloads.foreach { wav =>
      val fast = AudioCodec.riffPcm16Data(wav)
      assert(fast.isDefined, "canonical WAV must take the fast path")
      val (buf, off, len) = fast.get
      val viaSpi = {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        try {
          val data = ais.readAllBytes()
          assert(!ais.getFormat.isBigEndian)
          data
        } finally ais.close()
      }
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(buf, off, off + len), viaSpi),
        "fast-path PCM slice differs from the SPI decode")
      assert(AudioCodec.fingerprintOf(buf, off, len, bigEndian = false) ==
        AudioCodec.fingerprintOf(viaSpi, 0, viaSpi.length, bigEndian = false))
    }
  }

  test("fingerprint: undecodable, null, and too-short payloads yield None") {
    assert(AudioCodec.audioFingerprint(null).isEmpty)
    assert(AudioCodec.audioFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // real WAV with fewer samples than one per window (65 needed)
    val tiny = AudioCodec.pcmWav(8000, 1, Array.fill[Short](40)(100))
    assert(AudioCodec.audioFingerprint(tiny).isEmpty)
  }

  test("synthWav fingerprints (two-level alternating waveform) decode without error") {
    // synthWav's energy profile is flat (every window same a²+b² mix), so
    // its fingerprint is all ties = 0 — a degenerate but well-defined hash
    (0L to 10L).foreach { id =>
      val fp = AudioCodec.audioFingerprint(AudioCodec.synthWav(id))
      assert(fp.contains(0L), s"id $id: $fp")
    }
  }

  test("audio dedup finds exactly the planted re-mastered dups on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val isCopy = pmod(col("doc_id"), lit(10)) === 9
    val wavs = Multimodal.synthesizePatternWav(docs,
      when(isCopy, col("doc_id") - 1).otherwise(col("doc_id")),
      when(isCopy, lit(2)).otherwise(lit(1)))
    val fps = Multimodal.audioHashes(wavs, "doc_id", col("wav"))
    val got = Dedup.hammingPairs(fps, "doc_id", "afp", maxHamming = 3)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = docs.filter(isCopy).collect()
      .map(r => (r.getLong(0) - 1, r.getLong(0))).toSet
    assert(got == want)
  }
}
