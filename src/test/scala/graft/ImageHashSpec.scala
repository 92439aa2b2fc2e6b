package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, ImageCodec, Multimodal}

/** Perceptual image hashing (`ImageCodec.dHash`, `patternPng`) and
  * Hamming-banded image dedup (`Dedup.hammingPairs`).
  */
class ImageHashSpec extends SparkSpec {

  test("patternPng dHash round-trips the code exactly (incl. edge codes)") {
    val rnd = new scala.util.Random(7L)
    val codes = Seq(0L, -1L, Long.MinValue, Long.MaxValue,
      0x5555555555555555L, 0xaaaaaaaaaaaaaaaaL) ++
      Seq.fill(50)(rnd.nextLong())
    codes.foreach { c =>
      val got = ImageCodec.dHash(ImageCodec.patternPng(c))
      assert(got.contains(c), s"code $c round-tripped to $got")
    }
  }

  test("dHash degrades gracefully under resize (near, never random)") {
    // blow the pattern up 4x with the real resizer and rehash: bilinear
    // resampling CAN smear a single-grey-level step across the grid
    // boundary (so exact equality is not the contract — this is a
    // perceptual hash, not a checksum), but the rehash must stay within
    // a small Hamming ball of the original — two random 64-bit hashes
    // sit at ~32
    val rnd = new scala.util.Random(11L)
    Seq.fill(20)(rnd.nextLong()).foreach { c =>
      val png = ImageCodec.patternPng(c)
      val big = ImageCodec.resizePng(png, (ImageCodec.DHASH_W + 1) * 4,
        ImageCodec.DHASH_H * 4)
      val re = ImageCodec.dHash(big).get
      val d = java.lang.Long.bitCount(re ^ c)
      assert(d <= 8, s"code $c drifted $d bits under 4x upscale + rehash")
    }
  }

  test("dHash: undecodable and null payloads yield None") {
    assert(ImageCodec.dHash(null).isEmpty)
    assert(ImageCodec.dHash(Array[Byte](1, 2, 3)).isEmpty)
    // recognized-but-truncated PNG
    val png = ImageCodec.patternPng(42L)
    assert(ImageCodec.dHash(png.take(20)).isEmpty)
  }

  test("hammingPairs equals brute force on random fingerprints") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 120).map(i => (i.toLong, rnd.nextLong()))
    // plant near pairs: every odd id = previous id's hash with ≤ 3 bits
    // flipped (possibly 0 — exact dup); even ids stay random
    val planted = rows.map { case (i, h) =>
      if (i % 2 == 1) {
        val base = rows((i - 1).toInt)._2
        val flips = rnd.nextInt(4)
        val flipped = (0 until flips).foldLeft(base)((a, _) =>
          a ^ (1L << rnd.nextInt(64)))
        (i, flipped)
      } else (i, h)
    }
    val fp = planted.toDF("id", "h")
    val got = Dedup.hammingPairs(fp, "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (a, ha) <- planted; (b, hb) <- planted if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(got == brute)
  }

  test("image dedup finds exactly the planted perceptual dups on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val base = when(pmod(col("doc_id"), lit(10)) === 9, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val pngs = Multimodal.synthesizePatternPng(docs, base)
    val hashes = Multimodal.imageHashes(pngs, "doc_id", col("png"))
    val got = Dedup.hammingPairs(hashes, "doc_id", "dhash", maxHamming = 3)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      .collect().map(r => (r.getLong(0) - 1, r.getLong(0))).toSet
    assert(got == want)
    // every planted pair is at Hamming 0 (bit-identical pattern)
    val zero = Dedup.hammingPairs(hashes, "doc_id", "dhash", maxHamming = 0)
      .select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero == want)
  }
}
