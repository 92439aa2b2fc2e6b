package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SimHashAgg

/** Deduplication family for training-data pipelines (north-star extension):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - exact: one groupBy on a content hash — single shuffle of (hash, id);
  *  - jaccardPairs: exact all-pairs via shared-shingle join — QUADRATIC in
  *    colliding docs; correct baseline and the verifier for the LSH path,
  *    not the 100 TB path itself;
  *  - minHashLSH: signature (one groupBy) → band buckets (one groupBy) →
  *    candidate pairs (bucket-local join) → exact verify on candidates
  *    only. Work is linear in corpus + candidates — this is the scale path;
  *  - simHash: one 64-bit fingerprint per doc via a mergeable Aggregator;
  *    near-dup ⇔ small Hamming distance, join-free per-doc cost.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical text + the
    * duplicate count. Content-hash groupBy; never shuffles the text itself
    * when `hashOnly` (ship sha2(text) not text — at 100 TB this matters).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(col(textCol), 256).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_copies"))

  /** All-pairs exact n-gram Jaccard ≥ `threshold` via shared-shingle join.
    * d1 < d2; output (d1, d2, jacc).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 2, threshold: Double = 0.5): DataFrame = {
    val bg = TextOps.shingleSet(df, idCol, textCol, n).cache()
    val sz = bg.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val x = bg.select(col(idCol).as("d1"), col("sh"))
    val y = bg.select(col(idCol).as("d2"), col("sh"))
    val inter = x.join(y, Seq("sh"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col(idCol).as("d1"), col("n_sh").as("n1")), Seq("d1"))
      .join(sz.select(col(idCol).as("d2"), col("n_sh").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        (col("i") * lit(1.0) / (col("n1") + col("n2") - col("i"))).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** Deterministic MinHash signature: numHashes independent hashes via
    * seed-perturbed xxhash64(shingle, seed+i), min per doc. One groupBy
    * over (doc, shingle); avoids ANSI-mode overflow that an affine
    * (a*h+b) family would hit.
    */
  def minHashSignatures(shingleSet: DataFrame, idCol: String,
                        numHashes: Int, seed: Long = 42L): DataFrame = {
    val mins = (0 until numHashes).map { i =>
      min(xxhash64(col("sh"), lit(seed + i))).as(s"mh_$i")
    }
    shingleSet.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: candidate pairs whose signatures collide in at
    * least one band, then exact-Jaccard verification of candidates only.
    *
    * numHashes = bands * rowsPerBand. Collision prob for similarity s is
    * 1-(1-s^rowsPerBand)^bands (e.g. 32 = 8×4: s=0.8 → 0.93, s=0.2 → 0.013).
    */
  def minHashLSH(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 2, bands: Int = 8, rowsPerBand: Int = 4,
                 threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val bg = TextOps.shingleSet(df, idCol, textCol, n).cache()
    val sig = minHashSignatures(bg, idCol, bands * rowsPerBand, seed)
    // band signature = hash of its rowsPerBand minhashes
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bsig"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    val cand = buckets.as("l").join(buckets.as("r"), Seq("band", "bsig"))
      .filter(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("d1"), col(s"r.$idCol").as("d2"))
      .distinct()
    // exact verify candidates only
    val sz = bg.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val x = bg.select(col(idCol).as("d1"), col("sh"))
    val y = bg.select(col(idCol).as("d2"), col("sh"))
    val inter = cand.join(x, Seq("d1")).join(y, Seq("d2", "sh"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col(idCol).as("d1"), col("n_sh").as("n1")), Seq("d1"))
      .join(sz.select(col(idCol).as("d2"), col("n_sh").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        (col("i") * lit(1.0) / (col("n1") + col("n2") - col("i"))).as("jacc"))
      .filter(col("jacc") >= threshold)
  }

  /** SimHash fingerprints: one 64-bit fingerprint per doc (mergeable
    * aggregator over shingle hashes).
    */
  def simHashFingerprints(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 2): DataFrame =
    TextOps.shingleSet(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(SimHashAgg.simhash(xxhash64(col("sh"))).as("simhash"))

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming. All-pairs on
    * fingerprints (64 bits/doc — 8 bytes per doc makes even a broadcast
    * all-pairs feasible far beyond what raw-text comparison allows; a
    * banded prefix-bucket variant drops the quadratic term when needed).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 2, maxHamming: Int = 10): DataFrame = {
    val fp = simHashFingerprints(df, idCol, textCol, n)
    val l = fp.select(col(idCol).as("d1"), col("simhash").as("h1"))
    val r = fp.select(col(idCol).as("d2"), col("simhash").as("h2"))
    l.crossJoin(r)
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
