package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Hard-negative mining: band semantics (near-dups excluded, weak hits
  * excluded), degeneracy to the plain top-k on an all-covering band,
  * empty-band queries absent by contract, and brute ≡ full-probe IVF
  * exactness (the band re-rank composes with the probe stage without
  * changing semantics).
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // query 0; 1 is a near-dup (sim ≈ 0.996 — above any sane hiSim);
  // 2 and 3 sit mid-band (the informative negatives); 4 is weakly
  // similar (below loSim); 5 is orthogonal
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.09f, 0.0f, 0.0f)),
    (2L, Array(0.6f, 0.0f, 0.8f, 0.0f)),
    (3L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
    (4L, Array(0.2f, 0.0f, 0.0f, 0.98f)),
    (5L, Array(0.0f, 1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private def page(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("band keeps the informative middle and drops near-dups and weak hits") {
    val got = page(Similarity.hardNegatives(emb, "vec_id", "embedding",
      col("vec_id") === 0, 10, loSim = 0.3, hiSim = 0.9))
    assert(got.map(_._2).toSet == Set(2L, 3L),
      s"expected exactly the mid-band vectors, got $got")
    assert(got.forall { case (_, _, sim, _) => sim >= 0.3 && sim < 0.9 },
      s"a paged similarity escaped the band: $got")
    // the near-dup (1) outranks everything globally — the band must be
    // what excluded it, not the page size
    val plain = page(Similarity.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") === 0, 10))
    assert(plain.head._2 == 1L && !got.exists(_._2 == 1L))
  }

  test("an all-covering band degenerates to the plain top-k") {
    val all = page(Similarity.hardNegatives(emb, "vec_id", "embedding",
      col("vec_id") < 2, 10, loSim = -1.0, hiSim = 1.1))
    val plain = page(Similarity.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 2, 10))
    assert(all == plain)
  }

  test("a query with no in-band neighbor is absent by contract") {
    // vector 5 is orthogonal-or-negative to everything except weak hits:
    // an impossible band drops its page group entirely
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding",
      col("vec_id") === 5, 10, loSim = 0.998, hiSim = 0.999)
    assert(got.count() == 0)
  }

  test("full-probe IVF band equals the brute band; trained wrapper delegates") {
    val real = spark.read.parquet(s"$sf/embeddings.parquet")
    val pred = col("vec_id") < 10
    val brute = page(Similarity.hardNegatives(real, "vec_id", "embedding",
      pred, 10, 0.25, 0.45))
    assert(brute.nonEmpty, "fixture band must be non-empty for the parity to mean anything")
    val nlist = 8
    val full = page(Similarity.hardNegativesIvf(real, "vec_id", "embedding",
      pred, 10, 0.25, 0.45, nlist = nlist, nprobe = nlist))
    assert(full == brute, "probing every bucket must equal brute force")
    // the trained wrapper IS WithCentroids under its own centroids
    val cs = Similarity.trainCentroids(real, "vec_id", "embedding", nlist, 42L)
      .toSeq.map(_.toSeq)
    val delegated = page(Similarity.hardNegativesIvfWithCentroids(real,
      "vec_id", "embedding", pred, 10, 0.25, 0.45, cs, nprobe = 4))
    val trained = page(Similarity.hardNegativesIvf(real, "vec_id", "embedding",
      pred, 10, 0.25, 0.45, nlist = nlist, nprobe = 4))
    assert(delegated == trained)
  }
}
