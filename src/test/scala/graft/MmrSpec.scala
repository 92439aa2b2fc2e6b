package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** MMR diversified top-k: λ=1 degeneracy to the relevance ranking,
  * diversity on a planted near-dup cluster, clamping, and partitioning
  * invariance.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // query 0 at the origin direction; 1 and 2 are near-identical highly
  // relevant twins; 3 is moderately relevant but orthogonal to the twins;
  // 4 is weakly relevant
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.11f, 0.0f, 0.0f)),
    (3L, Array(0.6f, 0.0f, 0.8f, 0.0f)),
    (4L, Array(0.3f, 0.0f, 0.0f, 0.95f))
  ).toDF("vec_id", "embedding")

  test("lambda = 1 reproduces the plain relevance top-k") {
    val plain = Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") === 0, 3)
      .select("n_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mmr = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
        k = 3, lambdaRel = 1.0, candidates = 4)
      .select("n_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(mmr == plain)
  }

  test("diversity: the second near-identical twin is displaced") {
    val got = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
        k = 2, lambdaRel = 0.5, candidates = 4)
      .select("n_id").collect().map(_.getLong(0)).toSeq
    // relevance alone ranks the twins 1-2; MMR keeps the better twin and
    // replaces its duplicate with the orthogonal vector
    assert(got.head == 2L || got.head == 1L)
    assert(got(1) == 3L, s"expected the orthogonal vector second, got $got")
  }

  test("first pick is always the relevance argmax") {
    for (lam <- Seq(0.0, 0.3, 0.7)) {
      val first = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
          k = 3, lambdaRel = lam, candidates = 4)
        .filter(col("rk") === 1).select("n_id").head().getLong(0)
      val best = Similarity.cosineTopK(emb, "vec_id", "embedding", col("vec_id") === 0, 1)
        .select("n_id").head().getLong(0)
      assert(first == best, s"lambda=$lam")
    }
  }

  test("candidate volume is observable via the graft_mmr_candidates metric") {
    // the production listener contract: sum `examined` across every
    // prefix-matched observation — here one MMR stage over a 4-candidate
    // pool (the 4 non-query vectors), so exactly 4 rows enter the greedy
    // tail
    val seen = observedExamined(Similarity.mmrCandidatesMetric) {
      Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
        k = 2, lambdaRel = 0.5, candidates = 4).collect()
    }
    assert(seen.contains(4L), s"expected 4 observed candidates, got $seen")
  }

  test("k larger than the candidate pool clamps to the pool") {
    val got = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
      k = 10, lambdaRel = 0.7, candidates = 10).collect()
    assert(got.length == 4, "4 non-query vectors exist")
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("greedy trace matches an independent in-memory replay") {
    import java.math.{BigDecimal => JBD}
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val q = vecs(0L)
    val lam = JBD.valueOf(0.7); val om = JBD.ONE.subtract(lam)
    val cand = Seq(1L, 2L, 3L, 4L)
      .map(id => id -> JBD.valueOf(operators.Det.round6(cos(q, vecs(id)))))
    var picked = List.empty[Long]
    val expect = (1 to 4).map { rk =>
      val scored = cand.filterNot(c => picked.contains(c._1)).map { case (id, rel) =>
        val pens = picked.map(p => JBD.valueOf(operators.Det.round6(cos(vecs(id), vecs(p)))))
        val score = if (pens.isEmpty) lam.multiply(rel)
                    else lam.multiply(rel).subtract(om.multiply(pens.max))
        (id, rel, score)
      }
      val (id, rel, score) = scored.minBy { case (i, _, s) => (s.negate, i) }(
        Ordering.Tuple2(Ordering.ordered[JBD], Ordering.Long))
      picked :+= id
      (0L, id, rk.toLong, rel.doubleValue,
        score.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    val got = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
        k = 4, lambdaRel = 0.7, candidates = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == expect)
  }

  test("IVF-candidate MMR at full probe equals the brute path exactly") {
    val brute = Similarity.mmrTopK(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 3, lambdaRel = 0.7, candidates = 4).collect().toSeq
    val ivf = Similarity.mmrTopKIvf(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 3, lambdaRel = 0.7, candidates = 4,
      nlist = 2, nprobe = 2).collect().toSeq
    assert(ivf == brute)
  }

  test("trained MMR-over-IVF equals the pinned-centroid entry point under its own quantizer") {
    // the composed serve machinery is ONE code path (mmrTopKIvf trains
    // then delegates): feeding the trained centroids back through the
    // pinned entry point must reproduce the fused result bit-for-bit —
    // the trained≡pinned parity that lets the hash-green pinned catalog
    // row certify the trained path's serve stages
    val cs = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 2, seed = 42L).toSeq.map(_.toSeq)
    val fused = Similarity.mmrTopKIvf(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 3, lambdaRel = 0.7, candidates = 4,
      nlist = 2, nprobe = 2).collect().toSeq
    val pinned = Similarity.mmrTopKIvfWithCentroids(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 3, lambdaRel = 0.7, candidates = 4,
      cs, nprobe = 2).collect().toSeq
    assert(pinned == fused)
  }

  test("result is partitioning-invariant") {
    val a = Similarity.mmrTopK(emb, "vec_id", "embedding", col("vec_id") === 0,
      k = 3, lambdaRel = 0.7, candidates = 4).collect().toSeq
    val b = Similarity.mmrTopK(emb.repartition(5), "vec_id", "embedding",
      col("vec_id") === 0, k = 3, lambdaRel = 0.7, candidates = 4).collect().toSeq
    assert(a == b)
  }
}
