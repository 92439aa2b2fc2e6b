package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SemDeDup (cluster-then-prune semantic dedup): brute-force parity of
  * the whole flow — same clusters, same within-cluster duplicate groups,
  * same keep rule — plus the structural contracts (one kept row per
  * group, partitioning invariance, null-vector exclusion).
  */
class SemDedupSpec extends SparkSpec {

  private val threshold = 0.45
  private val nlist = 16

  private lazy val emb = graft.sources.Tables.open(spark, sf, "embeddings")

  /** Driver-side replay of the operator's definition: assign each vector
    * to its nearest trained centroid, scan pairs inside each cluster,
    * union-find the ≥ threshold pairs, keep argmin (centroid_sim, id).
    */
  private lazy val expected: Map[Long, (Long, Long)] = {
    val cs = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist, 42L)
    val rows = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Float], c: Array[Double]): Double = {
      val ad = a.map(_.toDouble)
      dot(ad, c) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(c, c)))
    }
    def l2(a: Array[Float], c: Array[Double]): Double =
      a.map(_.toDouble).zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val assigned = rows.map { case (id, v) =>
      (id, v, cs.indices.minBy(i => (l2(v, cs(i)), i)))
    }
    // within-cluster pairs at >= threshold, chained by union-find
    val parent = scala.collection.mutable.Map(assigned.map(a => a._1 -> a._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      grp <- assigned.groupBy(_._3).values
      Array((i1, v1, _), (i2, v2, _)) <- grp.combinations(2).map(_.toArray)
    } {
      val ad = v1.map(_.toDouble); val bd = v2.map(_.toDouble)
      val sim = dot(ad, bd) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd)))
      if (sim >= threshold) {
        val (ra, rb) = (find(i1), find(i2))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val byComp = assigned.groupBy(a => find(a._1))
    byComp.map { case (_, members) =>
      val rep = members.map(_._1).min
      val kept = members.minBy { case (id, v, b) => (cos(v, cs(b)), id) }._1
      kept -> (rep, members.length.toLong)
    }
  }

  private lazy val got: Map[Long, (Long, Long)] =
    Similarity.semDedup(emb, "vec_id", "embedding", threshold, nlist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("brute-force parity: kept set, representatives, and group sizes") {
    assert(got.keySet == expected.keySet,
      s"kept sets differ: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    got.foreach { case (id, (rep, n)) =>
      assert(expected(id) == ((rep, n)), s"kept $id: got ($rep, $n), expected ${expected(id)}")
    }
  }

  test("exactly one kept row per duplicate group; sizes sum to the corpus") {
    val reps = got.values.map(_._1).toSeq
    assert(reps.distinct.size == reps.size, "two kept rows share a rep_id")
    assert(got.values.map(_._2).sum == emb.count())
  }

  test("result is invariant under input partitioning") {
    val shuffled = Similarity.semDedup(
        emb.repartition(7, col("vec_id")), "vec_id", "embedding", threshold, nlist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(shuffled == got)
  }

  test("pinned-centroid variant equals semDedup fed the same trained quantizer") {
    // semDedupWithCentroids is the flow with training factored out: fed
    // the TRAINED centroids it must be bit-equal to semDedup, and under
    // ANY pinned quantizer the result still partitions the corpus
    val cs = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist, 42L)
      .toSeq.map(_.toSeq)
    val pinned = Similarity.semDedupWithCentroids(emb, "vec_id", "embedding",
        threshold, cs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pinned == got)
    // arbitrary pinned quantizer (4 data vectors): structural contracts
    val dataCs = emb.filter(col("vec_id") >= 100 && col("vec_id") <= 103)
      .orderBy(col("vec_id")).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val kept = Similarity.semDedupWithCentroids(emb, "vec_id", "embedding",
      threshold, dataCs)
    val reps = kept.select(col("rep_id")).collect().map(_.getLong(0))
    assert(reps.distinct.length == reps.length, "two kept rows share a rep_id")
    assert(kept.agg(sum(col("n_members"))).head.getLong(0) == emb.count())
  }

  test("null vectors are excluded by contract") {
    import spark.implicits._
    val withNull = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((999999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val kept = Similarity.semDedup(withNull, "vec_id", "embedding", threshold, nlist)
    assert(kept.filter(col("id") === 999999L).isEmpty)
    assert(kept.agg(sum(col("n_members"))).head.getLong(0) == emb.count())
  }
}
