package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bq, Similarity}

/** Binary quantization (`Bq`): signature geometry + determinism, bit
  * balance under mean thresholds, shortlist recall with exact refine,
  * exact parity of the full-refine path, and build/serve parity.
  */
class BqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** Planted clustered corpus (the PqSpec fixture). */
  private def planted(nClusters: Int = 10, per: Int = 12, dim: Int = 64,
                      noise: Double = 0.05): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until per
    } yield ((c * per + i).toLong,
      centers(c).map(x => (x + noise * rnd.nextGaussian()).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  test("signatures are ceil(dim/8) bytes; train and encode are deterministic") {
    val thr = Bq.train(emb, "vec_id", "embedding")
    assert(thr.length == 64)
    assert(Bq.train(emb, "vec_id", "embedding").toSeq == thr.toSeq)
    val codes = Bq.encode(emb, "vec_id", "embedding", thr).collect()
    assert(codes.nonEmpty)
    assert(codes.forall(_.getAs[Array[Byte]]("code").length == 8),
      "64 sign bits must pack to exactly 8 bytes (32× compression)")
    val again = Bq.encode(emb, "vec_id", "embedding", thr).collect()
    assert(codes.map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet ==
      again.map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet)
  }

  test("mean thresholds balance the bits: every varying dim has both signs") {
    // sample = the whole corpus, so for every non-constant dimension the
    // mean strictly separates: at least one vector on each side
    val thr = Bq.train(emb, "vec_id", "embedding", sampleSize = 100000)
    val vecs = emb.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (i <- thr.indices) {
      val vals = vecs.map(_(i))
      if (vals.distinct.length > 1) {
        assert(vals.exists(_ >= thr(i)) && vals.exists(_ < thr(i)),
          s"dim $i: mean threshold ${thr(i)} does not split the corpus")
      }
    }
  }

  test("refined BQ holds a recall floor on clusters; refine lifts the bit scan") {
    val data = planted()
    val pred = col("vec_id") < 5
    val exact = Similarity.cosineTopK(data, "vec_id", "embedding", pred, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Bq.bqTopK(data, "vec_id", "embedding", pred, 10, refine = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rawRecall = raw.intersect(exact).size.toDouble / exact.size
    val refined = Bq.bqTopK(data, "vec_id", "embedding", pred, 10, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = refined.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"refined BQ recall $recall below floor")
    assert(recall >= rawRecall,
      s"exact refine lowered recall: $rawRecall -> $recall")
    val again = Bq.bqTopK(data, "vec_id", "embedding", pred, 10, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(refined == again, "BQ search must be deterministic for a fixed seed")
  }

  test("full-refine BQ EQUALS brute force exactly (shortlist covers the corpus)") {
    val pred = col("vec_id") < 5
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", pred, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val full = Bq.bqTopK(emb, "vec_id", "embedding", pred, 10, refine = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(full == exact)
  }

  test("caller-supplied thresholds reproduce the fused path at the trained point") {
    // bqTopKWithThresholds is the oracle-replayable entry; handing it the
    // SAME thresholds bqTopK trains internally must change nothing
    import graft.operators.Bq
    val thr = Bq.train(emb, "vec_id", "embedding", seed = 42L)
    val fused = Bq.bqTopK(emb, "vec_id", "embedding",
      col("vec_id") < 5, 10, refine = 8).collect().toSeq
    val pinned = Bq.bqTopKWithThresholds(emb, "vec_id", "embedding",
      col("vec_id") < 5, 10, thr, refine = 8).collect().toSeq
    assert(pinned == fused)
  }

  test("served BQ (persisted index) equals the fused path") {
    val dir = s"/tmp/graft_io/p${ProcessHandle.current().pid()}/bq_spec/serve"
    Bq.buildBqIndex(emb, "vec_id", "embedding", dir)
    val queries = emb.filter(col("vec_id") < 5)
    val served = Bq.bqTopKFromIndex(queries, emb, "vec_id", "embedding", dir,
        10, refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val fused = Bq.bqTopK(emb, "vec_id", "embedding", col("vec_id") < 5, 10,
        refine = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(served == fused)
  }
}
