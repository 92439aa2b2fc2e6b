package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) —
  * north-star extension (SURVEY.md §2.11).
  *
  * Paths:
  *  - `cosineTopK`: brute-force queries × corpus — correct baseline; cost
  *    |Q|·N·dim, fine when |Q| is small or as the verifier;
  *  - `lshTopK`: random-hyperplane LSH buckets + exact re-rank inside the
  *    probed buckets — the scale path (candidates ≪ N per query).
  *
  * All dot products are sequential left-to-right folds over doubles so the
  * DuckDB oracle (list_sum of per-dim products) reproduces them bitwise.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in doubles. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `queryPred`), the k nearest corpus vectors (excluding self).
    * Output: (q_id, n_id, sim rounded to 6, rk). Ordered by the rounded
    * similarity (identical on both engines) then id — deterministic.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = emb.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val sims = q.crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("q_id"), col("rk"))
  }

  /** Random-hyperplane signature (`bits` sign bits of projections onto
    * fixed seeded Gaussian-ish directions).
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val bitCols = (0 until bits).map { b =>
      val proj = (0 until dim)
        .map(i => element_at(vec, i + 1).cast("double") * lit(planes(b)(i)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Multi-table LSH approximate top-k: L independent signature tables of
    * `bits` sign bits each; candidates = pairs colliding in ANY table;
    * exact cosine re-rank over candidates only. Collision prob for angle θ
    * is 1-(1-(1-θ/π)^bits)^tables — tune (bits, tables) to the similarity
    * regime (near-dup: more bits; weakly-similar: fewer bits, more tables).
    *
    * Scale: candidates shuffle on (table, bucket) — linear in corpus +
    * candidate pairs, never all-pairs. (The per-plane literal expressions
    * are fine for moderate dim·bits·tables; a 100 TB deployment would fold
    * the plane matrix into one array literal + aggregate expression.)
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, dim: Int = 64, bits: Int = 4,
              tables: Int = 16, seed: Long = 42L): DataFrame = {
    val sigs = (0 until tables).map { l =>
      struct(lit(l).as("tbl"),
        hyperplaneSignature(col(vecCol), dim, bits, seed + 1000L * l).as("bucket"))
    }
    val tagged = emb.select(col(idCol), explode(array(sigs: _*)).as("tb"))
      .select(col(idCol), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = tagged.filter(queryPred).select(col(idCol).as("q_id"), col("tbl"), col("bucket"))
    val c = tagged.select(col(idCol).as("n_id"), col("tbl"), col("bucket"))
    val cand = q.join(c, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
    val qv = emb.filter(queryPred).select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val cv = emb.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val sims = cand.join(qv, Seq("q_id")).join(cv, Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        round(cosine(col("q_vec"), col("n_vec")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("q_id"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): all pairs
    * with cosine ≥ threshold. Brute force; LSH variant available via
    * lshTopK for scale.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val l = emb.select(col(idCol).as("d1"), col(vecCol).as("v1"))
    val r = emb.select(col(idCol).as("d2"), col(vecCol).as("v2"))
    l.crossJoin(r)
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(cosine(col("v1"), col("v2")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
