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
    * fixed seeded Gaussian directions). Each plane is a single array
    * literal + one fold expression — plan size O(bits), not O(bits·dim).
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val bitCols = (0 until bits).map { b =>
      val plane = typedlit(IndexedSeq.fill(dim)(rnd.nextGaussian()))
      val proj = aggregate(
        zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
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

  /** Tight-loop dot/norm kernels for the dense pairwise path. A plain
    * Scala UDF here beats both the lambda-fold (interpreted per element
    * with boxing) and a posexplode/equi-join shape (materializes N²·dim
    * rows): the loop compiles to primitive double arithmetic, and its
    * sequential accumulation order matches the oracle's list_sum.
    */
  private val dotKernel = udf((a: Seq[Float], b: Seq[Float]) => {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  })
  private val normKernel = udf((a: Seq[Float]) => {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  })

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): all pairs
    * with cosine ≥ threshold — exact semantics.
    *
    * Distributed block nested-loop: one side is hash-partitioned into
    * `blocks` buckets on its id, the other is replicated to every bucket
    * (explode over block ids), and the two meet in a plain equi shuffle
    * join on the block id. Every unordered pair is examined exactly once
    * (`d1 < d2`), nothing touches the driver, and no crossJoin enters the
    * plan; per-pair work is the compiled dot kernel. Shuffle volume is
    * blocks·N on the replicated side, so `blocks` should track cluster
    * parallelism. The sub-quadratic path for looser thresholds is
    * `lshTopK`.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, blocks: Int = 32): DataFrame = {
    val withNorm = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"), normKernel(col(vecCol)).as("nrm"))
    val l = withNorm.select(
      col("id").as("d1"), col("vec").as("v1"), col("nrm").as("n1"),
      explode(sequence(lit(0), lit(blocks - 1))).as("blk"))
    val r = withNorm.select(
      col("id").as("d2"), col("vec").as("v2"), col("nrm").as("n2"),
      pmod(col("id"), lit(blocks.toLong)).cast("int").as("blk"))
    l.join(r, Seq("blk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(dotKernel(col("v1"), col("v2")) / (col("n1") * col("n2")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
