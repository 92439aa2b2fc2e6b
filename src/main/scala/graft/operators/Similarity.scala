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

  /** Tight-loop dot/norm kernels for the dense brute-force paths. A plain
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

  /** Spark round() semantics for a double (BigDecimal HALF_UP) — used by
    * the partition kernel so its output is bit-identical to the
    * expression-based paths and the oracle.
    */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Embedding-cosine near-duplicate pairs (dedup by embedding): all pairs
    * with cosine ≥ threshold.
    *
    * Dense-numeric brute force is the one place mapPartitions earns its
    * keep (SURVEY.md §7.4 preference (d)): one side is broadcast as
    * primitive arrays and each partition runs a compiled dot-product loop —
    * no per-pair row materialization, no shuffle. Block-broadcast pattern:
    * at scale the broadcast side is chunked (outer loop over blocks that
    * fit executor memory); sub-quadratic alternative is `lshTopK`.
    * Accumulation order matches the oracle's sequential list_sum.
    */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    def dotNorm(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val side = ds.collect() // block-broadcast side; chunk at scale
    val norms = side.map { case (_, v) => math.sqrt(dotNorm(v, v)) }
    val bc = spark.sparkContext.broadcast((side, norms))
    ds.mapPartitions { it =>
      val (others, oNorms) = bc.value
      it.flatMap { case (d1, v1) =>
        val n1 = math.sqrt(dotNorm(v1, v1))
        others.iterator.zipWithIndex.collect {
          case ((d2, v2), j) if d1 < d2 &&
            round6(dotNorm(v1, v2) / (n1 * oNorms(j))) >= threshold =>
            (d1, d2, round6(dotNorm(v1, v2) / (n1 * oNorms(j))))
        }
      }
    }.toDF("d1", "d2", "sim")
  }
}
