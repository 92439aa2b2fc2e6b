package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver → BENCH_r{N}.json; anchor = BASELINE.md §B).
  *
  * Harness fidelity rules:
  *  - a warmup pass over the full query set at sf0.001 absorbs session /
  *    codegen / parquet-reader startup before anything is timed;
  *  - each query is forced through the `noop` sink, which evaluates every
  *    output column (a `count()` would let Catalyst prune the projections
  *    being measured);
  *  - failures are reported as failures (-1 in the per-query map plus an
  *    `errors` list), never as fast successes;
  *  - the cache is cleared between queries so ops that `cache()` internal
  *    stages can't leak memory pressure into later measurements;
  *  - two timed passes (second in REVERSE order so a throttling window's
  *    positional span cannot cover the same query twice), per-query
  *    MINIMUM reported: the host shows minutes-long throttling windows
  *    that hit whatever queries happen to run inside them (14s for a 1s
  *    aggregation, different queries each run); the min of spaced,
  *    order-decorrelated samples is the standard estimator for intrinsic
  *    cost under external interference. Queries whose two samples still
  *    disagree >3x get a third pass;
  *  - the artifact's `spread` map records each query's residual max/min
  *    sample disagreement, so timing quality is auditable per run.
  */
object Bench {

  private[graft] def force(spark: SparkSession, sfDir: String,
                    name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
    val t0 = System.nanoTime()
    val r =
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        // NonFatal only: an OOM or other fatal JVM error must abort the
        // whole bench rather than poison every later measurement
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    spark.catalog.clearCache()
    // between-measurement GC (outside the timed window): a heap full of
    // the PREVIOUS query's garbage (e.g. 1500 JPEG buffers before an
    // aggregation query) otherwise taxes the next measurement with
    // collections it didn't cause — observed inflating a 0.45 s query to
    // 1.05 s only when run inside the full catalog sweep
    System.gc()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_ONLY: comma-separated query names — time just those
    // (iteration aid; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    queries.foreach { case (n, fn) => force(spark, "/root/testdata/sf0.001", n, fn) } // warmup

    val pass1 = queries.map { case (name, fn) => name -> force(spark, sfDir, name, fn) }.toMap
    // pass 2 runs in REVERSE order: a minutes-long host-throttling window
    // covers a positional span of the schedule, so under identical ordering
    // it can hit the SAME queries in both passes and survive min-of-two
    // (BENCH_r06 overstated one query 5x exactly that way). Reversing
    // decorrelates position, so interference lands on different queries
    val pass2 = queries.reverse.map { case (name, fn) => name -> force(spark, sfDir, name, fn) }.toMap
    // tie-breaker third pass for queries whose two samples disagree > 3x —
    // both samples may still be throttled (window straddling both passes);
    // one more spaced sample makes the min robust
    val suspect = queries.filter { case (name, _) =>
      (pass1(name), pass2(name)) match {
        case (Some(x), Some(y)) => math.max(x, y) / math.min(x, y) > 3.0
        case _                  => false
      }
    }
    if (suspect.nonEmpty)
      System.err.println(s"[bench] third pass for ${suspect.size} queries with >3x sample spread: " +
        suspect.map(_._1).mkString(", "))
    val pass3 = suspect.map { case (name, fn) => name -> force(spark, sfDir, name, fn) }.toMap
    val allSamples = queries.map { case (name, _) =>
      name -> Seq(pass1(name), pass2(name), pass3.get(name).flatten).flatten
    }
    val results = allSamples.map { case (name, samples) =>
      name -> (if (samples.isEmpty) None else Some(samples.min))
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(fmt).getOrElse("-1.0") }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // residual per-query sample disagreement (max/min across the spaced
    // passes), so an artifact carries its OWN timing-quality evidence: a
    // query whose committed number came from samples that still disagreed
    // 2x after the third pass is visibly less trustworthy than one whose
    // passes agreed within noise — exactly the forensics a cross-session
    // bench discrepancy needs
    val spread = allSamples
      .filter(_._2.size >= 2)
      .map { case (k, s) => "\"" + k + "\":" + fmt(s.max / s.min) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread":$spread,"errors":$errors,"sf":"$sfDir"}"""
    // stdout gets a SLIMMED twin of the durable artifact: same schema,
    // 3-decimal timings, no spread map. The driver's stdout capture keeps
    // only a bounded tail (round 9 clipped the 7.5 KB full line to a 2.2 KB
    // fragment, leaving parsed:null), so every byte cut raises the chance
    // the captured line parses. The DURABLE files (target/bench_latest.json
    // + repo-root BENCH_full_latest.json) keep full precision and spread —
    // they are the authoritative record.
    val qs3 = results
      .map { case (k, v) => "\"" + k + "\":" + v.map(fmt3).getOrElse("-1.0") }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs3,"errors":$errors,"sf":"$sfDir"}""")
    // self-contained artifact: the driver captures stdout, but a truncated
    // capture loses the tail of the (long) per-query map — persist the full
    // line so the bench is reconstructable from disk. Written BOTH to
    // target/ (stable dev location) and the repo root BENCH_full_latest
    // .json (committed with the round, so the round record carries every
    // per-query timing even when the driver's stdout tail clips)
    // SPARK_GRAFT_BENCH_OUT anchors the artifact when the launcher's CWD
    // is not the repo root; either way the absolute path is logged so
    // the artifact's location is deterministic from the run log
    persist("bench", line, sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get("target", "bench_latest.json"))
      .toAbsolutePath)
    // only a FULL sweep may stamp the committed round artifact — a
    // SPARK_GRAFT_ONLY subset run would silently replace the 100+-query
    // record with its few rows
    if (sys.env.get("SPARK_GRAFT_BENCH_OUT").isEmpty && only.isEmpty)
      persistAtRepoRoot("bench", line, "BENCH_full_latest.json")
    spark.stop()
  }

  /** µs precision is plenty for wall-clock seconds, and the shorter line
    * raises how many per-query entries survive a truncated stdout capture.
    * Non-finite values (degenerate ratios) render as -1.0, never throw.
    */
  private[graft] def fmt(v: Double): String =
    if (!java.lang.Double.isFinite(v)) "-1.0"
    else BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString

  /** ms precision for the stdout twin — wall-clock noise dwarfs it. */
  private[graft] def fmt3(v: Double): String =
    if (!java.lang.Double.isFinite(v)) "-1.0"
    else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  private[graft] def persist(tag: String, line: String,
                             out: java.nio.file.Path): Unit =
    try {
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[$tag] wrote $out")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[$tag] could not write $out: $e")
    }

  /** Repo-root artifacts are only meaningful when the launcher's CWD IS
    * the repo root (the committed-with-the-round contract); from anywhere
    * else the file would land in an unrelated directory and leave the
    * repo copy stale — skip loudly instead.
    */
  private[graft] def persistAtRepoRoot(tag: String, line: String,
                                       name: String): Unit =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get("build.sbt")))
      persist(tag, line, java.nio.file.Paths.get(name).toAbsolutePath)
    else
      System.err.println(s"[$tag] CWD is not the repo root — skipping $name " +
        "(target/ artifact still written)")
}
