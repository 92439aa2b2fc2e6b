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
  *  - two timed passes, per-query MINIMUM reported: the host shows
  *    minutes-long throttling windows that hit whatever queries happen to
  *    run inside them (14s for a 1s aggregation, different queries each
  *    run); the min of two spaced samples is the standard estimator for
  *    intrinsic cost under that kind of external interference.
  */
object Bench {

  private def force(spark: SparkSession, sfDir: String,
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

    val pass1 = queries.map { case (name, fn) => name -> force(spark, sfDir, name, fn) }
    val pass2 = queries.map { case (name, fn) => name -> force(spark, sfDir, name, fn) }
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) =>
      val best = (a, b) match {
        case (Some(x), Some(y)) => Some(math.min(x, y))
        case _                  => a.orElse(b)
      }
      name -> best
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    // self-contained artifact: the driver captures stdout, but a truncated
    // capture loses the tail of the (long) per-query map — persist the full
    // line so the bench is reconstructable from disk
    try {
      val out = java.nio.file.Paths.get("target", "bench_latest.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write target/bench_latest.json: $e")
    }
    spark.stop()
  }
}
