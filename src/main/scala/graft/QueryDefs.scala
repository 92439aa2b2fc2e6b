package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** One named, driver-checkable query: a Spark implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names and
  * output ordering must match exactly (driver hash-compares at sf0.01).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** Shared helpers for query catalogs. */
object QueryDefs {
  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables.open(s, dir, name)

  /** Total-order sort for a SMALL result of an EXPENSIVE pipeline.
    * A plain orderBy inserts a range-partitioning exchange whose bounds
    * sampling job executes the whole child plan a second time; collapsing
    * to one partition first (shuffle boundary — upstream parallelism is
    * preserved) sorts the few output rows in place with a single
    * execution.
    */
  def sortSmall(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Exact-decimal sum fragment for oracle SQL (mirror of Det.dsum). */
  def sqlDsum(exprSql: String): String =
    s"CAST(SUM(CAST($exprSql AS DECIMAL(30,6))) AS DOUBLE)"

  // Per-PROCESS scratch root: two concurrent harness processes on the same
  // sf dir must never overwrite each other's round-trip files mid-scan
  // (the same race the stream-replay dirs defend against). Deleted on JVM
  // exit; siblings orphaned by SIGKILLed runs are swept on first use.
  private lazy val procRoot: String = {
    TmpDirs.sweepDead(java.nio.file.Paths.get("/tmp/graft_io"), "p")
    val root = s"/tmp/graft_io/p${ProcessHandle.current().pid()}"
    TmpDirs.deleteOnExit(java.nio.file.Paths.get(root))
    root
  }

  /** Per-(process, sf) scratch dir: sf0.01 verify and sf0.1 bench don't
    * collide, and neither do concurrent processes.
    */
  def ioDir(sfDir: String, leaf: String): String =
    s"$procRoot/${new java.io.File(sfDir).getName}/$leaf"
}
