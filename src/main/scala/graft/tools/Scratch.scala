package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev scratch main for plan inspection (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.open(spark, "/root/testdata/sf0.1", "embeddings")
    val q = Similarity.cosineDupPairs(emb, "vec_id", "embedding", 0.45)
    q.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + q.count())
    println("sec=" + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
