package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.QueryDefs._
import graft.operators.{Det, Layout}

/** Source-matrix coverage (SURVEY.md §2.2): export a fixture table through
  * each non-parquet format, reload it with the generic loaders, and
  * aggregate — the oracle runs the same aggregate on the ORIGINAL parquet,
  * so a hash match proves the write→read round trip is lossless (schema
  * inference included for CSV).
  *
  * Reference analogs: `ref:P/storage/CsvFileLoader.java` /
  * `CsvFileWriter.java` (header + kind inference), `JsonFileLoader.java`,
  * `OrcFileLoader.java`.
  *
  * Aggregates use order-independent decimal sums (Det.dsum), so the
  * result is invariant to output-file partitioning.
  */
object SourceQueries {

  // scratch dirs come from QueryDefs.ioDir (shared with the IVF index build)

  val all: Seq[Q] = Seq(

    // ---- CSV: header + schema inference round trip -------------------------
    Q("source_csv_roundtrip",
      s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "lineitem_csv")
        val src = t(s, d, "lineitem").select("l_returnflag", "l_quantity")
        Tables.exportCsv(src, out)
        // explicit schema on the re-read: inference costs a SECOND full
        // scan of the CSV (guide §6); the writer knows the schema, and
        // inference parity (string + double → the same StructType) is
        // pinned in PlanAndSourceSpec so the certification survives
        Tables.csvWithSchema(s, out, src.schema)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"), Det.dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first)
    },

    // ---- JSON round trip ---------------------------------------------------
    Q("source_json_roundtrip",
      s"""SELECT o_orderstatus, COUNT(*) AS cnt, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "orders_json")
        val src = t(s, d, "orders").select("o_orderstatus", "o_totalprice")
        src.write.mode("overwrite").json(out)
        // explicit schema: bare read.json runs a full inference pass over
        // the files before the real scan (§6); parity pinned in
        // PlanAndSourceSpec
        Tables.jsonWithSchema(s, out, src.schema)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"), Det.dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first)
    },

    // ---- Hive-partitioned parquet: write + partition-PRUNED read -----------
    // lineitem is re-laid-out partitioned by l_returnflag; the filtered
    // re-read prunes to the one matching directory at planning time (the
    // PartitionFilters plan shape is asserted in PlanAndSourceSpec), and
    // the oracle aggregates the original table — a hash match proves the
    // partitioned round trip loses nothing.
    Q("source_partitioned_pruning",
      s"""SELECT COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "lineitem_part")
        Tables.writePartitioned(
          t(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity")),
          out, "l_returnflag")
        Tables.parquet(s, out)
          .filter(col("l_returnflag") === "R")
          .agg(count(lit(1)).as("cnt"), Det.dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- z-order clustered layout: write -> 2-D box scan -------------------
    // The layout changes WHICH FILES a 2-D range filter touches (the
    // skipping contract is pinned in LayoutSpec); it must not change the
    // ANSWER — the oracle runs the same box on the original table.
    Q("layout_zorder_scan",
      s"""SELECT COUNT(*) AS cnt, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_partkey BETWEEN 50 AND 120 AND l_suppkey BETWEEN 5 AND 40""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "lineitem_zorder")
        Layout.writeZOrdered(
          t(s, d, "lineitem").select("l_partkey", "l_suppkey", "l_quantity"),
          "l_partkey", "l_suppkey", out, numFiles = 16)
        Tables.parquet(s, out)
          .filter(col("l_partkey").between(50, 120) && col("l_suppkey").between(5, 40))
          .agg(count(lit(1)).as("cnt"), Det.dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- small-file compaction: fragment -> compact -> scan ----------------
    // The corpus is deliberately shattered into 64 tiny files (the
    // streaming-ingest accretion shape), compacted map-only into
    // ~1 MiB-target files, and the COMPACTED copy is aggregated — the
    // oracle runs the same aggregate on the original table, so a hash
    // match proves compaction moved file boundaries and nothing else.
    // The file-count and no-shuffle contracts are pinned in LayoutSpec.
    Q("layout_compact_roundtrip",
      """SELECT COUNT(*) AS n_docs,
        |CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
        |COUNT(DISTINCT source) AS n_sources
        |FROM documents""".stripMargin) {
      (s, d) =>
        val frag = ioDir(d, "documents_frag")
        val out = ioDir(d, "documents_compact")
        t(s, d, "documents").repartition(64).write.mode("overwrite").parquet(frag)
        Layout.compact(s, frag, out, targetBytes = 1L << 20)
        Tables.parquet(s, out)
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_tokens"),
            countDistinct(col("source")).as("n_sources"))
    },

    // ---- text lines (log-file shape): write -> line scan round trip --------
    // The corpus is written as plain text (one doc per line — the fixture
    // has no embedded newlines) and re-ingested with the line source; the
    // oracle aggregates the ORIGINAL table, so a hash match proves the
    // line round trip is lossless including tokenization.
    Q("source_text_roundtrip",
      """SELECT COUNT(*) AS n_lines,
        |CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "documents_text")
        t(s, d, "documents").select(col("text")).write.mode("overwrite").text(out)
        Tables.textLines(s, out)
          .agg(count(lit(1)).as("n_lines"),
            sum(size(split(trim(col("value")), "\\s+"))).cast("long").as("n_tokens"))
    },

    // ---- binaryFile: real file-per-asset multimodal ingestion --------------
    // One REAL .png file per selected doc is written by a distributed job,
    // then re-ingested through Spark's binaryFile source and decoded with
    // the real codec; the oracle predicts the decoded features in closed
    // form from the doc_id parsed out of each file NAME — certifying
    // listing, scan, and decode end to end.
    Q("source_binaryfile_decode",
      """SELECT doc_id,
        |CAST(8 + doc_id % 9 AS INTEGER) AS width,
        |CAST(8 + (doc_id * 3) % 9 AS INTEGER) AS height,
        |CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
        |CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
        |FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "png_files")
        val dirPath = java.nio.file.Paths.get(out)
        java.nio.file.Files.createDirectories(dirPath)
        // clear stale files: a leftover .png from an older run would
        // pollute the glob scan with rows the oracle doesn't predict
        val listing = java.nio.file.Files.list(dirPath)
        try listing.forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally listing.close()
        val pngs = graft.operators.Multimodal.synthesizePng(
          t(s, d, "documents").select(col("doc_id")).filter(col("doc_id") % 5 === 0),
          "doc_id")
        // fixture synthesis: write <doc_id>.png per row, task-parallel
        pngs.select(col("doc_id"), col("png")).foreachPartition {
          rows: Iterator[org.apache.spark.sql.Row] =>
            rows.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(out, s"${r.getLong(0)}.png"),
                r.getAs[Array[Byte]](1))
            }
        }
        val files = Tables.binaryFiles(s, s"$out/*.png")
          .select(
            regexp_extract(col("path"), "([0-9]+)\\.png$", 1).cast("long").as("doc_id"),
            col("content"))
        // sortSmall: a plain orderBy's range-sampling job would re-list
        // and re-decode every file a second time
        sortSmall(
          graft.operators.Multimodal.decodeFeatures(files, "doc_id", col("content")),
          col("doc_id"))
    },

    // ---- binaryFile audio: file-per-asset WAV ingestion --------------------
    // Same certification shape as source_binaryfile_decode, for the audio
    // family: one REAL .wav file per selected doc is written by a
    // distributed job, re-ingested through the binaryFile source, and
    // decoded with the real javax.sound codec; the oracle predicts every
    // decoded field in closed form from the doc_id in the file NAME.
    Q("source_binaryfile_audio",
      """SELECT doc_id,
        |CAST((400 + (doc_id % 50) * 2) / 8.0 AS DOUBLE) AS duration_ms,
        |CAST(8000 AS INTEGER) AS sample_rate,
        |CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |(a + b) / 2.0 AS mean_amp,
        |sqrt((a * a + b * b) / 2.0) AS rms
        |FROM (SELECT doc_id,
        |        CAST((doc_id * 37) % 20000 - 10000 AS DOUBLE) AS a,
        |        CAST((doc_id * 53) % 20000 - 10000 AS DOUBLE) AS b
        |      FROM documents WHERE doc_id % 7 = 0)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "wav_files")
        val dirPath = java.nio.file.Paths.get(out)
        java.nio.file.Files.createDirectories(dirPath)
        val listing = java.nio.file.Files.list(dirPath)
        try listing.forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally listing.close()
        val wavs = graft.operators.Multimodal.synthesizeWav(
          t(s, d, "documents").select(col("doc_id")).filter(col("doc_id") % 7 === 0),
          "doc_id")
        wavs.select(col("doc_id"), col("wav")).foreachPartition {
          rows: Iterator[org.apache.spark.sql.Row] =>
            rows.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(out, s"${r.getLong(0)}.wav"),
                r.getAs[Array[Byte]](1))
            }
        }
        val files = Tables.binaryFiles(s, s"$out/*.wav")
          .select(
            regexp_extract(col("path"), "([0-9]+)\\.wav$", 1).cast("long").as("doc_id"),
            col("content"))
        // sortSmall: a plain orderBy's range-sampling job would re-list
        // and re-decode every file a second time
        sortSmall(
          graft.operators.Multimodal.audioFeatures(files, "doc_id", col("content")),
          col("doc_id"))
    },

    // ---- ORC round trip ----------------------------------------------------
    Q("source_orc_roundtrip",
      s"""SELECT p_brand, COUNT(*) AS cnt, ${sqlDsum("p_retailprice")} AS sum_price
         |FROM part GROUP BY 1 ORDER BY p_brand ASC NULLS FIRST""".stripMargin) {
      (s, d) =>
        val out = ioDir(d, "part_orc")
        t(s, d, "part").select("p_brand", "p_retailprice")
          .write.mode("overwrite").orc(out)
        Tables.orc(s, out)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("cnt"), Det.dsum(col("p_retailprice")).as("sum_price"))
          .orderBy(col("p_brand").asc_nulls_first)
    }
  )
}
