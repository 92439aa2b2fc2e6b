package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A FileIndex that exposes only the files in `keep` (canonical
  * `new Path(s).toString` form — `FileIndex.inputFiles` and
  * `listFiles(...).getPath` render URIs differently, e.g. `file:///x` vs
  * `file:/x`), delegating listing (and therefore partition-value handling
  * and filter pruning) to the underlying index. Used to re-root a view's
  * scan onto a slice of its files: the sliced plan LISTS only those
  * files, so scan I/O — not just downstream work — is bounded by the
  * slice.
  */
final class SlicedFileIndex(underlying: FileIndex, keep: Set[String]) extends FileIndex {
  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath.toString))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s => keep(new Path(s).toString))

  override def refresh(): Unit = underlying.refresh()

  override lazy val sizeInBytes: Long =
    underlying.listFiles(Nil, Nil).iterator
      .flatMap(_.files).filter(f => keep(f.getPath.toString)).map(_.getLen).sum

  override def partitionSchema: StructType = underlying.partitionSchema
}

/** Per-file batch enumeration for progressive partials (View.progressive):
  * the view's LARGEST file-backed scan is split into `batches` disjoint
  * file slices; every other scan in the plan (broadcast dimensions etc.)
  * is read in full by each slice, which keeps join/aggregate partials
  * sound — each fact row contributes to exactly one slice.
  */
object FileSlices {

  /** The file-backed scans under a view's analyzed plan. */
  def fileScans(df: DataFrame): Seq[LogicalRelation] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => lr
    }

  /** `batches` DataFrames over the same plan as `df`, with the largest
    * file-backed scan re-rooted onto disjoint ~1/batches file slices
    * (deterministic: sorted file list, round-robin). Slices may be empty
    * when the source has fewer files than `batches`.
    */
  def slices(df: DataFrame, batches: Int): Seq[DataFrame] = {
    require(batches > 0)
    val scans = fileScans(df)
    require(scans.nonEmpty,
      "progressive requires a file-backed view (no file scan in the plan)")
    val target = scans.maxBy(_.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes)
    val hfs = target.relation.asInstanceOf[HadoopFsRelation]
    val files = hfs.location.inputFiles.toSeq.map(s => new Path(s).toString).sorted
    val analyzed = df.queryExecution.analyzed
    (0 until batches).map { b =>
      val keep = files.zipWithIndex.collect { case (f, i) if i % batches == b => f }.toSet
      val sliced = analyzed.transform {
        case lr: LogicalRelation if lr eq target =>
          lr.copy(relation =
            hfs.copy(location = new SlicedFileIndex(hfs.location, keep))(hfs.sparkSession))
      }
      org.apache.spark.sql.graftshim.Internals.ofRows(df.sparkSession, sliced)
    }
  }
}
