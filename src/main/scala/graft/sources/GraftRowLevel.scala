package graft.sources

import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation,
  RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Row-level SQL over the chunk grid — `UPDATE`, `MERGE INTO`, and row-exact
  * `DELETE` — as a DSv2 group-based (copy-on-write) operation. The replace
  * unit is the chunk, exactly the reference's whole-chunk `write_chunk`
  * contract (/root/reference/tokio-fs/src/lib.rs:109-128): Spark's rewrite
  * reads every row of the candidate chunks (its union plan re-emits
  * modified + untouched rows), and this operation's write replaces exactly
  * the chunk dirs its scans planned, merging any rows routed to OTHER cells
  * (bucket-column updates, MERGE inserts) into their cells additively.
  *
  * Scale shape: candidate chunks are bucket-pruned by the command's
  * condition through the ordinary pushdown path, and Spark's runtime group
  * filtering ([[GraftScan]] implements `SupportsRuntimeFiltering`) narrows
  * them to chunks that actually contain matching rows — an UPDATE of one
  * user's rows in a petabyte world rewrites one cell, not the grid. The
  * write itself rides the clustered distribution + staged-commit machinery
  * every other graft write uses.
  *
  * Group-recording protocol: each scan instance owns a FILE set that its
  * `planInputPartitions` CLEARS and refills (Spark plans before AND after
  * runtime filters; a stale superset would retire rows the rewrite never
  * read). The commit unions the sets of every scan the rewrite created
  * (the update/copy branches may each plan their own scan) and retires
  * exactly those rels from the sealed manifest — the superseded bytes
  * stay in place for snapshot reads (manifest-only liveness).
  */
class GraftRowLevelBuilder(path: String, schema: StructType,
    info: RowLevelOperationInfo,
    branch: Option[String] = None) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(path, schema, info.command, branch)
}

/** `branch`: a WAP rewrite (`graft.wap.branch`) — candidate groups plan
  * from the BRANCH head (not main's live state) and the commit retires
  * them from the branch's own manifest chain, so an UPDATE/MERGE/DELETE
  * stages invisibly exactly like a branch append and publishes atomically
  * at fast_forward. */
class GraftRowLevelOperation(path: String, schema: StructType, cmd: Command,
    branch: Option[String] = None)
    extends RowLevelOperation {
  private val scanDirSets =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.util.Set[String]]())

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val files = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    scanDirSets.add(files)
    new GraftScanBuilder(path, schema, rowLevelFiles = Some(files),
      pin = branch.map(GraftBranchPin(_)))
  }

  /** `_cell` must ride the rewrite: Spark's `ReplaceDataExec` routes rows
    * through the write-side row projection ONLY for operations that demand
    * metadata attributes — without one, the raw rewrite rows (leading
    * `__row_operation` column included) would reach the writer and scramble
    * the row layout. The cell value itself is free (a per-partition
    * directory constant). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(GraftDataSource.CellColumn))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    new WriteBuilder {
      override def build(): Write =
        // row-level DML only exists through the catalog SQL surface, so
        // the zvalue ordering is always resolvable here (viaCatalog)
        GraftWriteLayout.withLayout(path, info.schema(),
          new GraftReplaceGroupsWrite(path, info.schema(), () => {
            val all = new java.util.HashSet[String]()
            scanDirSets.forEach(s => all.addAll(s))
            all
          }, branch), viaCatalog = true)
    }
  }

  override def description(): String = s"graft row-level $cmd"
}
