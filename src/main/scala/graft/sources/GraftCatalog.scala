package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Worlds as CATALOG TABLES — the SQL front door to the chunk grid. The
  * reference exposes its worlds only through a programmatic handle
  * (/root/reference/src/lib.rs:30-44); Spark's `TableCatalog` contract lets
  * the same storage serve plain SQL:
  *
  * {{{
  *   spark.sql.catalog.graftcat           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graftcat.warehouse = /data/worlds
  *
  *   CREATE TABLE graftcat.events (event_id BIGINT, v DOUBLE, c0 BIGINT)
  *   INSERT INTO graftcat.events SELECT ...         -- routed append
  *   INSERT OVERWRITE graftcat.events SELECT ...    -- truncate-replace, or
  *                                                  -- per-chunk replace under
  *                                                  -- partitionOverwriteMode=dynamic
  *   SELECT * FROM graftcat.events WHERE c0 = 3     -- directory-pruned scan
  * }}}
  *
  * A table named `ns1.ns2.t` lives at `<warehouse>/ns1/ns2/t`; a table IS a
  * world directory (the `_graft_schema.json` sidecar marks existence, like
  * the reference's `NotFound -> empty` contract makes the directory itself
  * the source of truth). All read/write planning is the connector's —
  * pruning, pushdowns, storage-partitioned joins, staged overwrites work
  * identically through the catalog and the path API.
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def fs(): FileSystem =
    FileSystem.get(new java.net.URI(warehouse), new Configuration())

  private def exists(ident: Identifier): Boolean =
    fs().exists(new Path(s"${pathOf(ident)}/_graft_schema.json"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs()
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory &&
        f.exists(new Path(s.getPath, "_graft_schema.json")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!exists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident)
    val p = pathOf(ident)
    new GraftTable(p, GraftDataSource.sidecarSchema(p))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables derive their layout from bucket columns (c0..cN) in the " +
        "schema; PARTITIONED BY is not accepted")
    if (exists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val p = pathOf(ident)
    fs().mkdirs(new Path(p))
    GraftDataSource.writeSidecarIfAbsent(p, schema)
    new GraftTable(p, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported (recreate or regrid)")

  override def dropTable(ident: Identifier): Boolean =
    exists(ident) && fs().delete(new Path(pathOf(ident)), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!exists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent)
    if (exists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(newIdent)
    val f = fs()
    f.mkdirs(new Path(pathOf(newIdent)).getParent)
    if (!f.rename(new Path(pathOf(oldIdent)), new Path(pathOf(newIdent))))
      throw new IllegalStateException(
        s"rename $oldIdent -> $newIdent failed")
  }
}
