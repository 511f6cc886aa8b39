package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.example.{GroupReadSupport, GroupWriteSupport}
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.util.HadoopInputFile

/** MERGE-ON-READ DELETION VECTORS — the storage piece that makes a
  * selective row-level DELETE metadata-cheap instead of whole-chunk
  * copy-on-write.
  *
  * The engine's replace unit is the chunk (the reference's `write_chunk`
  * contract, /root/reference/tokio-fs/src/lib.rs:109-128), which is the
  * right unit for UPDATE/MERGE (changed values can relocate rows across
  * cells) but pathological for trickle deletes: at 100 TB a one-row GDPR
  * erasure in a 1-GB cell would rewrite the gigabyte. A deletion vector is
  * a per-data-file sidecar of deleted ROW POSITIONS (physical ordinals
  * within the parquet file, ascending), referenced from the file's
  * manifest entry ([[GraftVersions.ManifestEntry.dv]] — the fourth,
  * optional manifest field). A DELETE that matches few rows writes one
  * small sidecar per touched file and seals a manifest that swaps each
  * entry's dv reference — ZERO data bytes move. Scans apply the vector as
  * an ordinal skip inside the chunk reader; every read path (live,
  * snapshot, branch, clone, change feed) resolves the dv its manifest
  * entry names, so time travel sees each version's own deleted set.
  *
  * Invariants the rest of the engine leans on:
  *   - data files stay IMMUTABLE — a dv never touches the parquet bytes,
  *     so footer sums/stats/blooms remain valid as CONSERVATIVE metadata
  *     (they may describe deleted rows; anything that must be exact over
  *     live rows — aggregate pushdown — declines when a dv is present);
  *   - dv sidecars are immutable too: a second DELETE on the same file
  *     writes a NEW sidecar holding the union and the commit re-points the
  *     manifest entry, so older manifests keep naming their own vector
  *     (snapshot correctness) and rollback is still pure metadata;
  *   - physical rows are shed by the normal rewrite paths: compaction /
  *     z-order / regrid read through the connector (dv applied) and write
  *     clean files, so their commits drop the dv references naturally;
  *   - expire deletes a dv file when no retained manifest references it;
  *     the orphan sweep covers crashed-commit dv debris.
  *
  * Sidecars live under `root/_graft_dv/` (outside the chunk grid — the
  * underscore prefix keeps them invisible to the data-file walk), named by
  * a fresh UUID per write.
  */
private[graft] object GraftDv {
  val DvDir = "_graft_dv"
  /** 8-byte magic + int64 count + count * int64 big-endian positions. */
  private val Magic = "GDV1\n".getBytes("UTF-8")

  def dirOf(root: Path): Path = new Path(root, DvDir)

  /** Absolute path of a dv given the DATA file's absolute path and its
    * manifest entry: the resolution root is whatever the planner resolved
    * the data rel against (the table's own root, or a clone SOURCE's), so
    * it is recovered by stripping the rel suffix — no second root plumb. */
  def absOf(fileAbs: String, e: GraftVersions.ManifestEntry): Option[String] =
    e.dv.map { case (dvRel, _) =>
      val base = fileAbs.stripSuffix(e.rel)
      require(base.length != fileAbs.length,
        s"graft dv: ${e.rel} is not a suffix of $fileAbs")
      base + dvRel
    }

  /** Write a NEW dv sidecar holding `positions` (sorted ascending,
    * distinct — the caller's contract). Returns (chunk-relative path,
    * cardinality) for the manifest entry. */
  def write(fs: FileSystem, root: Path, positions: Array[Long]): (String, Long) = {
    require(positions.nonEmpty, "graft dv: refusing to write an empty vector")
    var i = 1
    while (i < positions.length) {
      require(positions(i) > positions(i - 1),
        "graft dv: positions must be sorted ascending and distinct")
      i += 1
    }
    val rel = s"$DvDir/${java.util.UUID.randomUUID()}.dv"
    val p = new Path(root, rel)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, false)
    try {
      val buf = java.nio.ByteBuffer.allocate(
        Magic.length + 8 + positions.length * 8)
      buf.put(Magic)
      buf.putLong(positions.length.toLong)
      positions.foreach(buf.putLong)
      out.write(buf.array())
    } finally out.close()
    (rel, positions.length.toLong)
  }

  /** Read a dv sidecar's positions (sorted ascending, as written). */
  def read(fs: FileSystem, dvAbs: Path): Array[Long] = {
    val in = fs.open(dvAbs)
    val bytes = try in.readAllBytes() finally in.close()
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](Magic.length)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"graft dv: $dvAbs is not a graft deletion vector")
    val n = buf.getLong
    require(bytes.length == Magic.length + 8 + n * 8,
      s"graft dv: $dvAbs is truncated (declares $n positions)")
    Array.fill(n.toInt)(buf.getLong)
  }

  /** Union of two sorted-distinct position arrays, sorted distinct. */
  def union(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted

  /** dv rels referenced by a set of manifest entries. */
  def relsOf(entries: Seq[GraftVersions.ManifestEntry]): Set[String] =
    entries.flatMap(_.dv.map(_._1)).toSet

  /** MATERIALIZE one dv'd file: copy its live rows (group-level parquet
    * copy, schema preserved verbatim) to a fresh file in the same cell and
    * return the clean entry. Used by the World-rewrite barrier — a
    * physical-tree rewrite must not resurrect deleted rows — and kept
    * deliberately dumb: maintenance rewrites (compact/z-order/regrid) shed
    * dvs through the connector instead. */
  def materializeFile(fs: FileSystem, root: Path,
      e: GraftVersions.ManifestEntry): GraftVersions.ManifestEntry = {
    val (dvRel, _) = e.dv.getOrElse(return e)
    val positions = read(fs, new Path(root, dvRel))
    val src = new Path(root, e.rel)
    val dst = new Path(src.getParent,
      s"part-dvm-${java.util.UUID.randomUUID()}.parquet")
    val conf = new Configuration()
    val pfr = ParquetFileReader.open(HadoopInputFile.fromPath(src, conf))
    val schema = try pfr.getFooter.getFileMetaData.getSchema finally pfr.close()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = new GraftParquetWriterBuilder(dst, new GroupWriteSupport())
      .withConf(conf).build()
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), src).withConf(conf).build()
    try {
      var ordinal = 0L
      var di = 0
      var g = reader.read()
      while (g != null) {
        if (di < positions.length && positions(di) == ordinal) di += 1
        else writer.write(g)
        ordinal += 1
        g = reader.read()
      }
    } finally { reader.close(); writer.close() }
    GraftVersions.ManifestEntry(
      GraftVersions.relOf(root, dst), fs.getFileStatus(dst).getLen)
  }
}
