package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Streaming read side of the graft connector: the world's chunk grid as a
  * micro-batch source, with the SAME bucket-predicate directory pruning the
  * batch scan does — chunks excluded by pushed `c_i` filters are never even
  * listed into an offset. The batch analog of `World.stream` (which goes
  * through Spark's generic file stream source and cannot prune by bucket).
  *
  * Offset = the set of chunk-file paths already processed (sorted, JSON
  * array). Each `latestOffset` lists the (pruned) grid; the next batch is
  * the set difference. Scale note: the offset grows with the chunk-file
  * count of the pruned selection — fine for the bounded grids the reference
  * targets (its worlds are fixed chunk grids); a production unbounded log
  * would move the seen-set into a compacted checkpoint file the way Spark's
  * own FileStreamSource does. Compaction REPLACES files; this source assumes
  * appends between batches (run [[graft.world.World.compact]] with the
  * stream stopped, as the reference's maintenance ops do under its write
  * lock).
  */
class GraftMicroBatchStream(path: String, required: StructType,
    pushed: Array[Filter]) extends MicroBatchStream {

  private def listFiles(): Seq[(String, Map[String, Long])] = {
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    // shared pruned+parallel grid walk (see GraftDataSource.walkChunks):
    // pushed bucket filters drop subtrees before the stream ever lists them,
    // so per-micro-batch discovery cost tracks the pruned grid, not the world
    GraftDataSource.walkChunks(fs, root, pushed)
      .flatMap { case (dir, b) =>
        GraftDataSource.chunkFiles(fs, dir).map(p => (p.toString, b))
      }
  }

  override def initialOffset(): Offset = GraftStreamOffset(Seq.empty)

  override def latestOffset(): Offset =
    GraftStreamOffset(listFiles().map(_._1).sorted)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GraftStreamOffset].files.toSet
    val target = end.asInstanceOf[GraftStreamOffset].files.toSet
    val hasDataCols = required.exists(f => !GraftDataSource.isBucket(f.name))
    // bucket values are recoverable from the path itself (c<i>=<v> segments)
    listFiles()
      .filter { case (f, _) => target.contains(f) && !seen.contains(f) }
      .map { case (f, b) => GraftInputPartition(f, b, !hasDataCols): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(GraftStreamOffset.parse(json))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Sorted chunk-file set, serialized as a JSON string array. */
final case class GraftStreamOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

object GraftStreamOffset {
  /** Minimal JSON string-array parser (inverse of [[GraftStreamOffset.json]];
    * handles the two escapes that serializer emits). */
  def parse(json: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inStr = false
    var esc = false
    json.foreach { c =>
      if (!inStr) { if (c == '"') inStr = true }
      else if (esc) { sb.append(c); esc = false }
      else c match {
        case '\\' => esc = true
        case '"'  => out += sb.result(); sb.clear(); inStr = false
        case ch   => sb.append(ch)
      }
    }
    out.toSeq
  }
}
