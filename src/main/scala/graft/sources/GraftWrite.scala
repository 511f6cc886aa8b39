package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Write side of the graft DataSource V2 connector — the
  * `FsHandle::write_chunk` analog (/root/reference/tokio-fs/src/lib.rs:
  * 109-128) through the same pluggable-source interface the read path uses:
  * each incoming row is routed to its chunk directory (`c0=<v>/c1=<v>/…`)
  * by its bucket columns, one parquet file per (task, chunk) via the
  * parquet-hadoop Group API. `abort()` deletes the task's files; like
  * Spark's own file sink, a crash between task commits can leave partial
  * files (a table format with an atomic commit log is the production
  * answer — out of scope for the chunk-grid layout the reference defines).
  */
class GraftWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftBatchWrite(path, info.schema())
  }
}

class GraftBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(path, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = FileSystem.get(new java.net.URI(path), new Configuration())
    messages.foreach {
      case GraftCommitMessage(files) =>
        files.foreach(f => fs.delete(new Path(f), false))
      case _ =>
    }
  }
}

final case class GraftCommitMessage(files: Seq[String]) extends WriterCommitMessage

class GraftWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(path, schema, partitionId, taskId)
}

/** Routes rows to per-chunk parquet writers, opened lazily per bucket tuple
  * encountered in this task's partition. */
class GraftDataWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val conf = new Configuration()
  private val bucketIdx: Array[Int] = schema.fields.zipWithIndex
    .collect { case (f, i) if GraftDataSource.isBucket(f.name) => i }
  private val dataIdx: Array[Int] = schema.fields.zipWithIndex
    .collect { case (f, i) if !GraftDataSource.isBucket(f.name) => i }
  require(bucketIdx.nonEmpty, "graft write requires bucket columns c0..cN in the schema")

  private val messageType: MessageType = {
    val b = Types.buildMessage()
    dataIdx.foreach { i =>
      val f = schema.fields(i)
      val t: Type = f.dataType match {
        case LongType    => Types.optional(PrimitiveType.PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => Types.optional(PrimitiveType.PrimitiveTypeName.INT32).named(f.name)
        case DoubleType  => Types.optional(PrimitiveType.PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType   => Types.optional(PrimitiveType.PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => Types.optional(PrimitiveType.PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType  => Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case other => throw new UnsupportedOperationException(
          s"graft write: unsupported type $other for column ${f.name}")
      }
      b.addField(t)
    }
    b.named("graft_chunk")
  }

  private val writers =
    scala.collection.mutable.Map.empty[Seq[Long], (ParquetWriter[org.apache.parquet.example.data.Group], String)]
  private var counter = 0

  private def writerFor(bucket: Seq[Long]): ParquetWriter[org.apache.parquet.example.data.Group] =
    writers.getOrElseUpdate(bucket, {
      val dir = bucketIdx.indices.map(i => s"c$i=${bucket(i)}").mkString("/")
      val file = s"$path/$dir/part-$partitionId-$taskId-$counter.parquet"
      counter += 1
      val c = new Configuration(conf)
      GroupWriteSupport.setSchema(messageType, c)
      val w = ExampleParquetWriter.builder(new Path(file)).withConf(c)
        .withType(messageType).build()
      (w, file)
    })._1

  override def write(row: InternalRow): Unit = {
    val bucket: Seq[Long] = bucketIdx.toSeq.map { i =>
      schema.fields(i).dataType match {
        case IntegerType => row.getInt(i).toLong
        case _           => row.getLong(i)
      }
    }
    val g = new SimpleGroup(messageType)
    var gi = 0
    dataIdx.foreach { i =>
      if (!row.isNullAt(i)) {
        schema.fields(i).dataType match {
          case LongType    => g.add(gi, row.getLong(i))
          case IntegerType => g.add(gi, row.getInt(i))
          case DoubleType  => g.add(gi, row.getDouble(i))
          case FloatType   => g.add(gi, row.getFloat(i))
          case BooleanType => g.add(gi, row.getBoolean(i))
          case StringType  => g.add(gi, row.getUTF8String(i).toString)
          case _           => ()
        }
      }
      gi += 1
    }
    writerFor(bucket).write(g)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    GraftCommitMessage(writers.values.map(_._2).toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, f) =>
      try w.close() catch { case _: Throwable => () }
      FileSystem.get(new java.net.URI(path), new Configuration())
        .delete(new Path(f), false)
    }
  }

  override def close(): Unit = ()
}
