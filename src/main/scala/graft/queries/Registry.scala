package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two (the driver's
  * compare sorts columns by name before hashing).
  *
  * Determinism conventions used across all queries:
  *   - every query ends with an ORDER BY on a unique key (row order stable);
  *   - float aggregations go through DECIMAL(18,2) casts on both sides
  *     (exact, order-independent) — raw double pass-through is fine (same
  *     bits), double *summation* is not;
  *   - timestamps are emitted as epoch microseconds (BIGINT) or DATE.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Tables {
  /** Inferred schema per source-table path, memoized for the JVM (r17,
    * guide §1/§6): the fixture parquet under the SF dir is immutable for a
    * run's lifetime, yet every `spark.read.parquet` call re-infers its
    * schema — one footer-read Spark job plus planning latency PER LOAD,
    * ~0.1 s × hundreds of loads across the declared suite, all to
    * rediscover the same bytes. The memo holds only the SCHEMA (metadata,
    * never rows — every query still scans the parquet itself), and the key
    * carries the file set's (name, length, mtime) stamp so a regenerated
    * table at the same path misses and re-infers. */
  private val schemaMemoMax = 128
  private val schemaMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        (String, Seq[(String, Long, Long)]), org.apache.spark.sql.types.StructType](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          (String, Seq[(String, Long, Long)]),
          org.apache.spark.sql.types.StructType]): Boolean =
        size() > schemaMemoMax
    })

  /** Full (name, length, mtime) tuple per file — not its hashCode, which can
    * collide silently. An unreadable/remote path lists as empty and so keys
    * on (path, Nil): harmless here (fixture paths are local files), and a
    * regenerated table still re-stamps because length/mtime change. */
  private def sourceStamp(path: String): Seq[(String, Long, Long)] = {
    val f = new java.io.File(path)
    val parts =
      if (f.isDirectory) Option(f.listFiles).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
      else Seq(f)
    parts.map(x => (x.getName, x.length, x.lastModified))
  }

  /** Table loader. The driver's `events.ts` is parquet TIMESTAMP(NANOS),
    * which Spark's reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts the
    * raw nanos to a microsecond timestamp (truncating, exactly like DuckDB's
    * ns->us read), so every query sees an ordinary TimestampType `ts`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = (path, sourceStamp(path))
    val schema = Option(schemaMemo.get(key)).getOrElse {
      val s = spark.read.parquet(path).schema
      schemaMemo.put(key, s)
      s
    }
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    else df
  }
}

object Registry {
  lazy val all: Map[String, QueryDef] =
    DmdsQueries.defs ++ Relational.defs ++ TextOps.defs ++ PipelineOps.defs ++
      DedupOps.defs ++ SimilarityOps.defs ++ EventOps.defs ++ Extended.defs ++
      SqlSurface.defs ++ GraphOps.defs ++ CrawlOps.defs
}
