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
  /** Table loader. The driver's `events.ts` is parquet TIMESTAMP(NANOS),
    * which Spark's reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts the
    * raw nanos to a microsecond timestamp (truncating, exactly like DuckDB's
    * ns->us read), so every query sees an ordinary TimestampType `ts`. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
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
