package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation. A heavy-hitter grouping key
  * (a handful of event types across billions of rows) sends all its rows to
  * one reducer; salting fans each key across `salts` partial groups, then a
  * cheap second aggregation over `keys x salts` rows merges them. Result is
  * identical to the direct groupBy; the shuffle is balanced.
  */
object Skew {

  /** count + sum-style aggregation with salting. `aggs` maps output column
    * name -> (partialExpr, mergeExpr-on-partial-col). */
  def saltedCountSum(df: DataFrame, key: Column, keyName: String,
      value: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(crc32(value.cast("string")), lit(salts)))
    salted
      .groupBy(key.as(keyName), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(keyName)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }
}
