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

  /** count + sum aggregation of `value` grouped by `key`, salted across
    * `salts` partial groups. The salt is a per-row uniform source —
    * independent of the data's value distribution, so a heavy-hitter key
    * whose rows share one value (or are NULL) still fans out evenly; a salt
    * derived from the value column would collapse in exactly those cases. */
  def saltedCountSum(df: DataFrame, key: Column, keyName: String,
      value: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    salted
      .groupBy(key.as(keyName), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(keyName)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }
}
