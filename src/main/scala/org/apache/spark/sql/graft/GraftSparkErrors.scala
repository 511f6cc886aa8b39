package org.apache.spark.sql.graft

import org.apache.spark.sql.errors.QueryExecutionErrors
import org.apache.spark.sql.types.Decimal

/** Access bridge to Spark's `private[sql]` error factories, so graft's
  * custom operators raise the SAME error-classed exceptions
  * (ARITHMETIC_OVERFLOW, NUMERIC_VALUE_OUT_OF_RANGE) as the vanilla
  * operators they replace — a bare ArithmeticException from
  * [[graft.plans.ScalableWindowExec]] would be a user-visible divergence
  * in ANSI mode. Living under `org.apache.spark.sql` is what grants the
  * access; this is the established extension-library pattern (Delta,
  * Iceberg ship the same kind of shim) and the ONLY file in this repo
  * outside the `graft` namespace. No Spark behavior is modified.
  */
object GraftSparkErrors {

  /** Vanilla Sum's ANSI long-overflow error: error class
    * ARITHMETIC_OVERFLOW with the try-function suggestion. */
  def arithmeticOverflow(message: String,
      suggestedFunc: String): ArithmeticException =
    QueryExecutionErrors.arithmeticOverflowError(
      message, suggestedFunc = suggestedFunc)

  /** Vanilla CheckOverflow's ANSI decimal-precision error: error class
    * NUMERIC_VALUE_OUT_OF_RANGE.WITH_SUGGESTION. */
  def decimalPrecisionOverflow(value: Decimal, precision: Int,
      scale: Int): ArithmeticException =
    QueryExecutionErrors.cannotChangeDecimalPrecisionError(
      value, precision, scale)
}
