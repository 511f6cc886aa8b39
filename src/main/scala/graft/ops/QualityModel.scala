package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED quality filtering — the fastText/DCLM-style classifier gate of
  * an LLM data pipeline, re-expressed Spark-first in two phases with very
  * different scale shapes:
  *
  *   - TRAIN on the (small) labeled subset with MLlib's distributed
  *     logistic regression (LBFGS over partition-parallel gradient
  *     aggregation — the standard Spark training path; deterministic on
  *     deterministic input: no sampling anywhere);
  *   - SCORE the (huge) corpus DECLARATIVELY: the fitted model is a
  *     handful of doubles, so the coefficients come back to the driver
  *     once and the scoring plan is plain Column arithmetic — a dot
  *     product and a sigmoid, fully codegen'd, pushed-down-friendly, no
  *     model object, no UDF, and no MLlib class anywhere near the 100 TB
  *     scan (MLlib's own `transform` would wrap the model in a ScalaUDF,
  *     which the registry's static scale gate bans from hot paths).
  *
  * The labeled subset is the expensive artifact in practice (human or
  * LLM-judge labels); the corpus-side cost here is exactly one extra
  * projected expression per row.
  */
object QualityModel {

  /** A fitted binary logistic model: intercept + one weight per feature
    * column, in the caller's column order. */
  final case class Fitted(intercept: Double, weights: Seq[(String, Double)])

  /** Fit logistic regression on `labeled` (featureCols must be numeric,
    * labelCol ∈ {0, 1}). regParam 0 + standardization: the planted-rule
    * gates need the boundary placed by the data alone. */
  def train(labeled: DataFrame, featureCols: Seq[String], labelCol: String,
      maxIter: Int = 100): Fitted = {
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("__features")
      .transform(labeled.select(
        (labelCol +: featureCols).map(c => col(c).cast("double")): _*))
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__features")
      .setLabelCol(labelCol)
      .setMaxIter(maxIter)
      .setRegParam(0.0)
      .setStandardization(true)
      .fit(assembled)
    Fitted(model.intercept, featureCols.zip(model.coefficients.toArray))
  }

  /** The model's probability as a pure Column expression over the feature
    * columns — sigmoid(intercept + Σ wᵢ·xᵢ). */
  def probability(f: Fitted): Column = {
    val z = f.weights.foldLeft(lit(f.intercept)) { case (acc, (c, w)) =>
      acc + col(c).cast("double") * lit(w)
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Hard classification at 0.5 — equivalently sign of the linear score,
    * emitted as 0/1 BIGINT for exact comparison. */
  def predict(f: Fitted): Column =
    (probability(f) > 0.5).cast("long")
}
