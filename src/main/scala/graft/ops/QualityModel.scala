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

  // ------------------------------------------------------------------
  // fastText-shape HASHED-feature path (r14): features are a fixed-k
  // count vector from [[graft.functions.FeatureHash]] (hashed word
  // n-grams), not named numeric columns — the classifier gate real
  // pretraining pipelines run. Same two-phase scale shape: distributed
  // LBFGS on the labeled subset, then scoring as a pure Column fold over
  // the k dims (no model object, no UDF, nothing near the corpus scan).

  /** A fitted binary logistic model over a k-dim vector column. */
  final case class FittedVec(intercept: Double, weights: Array[Double])

  /** Fit LR on a hashed-count `array` feature column (k dims). */
  def trainHashed(labeled: DataFrame, featuresCol: String, labelCol: String,
      maxIter: Int = 100): FittedVec = {
    val assembled = labeled.select(col(labelCol).cast("double").as(labelCol),
      org.apache.spark.ml.functions.array_to_vector(
        col(featuresCol).cast("array<double>")).as("__features"))
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__features")
      .setLabelCol(labelCol)
      .setMaxIter(maxIter)
      .setRegParam(0.0)
      .setStandardization(true)
      .fit(assembled)
    FittedVec(model.intercept, model.coefficients.toArray)
  }

  /** The hashed model's probability as a Column fold over the k dims —
    * sigmoid(intercept + Σⱼ wⱼ·x[j]); zero weights (hash buckets the
    * training set never hit, or constant dims standardization zeroed)
    * drop out of the expression tree entirely. */
  def probabilityHashed(f: FittedVec, features: Column): Column = {
    val z = f.weights.zipWithIndex.foldLeft(lit(f.intercept)) {
      case (acc, (w, j)) =>
        if (w == 0.0) acc
        else acc + features.getItem(j).cast("double") * lit(w)
    }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Hard classification at 0.5 over the hashed features, 0/1 BIGINT. */
  def predictHashed(f: FittedVec, features: Column): Column =
    (probabilityHashed(f, features) > 0.5).cast("long")
}
