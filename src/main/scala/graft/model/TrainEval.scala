package graft.model

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/evaluate pipeline with the reference's semantics
  * (`/root/reference/src/model_training.py:5-14`): exact-count shuffled
  * split → seeded random forest → batch inference → accuracy.
  *
  * Split semantics (SURVEY.md §7.4): sklearn's `train_test_split` is an
  * exact-count shuffled split, Spark's `randomSplit` is Bernoulli. We ship
  * both: [[exactSplit]] reproduces the exact 80/20 contract for
  * reference-fidelity tests (global rank — fine at model-training scale,
  * where labeled data is the small end of the lake), [[bernoulliSplit]]
  * is the shuffle-free 100 TB path.
  */
object TrainEval {

  /** Exact-count split: deterministic hash-shuffled global rank, test set
    * gets exactly ⌈n·testFrac⌉ rows — sklearn `train_test_split` sizes the
    * test set with ceil (reference semantics; identical to floor at the
    * reference's n=100 but not at e.g. n=123). The global sort is the
    * price of the exact count — acceptable for train/test sizing, not for
    * lake-scale ETL (use [[bernoulliSplit]] there). */
  def exactSplit(df: DataFrame, idCol: String, testFrac: Double,
                 seed: Long): (DataFrame, DataFrame) = {
    val n = df.count()
    val nTest = math.ceil(n * testFrac).toLong
    val ranked = df.withColumn("__rnk",
      row_number().over(Window.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))))
    val test = ranked.where(col("__rnk") <= nTest).drop("__rnk")
    val train = ranked.where(col("__rnk") > nTest).drop("__rnk")
    (train, test)
  }

  /** Bernoulli split — approximate fractions, zero shuffle, scale path. */
  def bernoulliSplit(df: DataFrame, weights: Array[Double],
                     seed: Long): Array[DataFrame] =
    df.randomSplit(weights, seed)

  /** Assemble feature columns into MLlib's vector column. */
  def assemble(df: DataFrame, featureCols: Seq[String]): DataFrame =
    new VectorAssembler().setInputCols(featureCols.toArray)
      .setOutputCol("features").transform(df)

  /** Seeded random forest fit, mirroring the reference's
    * `RandomForestClassifier(n_estimators=100, random_state=42)` with
    * sklearn's defaults (gini, sqrt feature subsetting). */
  def trainRF(train: DataFrame, featureCols: Seq[String], labelCol: String,
              numTrees: Int = 100, seed: Long = 42): RandomForestClassificationModel =
    new RandomForestClassifier()
      .setNumTrees(numTrees)
      .setSeed(seed)
      .setLabelCol(labelCol)
      .setFeaturesCol("features")
      .setFeatureSubsetStrategy("sqrt")
      .fit(assemble(train, featureCols))

  /** Batch inference: appends `prediction`. */
  def predict(model: RandomForestClassificationModel, test: DataFrame,
              featureCols: Seq[String]): DataFrame =
    model.transform(assemble(test, featureCols))

  /** Accuracy as a 1-row DataFrame — mean(actual == predicted), the
    * reference's `accuracy_score` (R10). */
  def accuracy(pred: DataFrame, actualCol: String, predCol: String): DataFrame =
    pred.agg(
      round(avg(when(col(actualCol) === col(predCol), 1.0).otherwise(0.0)), 6)
        .as("accuracy"),
      count(lit(1)).as("n"))
}
