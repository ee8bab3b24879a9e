package graft.model

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model/prediction/run-info persistence (reference R12–R14,
  * `/root/reference/src/model_saving.py:5-14`).
  */
object Persist {

  /** R12: persist the fitted model (MLWritable → parquet forest + JSON
    * metadata, the Spark-native analogue of the joblib pickle). */
  def saveModel(model: RandomForestClassificationModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): RandomForestClassificationModel =
    RandomForestClassificationModel.load(path)

  /** R13: predictions table `Actual,Predicted` as header CSV, ordered for
    * byte stability. */
  def savePredictions(pred: DataFrame, actualCol: String, predCol: String,
                      path: String): Unit =
    pred.select(col(actualCol).cast("long").as("Actual"),
        col(predCol).cast("long").as("Predicted"))
      .orderBy(col("Actual"), col("Predicted"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** R14: flat run-info JSON record. Reproduces the reference's 6 keys —
    * including `performance_metrics_path`, which the reference dangles
    * without ever writing the file (SURVEY.md §2.A quirks); we keep the
    * key for fidelity and likewise never create that file. */
  def saveRunInfo(accuracy: Double, modelPath: String, featureStorePath: String,
                  predictionsPath: String, outFile: String): Unit = {
    val json =
      s"""{"model_type": "RandomForestClassifier", "model_path": "$modelPath", """ +
        s""""feature_store_path": "$featureStorePath", "accuracy": $accuracy, """ +
        s""""predictions_path": "$predictionsPath", """ +
        s""""performance_metrics_path": "${predictionsPath.stripSuffix("/predictions.csv")}/performance_metrics.txt"}"""
    val p = Paths.get(outFile)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, json)
  }
}
