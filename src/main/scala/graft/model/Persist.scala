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
  /** JSON string escape: quote, backslash, and all control chars — a path
    * containing either would otherwise produce an unparseable file. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Doubles serialize as JSON numbers; NaN/Infinity (not valid JSON) as
    * null, like Python's json with allow_nan=False semantics. */
  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  def saveRunInfo(accuracy: Double, modelPath: String, featureStorePath: String,
                  predictionsPath: String, outFile: String): Unit = {
    val metricsPath =
      predictionsPath.stripSuffix("/predictions.csv") + "/performance_metrics.txt"
    val json = Seq(
      "model_type" -> jstr("RandomForestClassifier"),
      "model_path" -> jstr(modelPath),
      "feature_store_path" -> jstr(featureStorePath),
      "accuracy" -> jnum(accuracy),
      "predictions_path" -> jstr(predictionsPath),
      "performance_metrics_path" -> jstr(metricsPath))
      .map { case (k, v) => s"${jstr(k)}: $v" }
      .mkString("{", ", ", "}")
    val p = Paths.get(outFile)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, json)
  }
}
