package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.datagen.SyntheticFeatures
import graft.store.FeatureStore

/** End-to-end reference-fidelity pipeline — the Spark rendition of
  * `/root/reference/src/main.py:7-45`: generate → publish feature store →
  * exact 80/20 split → seeded RF fit → predict → accuracy → persist
  * model/predictions/run-info.
  */
object Pipeline {

  final case class Result(accuracy: Double, nTrain: Long, nTest: Long)

  val featureCols: Seq[String] =
    (0 until SyntheticFeatures.numFeatures).map(i => s"feature_$i")

  def run(spark: SparkSession, outRoot: String, n: Long = 100,
          numTrees: Int = 100, seed: Long = 42): Result = {
    val features = SyntheticFeatures.generate(spark, n).cache()
    FeatureStore.writeCsv(features.drop("row_id"),
      s"$outRoot/feature_store/features.csv", Seq("target", "feature_0"))

    val (train, test) = TrainEval.exactSplit(features, "row_id", 0.2, seed)
    val model = TrainEval.trainRF(train, featureCols, "target", numTrees, seed)
    val pred = TrainEval.predict(model, test, featureCols).cache()

    val accRow = TrainEval.accuracy(pred, "target", "prediction").head()
    val acc = accRow.getDouble(0)
    val (nTest, nTrain) = (accRow.getLong(1), train.count())

    Persist.saveModel(model, s"$outRoot/model_runs/random_forest")
    Persist.savePredictions(pred, "target", "prediction",
      s"$outRoot/model_runs/predictions.csv")
    Persist.saveRunInfo(acc, s"$outRoot/model_runs/random_forest",
      s"$outRoot/feature_store/features.csv",
      s"$outRoot/model_runs/predictions.csv",
      s"$outRoot/model_runs/run_info.json")
    features.unpersist(); pred.unpersist()
    Result(acc, nTrain, nTest)
  }
}
