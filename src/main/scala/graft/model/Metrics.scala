package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Tables

/** Evaluation metrics as relational queries (reference R10/R11 —
  * `accuracy_score` + `classification_report`), plus a fully deterministic
  * linear scorer over the `embeddings` table so the whole predict→metrics
  * path is DuckDB-oracle-checkable (seeded RF training is not portable
  * across engines; the *metrics arithmetic* is, and this pins it).
  *
  * Scale: every metric is one hash-agg over the predictions; the report is
  * three tiny per-class aggregates joined on the 10-row class dimension.
  */
object Metrics {

  /** Fixed integer weight for (class, dim) — small, public formula shared
    * with the oracle SQL generator. */
  def weight(cls: Int, dim: Int): Long = ((cls * 64 + dim) * 37) % 19 - 9

  val numClasses = 10
  val numDims = 64

  /** Deterministic "model": score_c = ⟨embedding, w_c⟩, prediction =
    * argmax_c (ties → lowest class). Pure column arithmetic, no UDF. */
  def linearPredictions(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val emb = Similarity.embDouble(spark, dir)
    val scored = emb.select(
      col("vec_id") +: col("label").cast("long").as("label") +:
        (0 until numClasses).map { c =>
          val w = array((0 until numDims).map(d => lit(weight(c, d).toDouble)): _*)
          graft.functions.GraftFunctions.dot(col("embedding"), w).as(s"score_$c")
        }: _*)
    val pred = (0 until numClasses - 1).foldRight(lit((numClasses - 1).toLong)) {
      case (c, elseCol) =>
        val beatsRest = ((c + 1) until numClasses)
          .map(r => col(s"score_$c") >= col(s"score_$r")).reduce(_ && _)
        when(beatsRest, lit(c.toLong)).otherwise(elseCol)
    }
    scored.select(col("vec_id"), col("label"), pred.as("pred"))
  }

  /** Confusion matrix of the linear scorer: (label, pred, n). */
  def linearConfusion(spark: SparkSession, dir: String): DataFrame =
    linearPredictions(spark, dir)
      .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))

  /** Overall accuracy of the linear scorer (R10 shape). */
  def linearAccuracy(spark: SparkSession, dir: String): DataFrame =
    TrainEval.accuracy(linearPredictions(spark, dir), "label", "pred")

  /** Per-class precision / recall / F1 / support — the reference's
    * `classification_report` (R11) as a DataFrame. Computed from three
    * skinny aggregates (actual counts, predicted counts, true positives)
    * outer-joined on class; absent classes get 0 via coalesce so the
    * arithmetic matches the oracle exactly. */
  def classificationReport(pred: DataFrame, actualCol: String,
                           predCol: String): DataFrame = {
    val act = pred.groupBy(col(actualCol).as("cls"))
      .agg(count(lit(1)).as("support"))
    val prd = pred.groupBy(col(predCol).as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    val tp = pred.where(col(actualCol) === col(predCol))
      .groupBy(col(actualCol).as("cls")).agg(count(lit(1)).as("n_tp"))
    // nullif divisor: a class with zero predictions must yield precision 0,
    // not an ANSI DIVIDE_BY_ZERO (Spark 4 default; found by GraftProps)
    val precision = coalesce(col("n_tp"), lit(0L)).cast("double") /
      nullif(coalesce(col("n_pred"), lit(0L)), lit(0L))
    val recall = coalesce(col("n_tp"), lit(0L)).cast("double") / col("support")
    act.join(prd, Seq("cls"), "left").join(tp, Seq("cls"), "left")
      .select(col("cls"),
        round(coalesce(precision, lit(0.0)), 6).as("precision"),
        round(coalesce(recall, lit(0.0)), 6).as("recall"),
        round(coalesce(
          lit(2.0) * precision * recall / nullif(precision + recall, lit(0.0)),
          lit(0.0)), 6).as("f1"),
        col("support"))
      .orderBy(col("cls"))
  }

  /** R11 over the deterministic linear scorer — the oracle-checked form. */
  def linearReport(spark: SparkSession, dir: String): DataFrame =
    classificationReport(linearPredictions(spark, dir), "label", "pred")

  /** Seeded RF on the embeddings table (real MLlib train/predict, R8/R9),
    * reported as a holdout confusion matrix. Not oracle-checkable (tree
    * induction isn't portable SQL) → rows-only driver check. NB: the
    * synthetic embeddings carry no label signal (near-uniform vectors), so
    * accuracy here is chance-level by construction — the operator contract
    * is the train→predict→confusion plumbing; learnability is asserted on
    * [[graft.datagen.SyntheticFeatures]] where signal exists. */
  def rfConfusion(spark: SparkSession, dir: String, numTrees: Int = 20): DataFrame = {
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("double").as("label"),
        array_to_vector(col("embedding")).as("features"))
    val Array(train, test) = emb.randomSplit(Array(0.8, 0.2), 42)
    val model = new RandomForestClassifier()
      .setNumTrees(numTrees).setSeed(42)
      .setLabelCol("label").setFeaturesCol("features")
      .setFeatureSubsetStrategy("sqrt")
      .fit(train)
    model.transform(test)
      .groupBy(col("label").cast("long").as("label"),
        col("prediction").cast("long").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred"))
  }
}
