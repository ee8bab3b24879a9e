package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Feature-store publish/read (reference R4: `df.to_csv(path, index=False)`
  * at `/root/reference/src/main.py:14-15`, re-read implied by its README).
  *
  * CSV (header, no index column) is kept for reference fidelity; parquet is
  * the engine-native format — columnar, splittable, predicate-pushdown-able
  * — and the only sane choice at 100 TB. Writers take an explicit sort so
  * output bytes are stable for golden comparisons (SURVEY.md §7.4).
  */
object FeatureStore {

  /** Publish as CSV with header, deterministic row order. `coalesce(1)`
    * mirrors the reference's single-file artifact — fidelity-scale only;
    * use [[writeParquet]] for anything big. */
  def writeCsv(df: DataFrame, path: String, orderCols: Seq[String]): Unit =
    df.orderBy(orderCols.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Read back with an explicit schema — never inferSchema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON lines sink (reference R14 generalized to tables): one object per
    * row, ordered for stable goldens. */
  def writeJson(df: DataFrame, path: String, orderCols: Seq[String]): Unit =
    df.orderBy(orderCols.map(col): _*)
      .coalesce(1)
      .write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Engine-native store: parquet, optionally bucketed by a key column at
    * scale (bucketing needs a table catalog; plain partitioned parquet
    * here). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
