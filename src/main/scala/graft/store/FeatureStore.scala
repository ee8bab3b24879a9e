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
    * scale ([[ensureBucketedTable]] for the catalog-backed bucketed form). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** ORC sink/source — the second columnar lake format Spark ships
    * natively (vectorized reader, predicate pushdown, same
    * bucketing/partitioning composition as parquet); interop surface for
    * lakes standardized on ORC. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Publish `df` as a catalog-backed parquet table bucketed (and
    * bucket-sorted) by `key` — the co-partitioned layout that lets every
    * downstream join/aggregate on `key` run with ZERO exchange: the
    * bucketed scan reports `HashPartitioning(key, buckets)`, which
    * satisfies the join/agg distribution requirement outright. At 100 TB
    * this is the single biggest shuffle lever for recurring fact-fact
    * joins: pay one shuffle at publish time, never again at read time.
    * Idempotent per session (the in-memory catalog is session-scoped). */
  /** Create-once-per-session catalog publisher: clears a stale managed
    * location (a previous JVM's in-memory catalog may have orphaned it —
    * without catalog metadata the files aren't a bucketed/partitioned
    * table) and runs `write`.
    *
    * The check-then-act (exists → delete location → write) is serialized
    * per table name, so concurrent publishers of the SAME table within
    * this JVM (e.g. the two futures in
    * [[graft.ops.Relational.publishBucketedJoinTables]] racing a warmup
    * caller) can't both pass the existence check and race the delete
    * (round-2 ADVICE). Single-writer is assumed ACROSS JVMs — the
    * in-memory catalog is process-local anyway; a shared metastore
    * deployment would rely on the catalog's own atomic CREATE instead. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def ensureTable(spark: SparkSession, table: String)(
      write: => Unit): Unit =
    tableLocks.computeIfAbsent(table, _ => new Object).synchronized {
      if (!spark.catalog.tableExists(table)) {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        write
      }
    }

  def ensureBucketedTable(spark: SparkSession, df: => DataFrame, table: String,
                          key: String, buckets: Int = 8): Unit =
    ensureTable(spark, table) {
      // repartition by the bucket key first: Dataset.repartition and the
      // bucketing writer share the same murmur3-mod-n placement, so each
      // write task owns exactly one bucket → ONE sorted file per bucket.
      // That lets the bucketed reader trust the sortBy metadata, so a
      // downstream merge join needs neither an exchange NOR a sort.
      df.repartition(buckets, col(key))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
    }

  /** Drop every catalog table whose name starts with `prefix` except
    * `keep` — cleanup for content-fingerprinted layout names (a corpus
    * rewrite mints a fresh name; the superseded version's table and its
    * managed files should not accumulate in the warehouse). */
  def dropSupersededTables(spark: SparkSession, prefix: String,
                           keep: String): Unit =
    spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith(prefix.toLowerCase) && n != keep.toLowerCase)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))

  /** Publish `df` as a plain (unbucketed, unpartitioned) catalog parquet
    * table — for narrow derived layouts like the ANN sign index, where the
    * reader always scans the whole (tiny-per-row) table and the win is
    * the precomputed column itself, not data placement. */
  def ensurePlainTable(spark: SparkSession, df: => DataFrame,
                       table: String): Unit =
    ensureTable(spark, table) {
      df.write.mode("overwrite").format("parquet").saveAsTable(table)
    }

  /** Publish `df` hive-style partitioned by `partCol` — the lake layout
    * that turns partition-column predicates into directory pruning: a
    * filter on `partCol` skips the other partitions' files entirely. At
    * 100 TB, date-partitioning is the first-line data-skipping lever,
    * ahead of any row-group statistics. */
  def ensurePartitionedTable(spark: SparkSession, df: => DataFrame,
                             table: String, partCol: String): Unit =
    ensureTable(spark, table) {
      df.write.mode("overwrite").format("parquet")
        .partitionBy(partCol)
        .saveAsTable(table)
    }

  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
