package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-isolated, TIME-TRAVELABLE published tables (round-11 verdict
  * #3) — the retention counterpart of [[FeatureStore.ensureVersionedTable]]
  * (which keeps exactly ONE live version per base and drops the rest,
  * the right contract for derived layouts that must track the source).
  * Here every `publish` appends an immutable numbered version
  * `<base>_v<k>` and readers address versions explicitly — the
  * Iceberg/Delta-style snapshot contract re-expressed over plain
  * catalog parquet tables:
  *
  *   - writers never mutate a published version (write mode is
  *     `errorifexists` under the per-base lock — a version id is
  *     allocated exactly once);
  *   - readers of version k are isolated from later publishes forever
  *     (time travel = `readVersion(base, k)`);
  *   - storage is bounded by an explicit [[retain]] sweep, never by a
  *     publish-time drop racing a reader.
  *
  * Scale notes: version ids come from a catalog listing under the
  * per-base lock — one metastore round-trip per publish, no data read.
  * The lock serializes in-JVM publishers (same single-writer-per-base
  * assumption as [[FeatureStore.ensureVersionedTable]]); a multi-writer
  * deployment would swap the id allocation for the metastore's atomic
  * CREATE, which `errorifexists` already maps onto. Reading a version is
  * a plain pruned parquet scan — none of the reader paths pay anything
  * for the versioning. */
object Snapshots {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lock(base: String): Object =
    locks.computeIfAbsent(base.toLowerCase, _ => new Object)

  private def vname(base: String, v: Long): String = s"${base}_v$v"

  /** Existing version ids of `base`, ascending (catalog-derived). */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val prefix = base.toLowerCase + "_v"
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .flatMap(n => n.stripPrefix(prefix).toLongOption)
      .sorted.toSeq
  }

  /** Newest version id, if any. */
  def latest(spark: SparkSession, base: String): Option[Long] =
    versions(spark, base).lastOption

  /** Clear warehouse directories of `base` versions that have NO catalog
    * entry — orphans from a previous JVM (the in-memory catalog dies with
    * each process, so a dead session's snapshot data is unreadable
    * anyway, and its surviving directory would otherwise block this
    * session's same-numbered CREATE forever — the same stale-location
    * discipline as [[FeatureStore.ensureVersionedTable]]). Caller holds
    * the base lock. */
  private def sweepOrphans(spark: SparkSession, base: String): Unit = {
    val live = versions(spark, base).map(v => vname(base, v).toLowerCase).toSet
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = new org.apache.hadoop.fs.Path(wh)
    val fs = whPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(whPath)) {
      fs.listStatus(whPath).map(_.getPath)
        .filter { p =>
          val n = p.getName.toLowerCase
          n.startsWith(base.toLowerCase + "_v") &&
            n.stripPrefix(base.toLowerCase + "_v").toLongOption.nonEmpty &&
            !live.contains(n)
        }
        .foreach(p => fs.delete(p, true))
    }
  }

  /** Publish `df` as the next immutable version of `base`; returns the
    * allocated version id. */
  def publish(spark: SparkSession, df: DataFrame, base: String): Long =
    lock(base).synchronized {
      sweepOrphans(spark, base)
      val next = latest(spark, base).getOrElse(0L) + 1
      df.write.mode("errorifexists").format("parquet")
        .saveAsTable(vname(base, next))
      next
    }

  /** Time travel: the frozen content of version `v`. */
  def readVersion(spark: SparkSession, base: String, v: Long): DataFrame =
    spark.table(vname(base, v))

  /** Retention sweep: drop all but the newest `keep` versions; returns
    * the dropped ids. Explicit and caller-scheduled — a publish never
    * deletes anything a concurrent reader may hold. */
  def retain(spark: SparkSession, base: String, keep: Int): Seq[Long] =
    lock(base).synchronized {
      val vs = versions(spark, base)
      val drop = vs.dropRight(keep)
      drop.foreach(v => spark.sql(s"DROP TABLE IF EXISTS `${vname(base, v)}`"))
      drop
    }

  /** Create-once seeding for declared queries: if `base` has no versions
    * yet, publish each builder's frame in order (a deterministic version
    * history); no-op otherwise. Idempotent and race-safe under the
    * per-base lock. */
  def ensureVersions(spark: SparkSession, base: String,
                     builders: Seq[() => DataFrame]): Unit =
    lock(base).synchronized {
      if (versions(spark, base).isEmpty)
        builders.foreach(b => publish(spark, b(), base))
    }
}
