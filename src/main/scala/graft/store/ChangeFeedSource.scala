package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental CHANGE-DATA-FEED SOURCE over a [[Snapshots]] base
  * (round-15 verdict #4): each committed version transition's change
  * feed ([[Snapshots.changeFeed]] row shape) is emitted EXACTLY ONCE per
  * named consumer, tracked by a checkpointed last-version cursor — the
  * Delta `readChangeFeed` + `startingVersion` discipline, self-serve for
  * downstream incremental consumers (view maintenance, replication,
  * audit) instead of each one hand-rolling a version-bump loop.
  *
  * Delivery contract — the same one Structured Streaming's foreachBatch
  * gives its sinks, deliberately: the cursor advances AFTER the handler
  * returns, so a consumer that crashes mid-transition gets that
  * transition RE-DELIVERED on restart (at-least-once invocation), and
  * end-to-end exactly-once is the composition of this source with an
  * idempotent or transactional handler (e.g. [[Snapshots.publishBatch]]
  * keyed on the transition's target version — the same pairing Delta
  * documents for its CDF reader). Emission is exactly-once in the
  * steady state: a transition whose cursor mark landed is never emitted
  * again, across restarts and JVMs.
  *
  * The cursor is not a mutable file but a monotone series of atomic
  * create-if-absent marks (`.cdfat-<consumer>-<v>`, via the
  * [[AtomicClaim]] seam like every store marker) — crash-safe with no
  * rename-window where the cursor is absent; older marks are swept
  * opportunistically on advance, so steady-state metadata is O(1) per
  * consumer.
  *
  * Scale: a drain is one directory listing plus, per pending
  * transition, the one full-outer join [[Snapshots.changeFeedOf]] costs
  * — nothing proportional to history length, no data collected to the
  * driver. Retention interaction: the consumer's cursor must stay
  * within the retained window ([[Snapshots.retain]] keeps at least the
  * feed's endpoints); a consumer whose cursor version was retained away
  * must re-bootstrap from a full snapshot read, exactly like a Delta
  * CDF reader past `delta.logRetentionDuration`. */
object ChangeFeedSource {

  private def markPrefix(consumerId: String) = s".cdfat-$consumerId-"

  /** Last version this consumer fully processed (the max cursor mark),
    * or None for a fresh consumer. */
  def lastProcessed(spark: SparkSession, base: String,
                    consumerId: String): Option[Long] = {
    val (hfs, dir) = fsAndDir(spark, base)
    if (!hfs.exists(dir)) None
    else hfs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(markPrefix(consumerId)))
      .flatMap(_.stripPrefix(markPrefix(consumerId)).toLongOption)
      .maxOption
  }

  private def fsAndDir(spark: SparkSession, base: String) = {
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val hfs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (hfs, new Path(new Path(wh, "graft_snapshots"), base.toLowerCase))
  }

  private def advanceCursor(spark: SparkSession, base: String,
                            consumerId: String, v: Long): Unit = {
    val (hfs, dir) = fsAndDir(spark, base)
    Snapshots.atomicClaim.create(hfs, new Path(dir, markPrefix(consumerId) + v))
    // opportunistic sweep of superseded marks — the newest always stays
    hfs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith(markPrefix(consumerId)) &&
        n.stripPrefix(markPrefix(consumerId)).toLongOption.exists(_ < v))
        hfs.delete(s.getPath, false)
    }
  }

  /** Drain every committed version transition past this consumer's
    * cursor, in commit order: `handler(vFrom, vTo, feed)` once per
    * transition, cursor advanced after each handler return. A fresh
    * consumer starts at `startAt` (default: the EARLIEST committed
    * version — its full state is the consumer's bootstrap snapshot, and
    * feeds begin with the transition out of it). Returns the processed
    * `(vFrom, vTo)` pairs; an empty result means the consumer is caught
    * up. Call from any poll loop — a Structured Streaming foreachBatch
    * tick, a cron, a notification — the cursor makes the schedule
    * irrelevant to correctness. */
  def drain(spark: SparkSession, base: String, consumerId: String,
            keys: Seq[String], vals: Seq[String],
            startAt: Option[Long] = None)
           (handler: (Long, Long, DataFrame) => Unit): Seq[(Long, Long)] = {
    val vs = Snapshots.versions(spark, base)
    if (vs.isEmpty) return Seq.empty
    val from = lastProcessed(spark, base, consumerId)
      .getOrElse {
        val s = startAt.getOrElse(vs.head)
        require(vs.contains(s),
          s"changeFeed source $base/$consumerId: start version $s is not committed")
        // bootstrap: mark the start version processed so a crash between
        // the consumer's snapshot read and its first feed is replayable
        advanceCursor(spark, base, consumerId, s)
        s
      }
    val pending = vs.filter(_ > from)
    var cur = from
    pending.map { v =>
      handler(cur, v, Snapshots.changeFeed(spark, base, cur, v, keys, vals))
      advanceCursor(spark, base, consumerId, v)
      val t = (cur, v)
      cur = v
      t
    }
  }
}
