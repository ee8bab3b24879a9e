package graft

import org.apache.spark.sql.functions._
import graft.store.Snapshots

/** Round-16 store guarantees: commit-time conflict detection (the
  * successor-slot chain), schema-id inheritance across delta publishes,
  * rename-fork refusal, chain-wedge recovery via vacuum, and the
  * retention × txn-tombstone × DV interaction. */
class SnapshotConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def cleanly(bases: String*)(body: => Unit): Unit = {
    bases.foreach(Snapshots.retain(spark, _, keep = 0))
    try body finally bases.foreach(Snapshots.retain(spark, _, keep = 0))
  }

  test("concurrent MERGE INTO: both writers' changes survive (loser retries)") {
    val base = "graft_spec_occ_merge"
    cleanly(base) {
      Snapshots.publish(spark,
        Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v"), base)
      // two RACING merges in separate sessions with DISJOINT change sets:
      // pre-fix both read v1, computed independent merged states, and the
      // higher committed id silently DISCARDED the other's changes
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val s1 = spark.newSession(); val s2 = spark.newSession()
      val batches = Seq(
        (s1, Seq((1L, 11L, "upsert"), (4L, 40L, "upsert"))),
        (s2, Seq((2L, 0L, "delete"), (5L, 50L, "upsert"))))
      val ids = Await.result(Future.sequence(batches.map { case (s, b) =>
        Future {
          import s.implicits._
          Snapshots.mergeIntoLatest(s, base, b.toDF("k", "v", "_op"), Seq("k"))
        }
      }), 120.seconds)
      assert(ids.toSet.size === 2)
      // the final state carries BOTH change sets, whatever the order
      val state = Snapshots.readVersion(spark, base,
        Snapshots.latest(spark, base).get)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(state === Map(1L -> 11L, 3L -> 30L, 4L -> 40L, 5L -> 50L))
      // and the chain is linear: each merge's parent is a real version
      val vs = Snapshots.versions(spark, base)
      assert(vs.size === 3)
      assert(vs.tail.forall(v =>
        Snapshots.versionParent(spark, base, v).exists(vs.contains)))
    }
  }

  test("concurrent DV publishes: the loser re-resolves its deletion vector, no resurrection") {
    val base = "graft_spec_occ_dv"
    cleanly(base) {
      Snapshots.publish(spark,
        (1L to 20L).map(k => (k, k * 10L)).toDF("k", "v").repartition(4), base)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val s1 = spark.newSession(); val s2 = spark.newSession()
      // overlapping batches: both touch k=1; pre-fix the loser's DV was
      // resolved against the pre-race file set, so the winner's upsert
      // file for k=1 was never masked and the key DUPLICATED on read
      val ids = Await.result(Future.sequence(Seq(
        (s1, Seq((1L, 111L, "upsert"), (2L, 0L, "delete"))),
        (s2, Seq((1L, 122L, "upsert"), (3L, 333L, "upsert")))).map {
        case (s, b) => Future {
          import s.implicits._
          Snapshots.publishDeltaDV(s, b.toDF("k", "v", "_op"), base, Seq("k"))
        }
      }), 120.seconds)
      assert(ids.toSet.size === 2)
      val rows = Snapshots.latestMerged(spark, base)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // NO duplicate keys on the merged read — the round-15 failure mode
      assert(rows.map(_._1).distinct.length === rows.length,
        s"duplicate keys after interleaved DV publishes: ${rows.sorted.toSeq}")
      val state = rows.toMap
      assert(!state.contains(2L) && state(3L) === 333L)
      // k=1 belongs to whichever batch committed LAST (chain order)
      val lastWasS2 = Snapshots.readVersion(spark, base, ids.max)
        .where(col("v") === 122L).count() > 0
      assert(state(1L) === (if (lastWasS2) 122L else 111L))
      // 20 original keys, one deleted, no inserts (1 and 3 existed)
      assert(state.size === 19)
    }
  }

  test("publishIfLatest: stale read loses cleanly — nothing visible, dir reclaimed") {
    val base = "graft_spec_occ_stale"
    cleanly(base) {
      val v1 = Snapshots.publish(spark, Seq((1L, 1L)).toDF("k", "v"), base)
      val v2 = Snapshots.publish(spark, Seq((1L, 2L)).toDF("k", "v"), base)
      assert(Snapshots.publishIfLatest(spark,
        Seq((1L, 99L)).toDF("k", "v"), base, v1) === None)
      assert(Snapshots.versions(spark, base) === Seq(v1, v2))
      // the loser's claim was released too: the next id is dense
      assert(Snapshots.publish(spark, Seq((1L, 3L)).toDF("k", "v"), base)
        === v2 + 1)
    }
  }

  test("schema ids survive a delta publish: rename after merge-on-read still inherits") {
    val base = "graft_spec_ids_delta"
    cleanly(base) {
      Snapshots.publish(spark, Seq((1L, 10L), (2L, 20L)).toDF("k", "cents"), base)
      // pre-fix: the delta recorded NO schema and stampColumnIds read
      // only latest's marker, so the rename below failed ("cents is not
      // in the previous version's schema") despite being recorded at v1
      Snapshots.publishDeltaDV(spark,
        Seq((2L, 22L, "upsert"), (3L, 30L, "upsert")).toDF("k", "cents", "_op"),
        base, Seq("k"))
      val v3 = Snapshots.publish(spark,
        Snapshots.latestMerged(spark, base)
          .withColumnRenamed("cents", "amount"), base,
        renames = Map("amount" -> "cents"))
      // id-resolved read of the DV-STACKED state under the evolved
      // schema: v2's merged cents surface as `amount` BY COLUMN ID
      val mapped = Snapshots.readVersionMapped(spark, base, v3 - 1, asOf = v3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(mapped === Map(1L -> 10L, 2L -> 22L, 3L -> 30L))
      // and the reverse direction: the evolved base under v1's schema
      val back = Snapshots.readVersionMapped(spark, base, v3, asOf = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(back === Map(1L -> 10L, 2L -> 22L, 3L -> 30L))
    }
  }

  test("a rename cannot fork one column id into two") {
    val base = "graft_spec_ids_fork"
    cleanly(base) {
      Snapshots.publish(spark, Seq((1L, 10L)).toDF("k", "cents"), base)
      val e = intercept[IllegalArgumentException] {
        Snapshots.publish(spark,
          Seq((1L, 10L, 10L)).toDF("k", "cents", "amount"), base,
          renames = Map("amount" -> "cents"))
      }
      assert(e.getMessage.contains("cannot fork"), e.getMessage)
      assert(Snapshots.versions(spark, base).size === 1)
    }
  }

  test("a crashed slot holder wedges the chain until vacuum releases it") {
    val base = "graft_spec_chain_wedge"
    cleanly(base) {
      val v1 = Snapshots.publish(spark, Seq((1L, 1L)).toDF("k", "v"), base)
      // simulate a committer that won v1's successor slot and died before
      // its commit marker: the slot exists, no committed version records
      // parent v1
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val slot = new org.apache.hadoop.fs.Path(
        s"$wh/graft_snapshots/$base/.next-$v1")
      val hfs = slot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.create(slot, false).close()
      val saved = Snapshots.successorWaitMs
      Snapshots.successorWaitMs = 200L
      try {
        val e = intercept[IllegalArgumentException] {
          Snapshots.publish(spark, Seq((2L, 2L)).toDF("k", "v"), base)
        }
        assert(e.getMessage.contains("never committed"), e.getMessage)
      } finally Snapshots.successorWaitMs = saved
      // vacuum tells the dead slot from live ones (no committed consumer)
      // and releases it; the claim the failed publish left goes with it
      val reclaimed = Snapshots.vacuum(spark, base, ttlMs = 0L)
      assert(reclaimed.contains(s".next-$v1"), reclaimed.toString)
      val v2 = Snapshots.publish(spark, Seq((2L, 2L)).toDF("k", "v"), base)
      assert(Snapshots.versions(spark, base) === Seq(v1, v2))
    }
  }

  test("retention x txn tombstones x DV stack: redelivery no-ops, surviving versions reconstruct") {
    val base = "graft_spec_retain_dv"
    cleanly(base) {
      Snapshots.publish(spark,
        (1L to 10L).map(k => (k, k)).toDF("k", "v"), base)
      // three exactly-once CDC batches stack as DV deltas
      assert(Snapshots.publishDeltaDVBatch(spark,
        Seq((1L, 11L, "upsert")).toDF("k", "v", "_op"), base, Seq("k"),
        batchId = 0L, writerId = "cdc").isDefined)
      assert(Snapshots.publishDeltaDVBatch(spark,
        Seq((2L, 0L, "delete")).toDF("k", "v", "_op"), base, Seq("k"),
        batchId = 1L, writerId = "cdc").isDefined)
      assert(Snapshots.publishDeltaDVBatch(spark,
        Seq((11L, 110L, "upsert")).toDF("k", "v", "_op"), base, Seq("k"),
        batchId = 2L, writerId = "cdc").isDefined)
      val expect = ((3L to 10L).map(k => k -> k) ++
        Seq(1L -> 11L, 11L -> 110L)).toMap
      assert(Snapshots.latestMerged(spark, base)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expect)
      // compaction folds the stack, retention drops the pre-compaction
      // chain (anchor + all three tagged DV versions)
      graft.ops.Layout.compactSnapshot(spark, base, col("k"), 100L)
      val dropped = Snapshots.retain(spark, base, keep = 1)
      assert(dropped.size === 4)
      // the surviving compacted version still reconstructs the state
      val vs = Snapshots.versions(spark, base)
      assert(vs.size === 1)
      assert(Snapshots.readVersionMerged(spark, base, vs.head)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expect)
      // redelivery of every retained-away batch is STILL a no-op — the
      // txnlog tombstones outlive the data, even across a vacuum sweep
      assert(Snapshots.vacuum(spark, base, ttlMs = 0L).isEmpty)
      Seq(0L, 1L, 2L).foreach { b =>
        assert(Snapshots.publishDeltaDVBatch(spark,
          Seq((9L, 999L, "upsert")).toDF("k", "v", "_op"), base, Seq("k"),
          batchId = b, writerId = "cdc") === None)
      }
      assert(Snapshots.versions(spark, base) === vs)
    }
  }
}
