package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multi-dimensional data-layout clustering (SURVEY.md §2.B scan/layout
  * rows): Morton/z-order interleaving of two sort dimensions, the
  * lakehouse `OPTIMIZE ZORDER BY` primitive (public precedents: Delta
  * Lake OPTIMIZE, Databricks' z-ordering writeups; the curve itself is
  * Morton 1966). A 1-D sort makes parquet min/max stats razor-tight on
  * the sort key and USELESS on every other column — each file spans the
  * full range of dim 2, so a dim-2 predicate skips nothing. Interleaving
  * the bit-planes of both (rank-normalized) dimensions gives files that
  * cover a narrow range of BOTH columns, so stats-based pruning (parquet
  * row-group min/max, file-level stats indexes) works for either
  * predicate — the difference between scanning 100 TB and scanning the
  * ~1/√files slice that can match.
  *
  * Everything here is exact integer arithmetic (rank scaling by integer
  * division, bit shifts and masks), so the DuckDB oracle replays the
  * z-values bit-for-bit — the layout decision itself is hash-checked,
  * not just asserted.
  */
object Layout {

  /** Bits per dimension in the interleave: 16 ⇒ a 32-bit z-value. 2¹⁶
    * rank buckets per dimension is far finer than any practical file
    * count; finer widths would only interleave noise bits. */
  val zBits = 16

  /** Morton interleave of two [[zBits]]-bit non-negative long columns:
    * bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. Pure
    * shift/mask arithmetic — whole-stage-codegen'd, and replayed
    * verbatim by [[interleaveSql]]. */
  def interleave(a: Column, b: Column): Column =
    (0 until zBits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduceLeft(_ bitwiseOR _)

  /** The same interleave as a DuckDB SQL expression over two integer
    * column expressions — generated from the SAME zBits constant so the
    * twin can never drift from the engine. */
  def interleaveSql(a: String, b: String): String =
    (0 until zBits).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) | (((($b) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** Scale a long column into [0, 2^zBits − 1] by exact integer
    * arithmetic against broadcast min/max stats: u = (x−mn)·(2¹⁶−1) div
    * (mx−mn), degenerate (mx = mn) columns map to 0. `div` is integer
    * division — identical to DuckDB `//` for the non-negative operands
    * here. */
  private def rankScale(x: Column, mn: Column, mx: Column): Column =
    coalesce(call_function("div", (x - mn) * lit(65535L),
      nullif(mx - mn, lit(0L))).cast("long"), lit(0L))

  /** Orders with the two clustering dimensions as longs: customer key
    * and the epoch-day of the order date — the classic "query by
    * customer OR by date window" pair that 1-D sorting can only serve
    * one side of. */
  private def ordersDims(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("day"))

  /** Per-row z-values for `orders` over (o_custkey, day): one stats
    * aggregate (4 longs, broadcast), then a pure projection. This is the
    * clustering key [[zorderClustered]] range-partitions and sorts by —
    * at 100 TB the stats pass is one narrow scan and the write is the
    * same shuffle any re-clustering compaction pays. */
  def ordersZ(spark: SparkSession, dir: String): DataFrame = {
    val o = ordersDims(spark, dir)
    val stats = o.agg(
      min(col("o_custkey")).as("mn_c"), max(col("o_custkey")).as("mx_c"),
      min(col("day")).as("mn_d"), max(col("day")).as("mx_d"))
    o.crossJoin(broadcast(stats))
      .withColumn("u", rankScale(col("o_custkey"), col("mn_c"), col("mx_c")))
      .withColumn("v", rankScale(col("day"), col("mn_d"), col("mx_d")))
      .withColumn("z", interleave(col("u"), col("v")))
      .select(col("o_orderkey"), col("o_custkey"), col("day"), col("z"))
  }

  /** DECLARED z-order audit query: bucket the z-curve into 256 segments
    * (top 8 of the 32 z-bits) and report each segment's row count and
    * per-dimension envelope — the per-file min/max stats a z-ordered
    * write at 256 files would publish. Tight envelopes on BOTH columns
    * (vs a 1-D sort's full-range dim-2 envelopes) are exactly the
    * property that makes stats pruning work; the DuckDB twin replays the
    * full scale→interleave→bucket arithmetic, so the hash check covers
    * the layout computation end to end. */
  def zorderBucketStats(spark: SparkSession, dir: String): DataFrame =
    ordersZ(spark, dir)
      .groupBy(shiftright(col("z"), 24).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy(col("bucket"))

  /** Cluster a frame for writing: range-partition into `nFiles` splits
    * by the given key and sort within each — one file per partition with
    * contiguous key ranges, the shape every stats-indexed write wants
    * (same discipline as the hive-partitioned publishes: no tasks ×
    * partitions file scatter). The caller writes the result; the helper
    * column is dropped after partitioning. */
  def clusteredBy(df: DataFrame, key: Column, nFiles: Int): DataFrame =
    df.withColumn("__ck", key)
      .repartitionByRange(nFiles, col("__ck"))
      .sortWithinPartitions(col("__ck"))
      .drop("__ck")

  /** OPTIMIZE bin-packing compaction (round-12 verdict #4): rewrite the
    * LATEST snapshot version of `base` into ceil(n / targetRows)
    * range-partitioned, key-sorted files and publish the result as a NEW
    * version — the Delta/Iceberg `OPTIMIZE` shape over the snapshot
    * store. An incrementally-grown base (daily label/dedup publishes)
    * accumulates one small file per publish; compaction restores both
    * the per-file size target AND the clustering invariant (contiguous
    * disjoint key ranges per file, [[clusteredBy]]), so file-stats
    * pruning works again. The old version stays readable — compaction
    * is a publish, never a mutation; [[graft.store.Snapshots.retain]]
    * reclaims it on the caller's schedule. Returns the new version id.
    *
    * Doubles as the MATERIALIZE step of the merge-on-read path: the
    * latest state is read through
    * [[graft.store.Snapshots.readVersionMerged]], so a stack of
    * lightweight delta versions folds into ONE clustered base version —
    * after which reads are a plain pruned scan again and `retain` can
    * sweep the whole pre-compaction chain. Scale: one count + the same
    * range-shuffle any clustering write pays; no driver-side data.
    *
    * Compaction is a READ-MODIFY-WRITE, so it commits through the
    * strict [[graft.store.Snapshots.publishIfLatest]] path: a delta (or
    * any publish) landing between the merged read and the commit would
    * otherwise be silently SHADOWED by the compacted base (the new base
    * becomes the anchor and the interleaved delta below it is skipped
    * forever) — instead the loser re-reads the new latest and
    * recompacts, bounded, then fails loudly. */
  def compactSnapshot(spark: SparkSession, base: String, key: Column,
                      targetRows: Long, maxRetries: Int = 5): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      val cur = graft.store.Snapshots.latest(spark, base).getOrElse(
        throw new IllegalArgumentException(s"no committed versions of $base"))
      val df = graft.store.Snapshots.readVersionMerged(spark, base, cur)
      val n = df.count()
      val nFiles = math.max(1L, (n + targetRows - 1) / targetRows).toInt
      graft.store.Snapshots.publishIfLatest(spark,
        clusteredBy(df, key, nFiles), base, cur) match {
        case Some(v) => return v
        case None => // a commit landed mid-compaction — recompact on it
      }
    }
    sys.error(s"compactSnapshot: lost the commit race on $base " +
      s"$maxRetries times — retry under lower write contention")
  }

  /** Bins in the compaction skip audit — models a 16-file layout. */
  val compactBins = 16

  /** Exact-integer bin id: ((x − mn) · nBins) div (mx − mn + 1) — every
    * row lands in [0, nBins), degenerate ranges all in bin 0. The same
    * `div` the twin replays with `//`. */
  private def binOf(x: Column, mn: Column, mx: Column): Column =
    call_function("div", (x - mn) * lit(compactBins.toLong),
      mx - mn + lit(1L)).cast("long")

  /** DECLARED compaction/zone-map skip audit: the file-stats pruning a
    * selective day predicate gets BEFORE vs AFTER bin-packing
    * compaction, in exact integer arithmetic the DuckDB twin replays
    * bit-for-bit. "arrival" models the incrementally-grown base — files
    * cut by ingest sequence (order key), so every file's day envelope
    * spans ~the whole range and min/max stats prune nothing; "clustered"
    * models the compacted layout — files cut by day range, so the
    * 31-day predicate intersects only the files that can match. Both
    * layouts are [[compactBins]]-file models built from one broadcast
    * stats row + a pure projection (no global sort, no per-row rank —
    * the audit costs two aggregates at any scale). `rows_matched` is
    * layout-invariant by construction: the audit proves pruning changes
    * I/O, never answers. */
  def compactionSkipAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = ordersDims(spark, dir)
    val stats = o.agg(
      min(col("day")).as("mn_d"), max(col("day")).as("mx_d"),
      min(col("o_orderkey")).as("mn_k"), max(col("o_orderkey")).as("mx_k"))
    val w = o.crossJoin(broadcast(stats))
      .withColumn("lo", col("mn_d") + 100)
      .withColumn("hi", col("mn_d") + 130)
      .withColumn("bin_clustered",
        binOf(col("day"), col("mn_d"), col("mx_d")))
      .withColumn("bin_arrival",
        binOf(col("o_orderkey"), col("mn_k"), col("mx_k")))
    def audit(binCol: String, name: String): DataFrame = {
      val perFile = w.groupBy(col(binCol).as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("day")).as("mnd"), max(col("day")).as("mxd"),
          max(col("lo")).as("lo"), max(col("hi")).as("hi"),
          sum(when(col("day") >= col("lo") && col("day") <= col("hi"), 1L)
            .otherwise(0L)).as("matched"))
      val hit = col("mxd") >= col("lo") && col("mnd") <= col("hi")
      perFile.agg(
        count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_scanned"),
        sum(when(hit, col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("matched")).as("rows_matched"))
        .select(lit(name).as("layout"), col("n_files"),
          col("files_scanned"), col("rows_scanned"), col("rows_matched"))
    }
    audit("bin_arrival", "arrival")
      .unionByName(audit("bin_clustered", "clustered"))
      .orderBy(col("layout"))
  }

  /** Snapshot time travel over the published layouts (round-11 verdict
    * #3): seed a two-version history of a deterministic per-priority
    * orders aggregate in the [[graft.store.Snapshots]] store (create-
    * once), read BOTH versions back by id, and diff them with the
    * shared [[Validate.snapshotDiffRows]] full-outer engine. The planted
    * history exercises every status: version 1 drops `1-URGENT` (→
    * `added` in v2), carries a synthetic `0-LEGACY` row (→ `removed`),
    * and is date-truncated so the surviving priorities all change.
    *
    * The hash check covers snapshot FIDELITY end to end: the twin
    * recomputes both version definitions from the raw `orders` table,
    * so the stored-version read only matches if `publish` froze exactly
    * the frame it was handed and `readVersion` returns it untouched.
    * Scale: both versions are bounded (O(priorities)) aggregates off one
    * fact pass each at publish time; the declared read is two pruned
    * scans of tiny tables + a 6-row diff. */
  /** Schema evolution across snapshot versions (round-12 verdict #6;
    * write-side column ids round-14 verdict #5): version 1 of the
    * per-priority orders aggregate is written with a NARROW schema (INT
    * `n_orders`, no `cents` column, `1-URGENT` withheld), version 2 with
    * the evolved one (BIGINT `n_orders`, added `cents`), and version 3
    * RENAMES `n_orders` to `order_cnt` — declared at publish, so the new
    * name inherits the column's stable id — over a date-restricted
    * recompute so its values genuinely differ from v2's.
    *
    * The declared read reconciles v1/v2 to the evolved schema via
    * [[graft.store.Snapshots.readVersionAs]] (missing column as typed
    * NULL, widened compare in BIGINT) and reads v2 THROUGH THE RENAME
    * via [[graft.store.Snapshots.readVersionMapped]] — v2's `n_orders`
    * data surfacing under `order_cnt` because the id matched. The twin
    * recomputes all three version definitions from raw `orders`, so the
    * hash check covers write fidelity, by-name resolution, NULL-fill,
    * the widening cast, AND id-resolution across the rename end to end:
    * had the mapped read resolved by name, `cnt_renamed_v2` would be the
    * -1 sentinel everywhere and the hash would break. */
  def schemaEvolutionDiff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_se2_orders_${Relational.dirSlug(dir)}_$fp"
    val cut = lit("1997-01-01").cast("timestamp")
    val cut3 = lit("1998-01-01").cast("timestamp")
    graft.store.Snapshots.ensureHistory(spark, base, Seq(
      () => { graft.store.Snapshots.publish(spark, Tables.orders(spark, dir)
        .where(col("o_orderdate") < cut &&
          col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("int").as("n_orders")), base); () },
      () => { graft.store.Snapshots.publish(spark, Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents")), base); () },
      () => { graft.store.Snapshots.publish(spark, Tables.orders(spark, dir)
        .where(col("o_orderdate") < cut3)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("cents")), base,
        renames = Map("order_cnt" -> "n_orders")); () }))
    val evolved = StructType(Seq(
      StructField("o_orderpriority", StringType),
      StructField("n_orders", LongType),
      StructField("cents", LongType)))
    val v1 = graft.store.Snapshots.readVersionAs(spark, base, 1L, evolved)
    val v2 = graft.store.Snapshots.readVersionAs(spark, base, 2L, evolved)
    // v2 under v3's schema: n_orders surfaces as order_cnt BY COLUMN ID
    val v2m = graft.store.Snapshots.readVersionMapped(spark, base, 2L, asOf = 3L)
    val v3 = graft.store.Snapshots.readVersion(spark, base, 3L)
    Validate.snapshotDiffRows(v1, v2,
        Seq("o_orderpriority"), Seq("n_orders", "cents"))
      .join(v1.select(col("o_orderpriority"), col("n_orders").as("o_n"),
        col("cents").as("o_c")), Seq("o_orderpriority"), "left")
      .join(v2.select(col("o_orderpriority"), col("n_orders").as("n_n"),
        col("cents").as("n_c")), Seq("o_orderpriority"), "left")
      .join(v2m.select(col("o_orderpriority"), col("order_cnt").as("rn2")),
        Seq("o_orderpriority"), "left")
      .join(v3.select(col("o_orderpriority"), col("order_cnt").as("rn3")),
        Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("status"),
        coalesce(col("o_n"), lit(-1L)).as("n_old"),
        coalesce(col("n_n"), lit(-1L)).as("n_new"),
        coalesce(col("o_c"), lit(-1L)).as("cents_old"),
        coalesce(col("n_c"), lit(-1L)).as("cents_new"),
        coalesce(col("rn2"), lit(-1L)).as("cnt_renamed_v2"),
        coalesce(col("rn3"), lit(-1L)).as("cnt_v3"))
      .orderBy(col("o_orderpriority"))
  }

  /** Seed (create-once) the planted two-version orders history shared by
    * [[timeTravelDiff]] and [[changeFeedBetweenVersions]]; returns the
    * base name. Fingerprinted: snapshot versions persist on the
    * FILESYSTEM across JVMs now, so a regenerated source corpus must
    * seed a fresh history instead of reading a stale one. */
  private def ensureTtHistory(spark: SparkSession, dir: String): String = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_tt_orders_${Relational.dirSlug(dir)}_$fp"
    val cut = lit("1997-01-01").cast("timestamp")
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    graft.store.Snapshots.ensureVersions(spark, base, Seq(
      () => agg(Tables.orders(spark, dir)
          .where(col("o_orderdate") < cut &&
            col("o_orderpriority") =!= "1-URGENT"))
        .unionByName(spark.range(1).select(
          lit("0-LEGACY").as("o_orderpriority"),
          lit(0L).as("n_orders"), lit(0L).as("cents"))),
      () => agg(Tables.orders(spark, dir))))
    base
  }

  /** Change data feed between the two planted versions (Delta CDF
    * shape): `insert` for the withheld `1-URGENT`, `delete` for the
    * legacy row, `update_preimage`/`update_postimage` PAIRS for every
    * surviving priority — the CDC-read counterpart of the shipped CDC
    * MERGE apply ([[Validate.cdcMergeApply]]): one produces the feed
    * from version history, the other consumes one. Hash-checked: the
    * twin recomputes both version definitions from raw `orders` and
    * replays the row-shape rules, so publish fidelity AND the feed
    * semantics are covered. Scale: one full-outer join on the version
    * key + one explode — no per-change-type rescan of either side. */
  def changeFeedBetweenVersions(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureTtHistory(spark, dir)
    val vs = graft.store.Snapshots.versions(spark, base)
    graft.store.Snapshots.changeFeed(spark, base, vs.head, vs.last,
        Seq("o_orderpriority"), Seq("n_orders", "cents"))
      .orderBy(col("o_orderpriority"), col("change_type"))
  }

  /** Snapshot TIME TRAVEL from SQL TEXT (`q_sql_time_travel`): both
    * planted versions addressed by the store's OWN coordinates through
    * the `graft_version(base, v)` table function (round-14 verdict #8 —
    * the earlier ``parquet.`path` `` form made the query text do the
    * version addressing, but a SQL user has no catalog that tells them
    * physical paths), and full-outer diffed in SQL into exactly
    * [[timeTravelDiff]]'s output shape, so the existing
    * `q_layout_time_travel` twin hash-checks the SQL-first read path
    * too. The TVF splices [[graft.store.Snapshots.readVersion]]'s plan —
    * commit-marker check, not-committed error, pruned parquet scan —
    * straight into the query. */
  def sqlTimeTravelDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureTtHistory(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    val vs = graft.store.Snapshots.versions(spark, base)
    spark.sql(
      s"""SELECT coalesce(a.o_orderpriority, b.o_orderpriority)
         |    AS o_orderpriority,
         |  CASE WHEN a.o_orderpriority IS NULL THEN 'added'
         |       WHEN b.o_orderpriority IS NULL THEN 'removed'
         |       WHEN a.n_orders <> b.n_orders OR a.cents <> b.cents
         |         THEN 'changed'
         |       ELSE 'unchanged' END AS status,
         |  coalesce(a.n_orders, CAST(-1 AS BIGINT)) AS n_old,
         |  coalesce(b.n_orders, CAST(-1 AS BIGINT)) AS n_new
         |FROM graft_version('$base', ${vs.head}) a
         |FULL OUTER JOIN graft_version('$base', ${vs.last}) b
         |  ON a.o_orderpriority = b.o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
  }

  def timeTravelDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureTtHistory(spark, dir)
    val vs = graft.store.Snapshots.versions(spark, base)
    val v1 = graft.store.Snapshots.readVersion(spark, base, vs.head)
    val v2 = graft.store.Snapshots.readVersion(spark, base, vs.last)
    Validate.snapshotDiffRows(v1, v2,
        Seq("o_orderpriority"), Seq("n_orders", "cents"))
      .join(v1.select(col("o_orderpriority"), col("n_orders").as("n_old")),
        Seq("o_orderpriority"), "left")
      .join(v2.select(col("o_orderpriority"), col("n_orders").as("n_new")),
        Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("status"),
        coalesce(col("n_old"), lit(-1L)).as("n_old"),
        coalesce(col("n_new"), lit(-1L)).as("n_new"))
      .orderBy(col("o_orderpriority"))
  }

  /** MERGE INTO as a versioned snapshot (`q_snap_merge`) — the lakehouse
    * WRITE path the round-12 snapshot work left open: `q_valid_cdc_apply`
    * computes a merged state but publishes nothing; here the same
    * deterministic change batch (the [[Validate.snapshotDiffMods]] pmod
    * families, exact integer cents) is applied to a ROW-GRAIN keyed
    * orders snapshot through [[graft.store.Snapshots.mergeApplyOf]] and
    * the result is PUBLISHED as the next immutable version, copy-on-write.
    * The declared frame then reads BOTH stored versions back and reports
    * the change feed between them by change type plus the merged-state
    * totals — so the hash check proves, end to end, that the merge wrote
    * exactly the rows the MERGE semantics demand and that history
    * survived intact (the twin recomputes pre- and post-merge states from
    * raw `orders` and replays the Delta-CDF classification rules).
    *
    * Scale shape: the merge is one left-anti equi-join plus two narrow
    * unions (exchange-free when target and batch share the key
    * bucketing); the feed is ONE full-outer join on the key. Nothing is
    * proportional to the version count and no row is rewritten in place. */
  def mergeIntoSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureMergeBase(spark, dir)
    val vs = graft.store.Snapshots.versions(spark, base)
    mergeSummary(spark,
      graft.store.Snapshots.readVersion(spark, base, vs.head),
      graft.store.Snapshots.readVersion(spark, base, vs.last))
  }

  /** Seed (create-once) the copy-on-write MERGE fixture shared by
    * `q_snap_merge` and the SQL-text flagship `q_sql_merge`; returns the
    * base name. */
  private def ensureMergeBase(spark: SparkSession, dir: String): String = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_mrg_orders_${Relational.dirSlug(dir)}_$fp"
    graft.store.Snapshots.ensureVersions(spark, base, Seq(
      () => keyedOrders(spark, dir),
      () => graft.store.Snapshots.mergeApplyOf(
        graft.store.Snapshots.readVersion(spark, base,
          graft.store.Snapshots.latest(spark, base).get),
        ordersChangeBatch(spark, dir), Seq("k"))))
    base
  }

  /** MERGE driven from SQL TEXT (`q_sql_merge`, round-15 verdict #7):
    * the store's mutation surface expressed the way a SQL-first user
    * would write it — the pre-merge version read by the store's own
    * coordinates through the `graft_version(base, v)` TVF, the
    * deterministic change batch derived in SQL, and the MERGE semantics
    * applied as the SAME two-branch shape the engine's write path uses
    * (one LEFT ANTI join dropping touched keys + UNION ALL of the
    * upserts — `WHEN MATCHED THEN UPDATE/DELETE, WHEN NOT MATCHED THEN
    * INSERT`), then summarized into the exact [[mergeSummary]] grid.
    * Output is bit-identical to `q_snap_merge` by construction, so the
    * ONE `snapMergeSql` twin hash-pins the SQL-text merge application
    * alongside all three engine write paths; [[LayoutSpec]] additionally
    * pins SQL-vs-DataFrame equality directly. Scale shape: identical to
    * the engine path — one anti-join + narrow unions + one full-outer
    * feed join; Catalyst compiles both to the same operators. */
  def sqlMergeSummary(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureMergeBase(spark, dir)
    graft.functions.GraftFunctions.register(spark)
    val v1 = graft.store.Snapshots.versions(spark, base).head
    val (addM, chgM, remM) = Validate.snapshotDiffMods
    spark.sql(
      s"""WITH v1 AS (SELECT k, prio, cents FROM graft_version('$base', $v1)),
         |changes AS (
         |  SELECT k, prio, cents * 110L DIV 100L AS cents,
         |    'upsert' AS _op
         |  FROM v1 WHERE k % $chgM = 0 AND k % $remM <> 0
         |  UNION ALL
         |  SELECT -(k + 1) AS k, prio, cents, 'upsert' FROM v1
         |  WHERE k % $addM = 0
         |  UNION ALL
         |  SELECT k, prio, cents, 'delete' FROM v1 WHERE k % $remM = 0),
         |touched AS (SELECT DISTINCT k FROM changes),
         |v2 AS (
         |  SELECT o.k, o.prio, o.cents
         |  FROM v1 o LEFT ANTI JOIN touched t ON o.k = t.k
         |  UNION ALL
         |  SELECT k, prio, cents FROM changes WHERE _op = 'upsert'),
         |j AS (
         |  SELECT o.prio AS op, o.cents AS oc, n.prio AS np, n.cents AS nc,
         |    CASE WHEN o.k IS NULL THEN 'insert'
         |         WHEN n.k IS NULL THEN 'delete'
         |         WHEN o.prio IS DISTINCT FROM n.prio
         |           OR o.cents IS DISTINCT FROM n.cents THEN 'update'
         |         ELSE 'same' END AS t
         |  FROM v1 o FULL OUTER JOIN v2 n ON o.k = n.k)
         |SELECT 'delete' AS change_type, count(*) AS n_rows,
         |  coalesce(CAST(sum(oc) AS BIGINT), 0L) AS total_cents
         | FROM j WHERE t = 'delete'
         |UNION ALL
         |SELECT 'insert', count(*), coalesce(CAST(sum(nc) AS BIGINT), 0L)
         | FROM j WHERE t = 'insert'
         |UNION ALL
         |SELECT 'update_preimage', count(*),
         |  coalesce(CAST(sum(oc) AS BIGINT), 0L)
         | FROM j WHERE t = 'update'
         |UNION ALL
         |SELECT 'update_postimage', count(*),
         |  coalesce(CAST(sum(nc) AS BIGINT), 0L)
         | FROM j WHERE t = 'update'
         |UNION ALL
         |SELECT 'v2_state', count(*), coalesce(CAST(sum(cents) AS BIGINT), 0L)
         | FROM v2
         |ORDER BY change_type""".stripMargin)
  }

  /** Row-grain keyed orders (exact integer cents) — the MERGE fixtures'
    * shared target shape. */
  private def keyedOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))

  /** The deterministic change batch shared by the copy-on-write and
    * merge-on-read MERGE fixtures: the [[Validate.snapshotDiffMods]]
    * pmod families as updates (+10% cents), inserts (negative mirror
    * keys), and deletes. */
  private def ordersChangeBatch(spark: SparkSession, dir: String): DataFrame = {
    val (addM, chgM, remM) = Validate.snapshotDiffMods
    val o = keyedOrders(spark, dir)
    val updates = o
      .where(pmod(col("k"), lit(chgM)) === 0 &&
        pmod(col("k"), lit(remM)) =!= 0)
      .select(col("k"), col("prio"),
        expr("cents * 110L div 100L").as("cents"), lit("upsert").as("_op"))
    val inserts = o.where(pmod(col("k"), lit(addM)) === 0)
      .select((-(col("k") + 1)).as("k"), col("prio"), col("cents"),
        lit("upsert").as("_op"))
    val deletes = o.where(pmod(col("k"), lit(remM)) === 0)
      .select(col("k"), col("prio"), col("cents"), lit("delete").as("_op"))
    updates.unionByName(inserts).unionByName(deletes)
  }

  /** Change-feed class counts/cents between two states plus the merged
    * state totals — the shared declared-output shape of `q_snap_merge`
    * and `q_snap_merge_mor`. A dense change-type grid keeps an empty
    * class as a zero row (the twin's per-class aggregates always emit
    * one row each). */
  private def mergeSummary(spark: SparkSession, v1: DataFrame,
                           v2: DataFrame): DataFrame = {
    val grid = spark.range(1).select(explode(array(
      Seq("delete", "insert", "update_preimage", "update_postimage")
        .map(lit): _*)).as("change_type"))
    val byType = grid.join(
        graft.store.Snapshots
          .changeFeedOf(v1, v2, Seq("k"), Seq("prio", "cents"))
          .groupBy(col("change_type"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("c")),
        Seq("change_type"), "left")
      .select(col("change_type"),
        coalesce(col("n"), lit(0L)).as("n_rows"),
        coalesce(col("c"), lit(0L)).as("total_cents"))
    val state = v2
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("cents")), lit(0L)).as("total_cents"))
      .select(lit("v2_state").as("change_type"), col("n_rows"),
        col("total_cents"))
    byType.unionByName(state).orderBy(col("change_type"))
  }

  /** Oracle-SQL token the Verify main substitutes with the ARRIVAL
    * version's absolute data directory of the file-stats fixture (and
    * its compacted sibling) — resolved at dump time because the base
    * name carries the corpus fingerprint. */
  val fstatsV1Token = "__GRAFT_FSTATS_V1__"
  val fstatsV2Token = "__GRAFT_FSTATS_V2__"

  /** Files in the file-stats fixture's arrival layout / compacted
    * layout. */
  val fstatsArrivalFiles = 16
  val fstatsCompactFiles = 4

  /** Seed (create-once) the file-stats fixture: version 1 = keyed orders
    * `(o_orderkey, day)` written as [[fstatsArrivalFiles]] files cut by
    * INGEST sequence (order-key ranges — every file's day envelope spans
    * ~the whole range, the incrementally-grown shape), then ONE real
    * [[compactSnapshot]] by `day` into [[fstatsCompactFiles]] files.
    * Returns the base name. Racing seeders may publish a duplicate
    * compacted version; the declared query always reads the FIRST and
    * LAST committed versions, whose contents are identical either way. */
  private def ensureFileStatsBase(spark: SparkSession, dir: String): String = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_fstats_${Relational.dirSlug(dir)}_$fp"
    graft.store.Snapshots.ensureVersions(spark, base, Seq(
      () => clusteredBy(ordersDims(spark, dir), col("o_orderkey"),
        fstatsArrivalFiles)))
    if (graft.store.Snapshots.latest(spark, base).contains(1L)) {
      val n = graft.store.Snapshots.readVersion(spark, base, 1L).count()
      compactSnapshot(spark, base, col("day"),
        (n + fstatsCompactFiles - 1) / fstatsCompactFiles)
    }
    base
  }

  /** The (arrival, compacted) version data directories of the seeded
    * file-stats fixture — the paths the DuckDB twin scans. Seeds the
    * fixture if needed. */
  def fileStatsVersionDirs(spark: SparkSession, dir: String): (String, String) = {
    val base = ensureFileStatsBase(spark, dir)
    val vs = graft.store.Snapshots.versions(spark, base)
    (graft.store.Snapshots.versionPath(spark, base, vs.head),
      graft.store.Snapshots.versionPath(spark, base, vs.last))
  }

  /** REAL per-file zone-map stats off the parquet FOOTERS of one stored
    * snapshot version: (file, footer row count, footer min/max of `day`)
    * — the file-level stats index production pruning actually reads
    * (Iceberg manifests / Delta file stats), not a model. One footer
    * read per file on the planner — O(files) metadata, no data I/O; at
    * scale these rows are collected by the write tasks and PUBLISHED as
    * a stats table, and this reader is the audit that the published
    * stats match the physical files. */
  private def footerDayStats(spark: SparkSession, path: String)
      : Seq[(String, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val hfs = p.getFileSystem(conf)
    hfs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .flatMap { s =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(s.getPath, conf))
        try {
          val blocks = rd.getFooter.getBlocks.asScala.toSeq
          val rows = blocks.map(_.getRowCount).sum
          val stats = blocks.flatMap(_.getColumns.asScala
            .find(_.getPath.toDotString == "day").map(_.getStatistics))
          if (rows == 0 || stats.isEmpty) None
          else Some((s.getPath.getName, rows,
            stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].toLong).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].toLong).max))
        } finally rd.close()
      }
  }

  /** DECLARED file-stats pruning audit (`q_layout_file_stats`, round-13
    * verdict #5): the REAL footer-derived per-file stats table of the
    * arrival vs compacted layouts, with the pruning decision a selective
    * 31-day predicate gets against each file's envelope. Unlike
    * [[compactionSkipAudit]] (an arithmetic 16-bin MODEL the twin
    * replays from raw orders), every row here comes from actual parquet
    * footers of stored snapshot files — and the DuckDB twin recomputes
    * each file's row count and day envelope FROM THE DATA of those same
    * files, so the hash check proves the footer statistics path agrees
    * with physical reality file by file. Arrival files (order-key cut)
    * all intersect the window; compacted files (day-clustered by a real
    * [[compactSnapshot]] run) prune to the matching slice. */
  def fileStatsAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (d1, d2) = fileStatsVersionDirs(spark, dir)
    val v1 = footerDayStats(spark, d1)
    val v2 = footerDayStats(spark, d2)
    val lo = v1.map(_._3).min + 100
    val hi = lo + 30
    (v1.map(r => (1L, r._1, r._2, r._3, r._4)) ++
      v2.map(r => (2L, r._1, r._2, r._3, r._4)))
      .toDF("version", "file", "n_rows", "min_day", "max_day")
      .withColumn("hit",
        (col("max_day") >= lo && col("min_day") <= hi).cast("long"))
      .orderBy(col("version"), col("file"))
  }

  /** MERGE-ON-READ as a versioned snapshot (`q_snap_merge_mor`, round-13
    * verdict #1): the SAME deterministic change batch as `q_snap_merge`,
    * but published through [[graft.store.Snapshots.publishDelta]] as a
    * LIGHTWEIGHT delta version — the write costs O(change batch), not a
    * full-table rewrite — and reconciled lazily at read time by
    * [[graft.store.Snapshots.readVersionMerged]] (the Iceberg
    * merge-on-read recipe: one anti-join + union per stacked delta, with
    * [[compactSnapshot]] as the materialize step). The declared frame is
    * bit-identical to the copy-on-write `q_snap_merge` state by
    * construction — same feed classes, same merged totals — so ONE twin
    * covers both write paths and the hash check proves write-path
    * equivalence end to end.
    *
    * Seeding is idempotent under racing seeders: applying the identical
    * validated batch as a second stacked delta reproduces the same
    * merged state (drop-touched + re-add is idempotent for identical
    * batches), so the declared output is stable whatever the race. */
  def mergeIntoSnapshotMoR(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_mor_orders_${Relational.dirSlug(dir)}_$fp"
    graft.store.Snapshots.ensureVersions(spark, base,
      Seq(() => keyedOrders(spark, dir)))
    if (graft.store.Snapshots.latest(spark, base).contains(1L))
      graft.store.Snapshots.publishDelta(spark,
        ordersChangeBatch(spark, dir), base, Seq("k"))
    val vs = graft.store.Snapshots.versions(spark, base)
    mergeSummary(spark,
      graft.store.Snapshots.readVersionMerged(spark, base, vs.head),
      graft.store.Snapshots.latestMerged(spark, base))
  }

  /** MERGE-ON-READ with POSITIONAL DELETION VECTORS (`q_snap_merge_dv`,
    * round-14 verdict #3): the SAME deterministic change batch as
    * `q_snap_merge`/`q_snap_merge_mor`, published through
    * [[graft.store.Snapshots.publishDeltaDV]] — the publish resolves the
    * touched keys to physical `(file, pos)` rows once (one column-pruned
    * key scan) and stores them as the version's deletion vector, so the
    * merged read is a union of live files minus ONE fixed-width
    * position anti-join, however deep the delta stack (the key-delta
    * path pays one wide-key anti-join PER stacked delta instead). The
    * declared frame is bit-identical to both siblings' state by
    * construction, so the one `snapMergeSql` twin hash-pins all THREE
    * write paths — copy-on-write, key-delta, and DV — to the same MERGE
    * semantics.
    *
    * Seeded create-once through [[graft.store.Snapshots.ensureHistory]]:
    * unlike the key-delta fixture (where a racing seeder's duplicate
    * delta is provably idempotent), two racing DV publishes whose
    * position scans miss each other's in-flight upsert files would stack
    * deltas that fail to supersede each other — so exactly one seeder
    * runs both steps and the loser waits for the committed history. */
  /** SCHEMA EVOLUTION COMPOSED WITH MERGE-ON-READ (`q_snap_schema_evo_dv`,
    * round-15 verdict #2): the store's two flagship read features —
    * id-resolved schema evolution ([[graft.store.Snapshots
    * .readVersionMapped]]) and DV-delta reconciliation
    * ([[graft.store.Snapshots.readVersionMerged]]) — exercised through
    * ONE read. History: v1 = keyed orders base, v2 = the shared
    * deterministic change batch as a POSITIONAL-DELETE delta, v3 = the
    * merged state republished with `cents` RENAMED to `amount_cents`
    * (declared, so the id is inherited through the delta's recorded
    * schema — the round-15 inheritance fix is on the hash path). The
    * declared frame reads the DV-STACKED state at v2 UNDER v3's evolved
    * schema: the reconcile is the one-position-anti-join merged plan,
    * and the projection surfaces v2's `cents` data as `amount_cents`
    * BY COLUMN ID — by-name resolution would read typed NULL and the
    * hash would break. The twin recomputes the merged state from raw
    * `orders` under the evolved name, so write fidelity, DV reconcile,
    * id inheritance across a delta, AND the mapped-over-merged read are
    * all pinned end to end. */
  def schemaEvolutionOverDV(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_sedv_orders_${Relational.dirSlug(dir)}_$fp"
    graft.store.Snapshots.ensureHistory(spark, base, Seq(
      () => { graft.store.Snapshots.publish(spark, keyedOrders(spark, dir),
        base); () },
      () => { graft.store.Snapshots.publishDeltaDV(spark,
        ordersChangeBatch(spark, dir), base, Seq("k")); () },
      () => { graft.store.Snapshots.publish(spark,
        graft.store.Snapshots.latestMerged(spark, base)
          .withColumnRenamed("cents", "amount_cents"), base,
        renames = Map("amount_cents" -> "cents")); () }))
    val vs = graft.store.Snapshots.versions(spark, base)
    graft.store.Snapshots.readVersionMapped(spark, base, vs(1), asOf = vs(2))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("amount_cents")).as("total_amount_cents"))
      .orderBy(col("prio"))
  }

  def mergeIntoSnapshotDV(spark: SparkSession, dir: String): DataFrame = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/orders.parquet")
    val base = s"graft_dv_orders_${Relational.dirSlug(dir)}_$fp"
    graft.store.Snapshots.ensureHistory(spark, base, Seq(
      () => { graft.store.Snapshots.publish(spark, keyedOrders(spark, dir),
        base); () },
      () => { graft.store.Snapshots.publishDeltaDV(spark,
        ordersChangeBatch(spark, dir), base, Seq("k")); () }))
    val vs = graft.store.Snapshots.versions(spark, base)
    mergeSummary(spark,
      graft.store.Snapshots.readVersionMerged(spark, base, vs.head),
      graft.store.Snapshots.latestMerged(spark, base))
  }
}
