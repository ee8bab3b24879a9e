package graft

import org.apache.spark.sql.functions._

import graft.ops.Privacy
import graft.sources.Tables

class PrivacySpec extends SparkSpec {

  test("k-anonymity: export groups all meet k, suppression accounts for every row") {
    val audit = Privacy.kAnonymityAudit(spark, sf).cache()
    val export = Privacy.anonymizedExport(spark, sf).cache()
    val nCust = Tables.customer(spark, sf).count()
    // the audit partitions the dimension: group sizes sum to the row count
    assert(audit.agg(sum("group_n")).collect().head.getLong(0) === nCust)
    // every group the EXPORT contains meets k (k-anonymity by construction)
    val exportGroups = export
      .groupBy("c_mktsegment", "bal_bin")
      .agg(count(lit(1)).as("n")).collect()
    assert(exportGroups.nonEmpty)
    exportGroups.foreach(r =>
      assert(r.getAs[Long]("n") >= Privacy.kAnon,
        s"export leaked a group of ${r.getAs[Long]("n")}"))
    // suppressed mass = audit rows failing k; export + suppressed = total
    val suppressed = audit.where(col("meets_k") === 0)
      .agg(coalesce(sum("group_n"), lit(0L))).collect().head.getLong(0)
    assert(export.count() + suppressed === nCust)
    // pseudonyms are injective at this scale (no hash collisions) and
    // the export drops the raw identifier columns entirely
    assert(export.select("pseudonym").distinct().count() === export.count())
    assert(!export.columns.contains("c_name") &&
      !export.columns.contains("c_custkey") &&
      !export.columns.contains("c_acctbal"))
    audit.unpersist(); export.unpersist()
  }

  test("pseudonym and bin arithmetic equal a driver-side replay") {
    val P = graft.ops.Dedup.P
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
    // the wide two-fold pseudonym: forward fold · P + reversed fold
    def ph(s: String): Long = fold(s) * P + fold(s.reverse)
    val raw = Tables.customer(spark, sf)
      .select("c_name", "c_acctbal").limit(50).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val export = Privacy.anonymizedExport(spark, sf)
      .select("pseudonym", "bal_bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val audit = Privacy.kAnonymityAudit(spark, sf)
      .select("bal_bin").distinct().collect().map(_.getLong(0)).toSet
    raw.foreach { case (name, bal) =>
      val pseud = ph(name)
      val bin = math.floor(
        math.floor(bal * 100 + 0.5) / Privacy.balBinCents.toDouble).toLong
      assert(audit.contains(bin), s"bin $bin missing from audit")
      // a suppressed customer is absent; a present one must carry the
      // replayed bin
      export.get(pseud).foreach(b => assert(b === bin,
        s"bin mismatch for $name: got $b want $bin"))
    }
  }

  test("erasure: partition exact, cascade equals a driver replay, erased really gone") {
    val P = graft.ops.Dedup.P
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment", "c_acctbal", "c_name").collect()
    val requests = cust.filter(r => fold(r.getString(3)) % Privacy.erasureMod == 0)
      .map(_.getLong(0)).toSet
    assert(requests.nonEmpty, "planted residue matched no customer at this SF")
    val out = Privacy.erasureAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // erased + kept partitions the dimension, per segment and in total
    val bySeg = cust.groupBy(_.getString(1))
    bySeg.foreach { case (seg, rows) =>
      val e = rows.count(r => requests(r.getLong(0)))
      val r = out(seg)
      assert(r.getAs[Long]("n_erased") === e.toLong, s"$seg erased")
      assert(r.getAs[Long]("n_kept") === (rows.length - e).toLong, s"$seg kept")
      val cents = rows.filter(x => requests(x.getLong(0)))
        .map(x => math.floor(x.getDouble(2) * 100 + 0.5).toLong).sum
      assert(r.getAs[Long]("erased_bal_cents") === cents, s"$seg cents")
    }
    // FK cascade equals the driver replay over orders
    val seg = cust.map(r => r.getLong(0) -> r.getString(1)).toMap
    val cascade = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0)).filter(requests)
      .groupBy(seg).view.mapValues(_.length.toLong).toMap
    out.foreach { case (sg, r) =>
      assert(r.getAs[Long]("n_erased_orders") === cascade.getOrElse(sg, 0L), sg)
    }
  }

  test("erasure apply: snapshot rewrite balances the audit, zero requested keys survive") {
    val audit = Privacy.erasureAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val out = Privacy.erasureApply(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val seg = r.getString(0)
      val a = audit(seg)
      // the rewrite moved EXACTLY the mass the audit promised, per segment
      assert(r.getAs[Long]("n_erased") === a.getAs[Long]("n_erased"), seg)
      assert(r.getAs[Long]("erased_bal_cents") ===
        a.getAs[Long]("erased_bal_cents"), seg)
      assert(r.getAs[Long]("n_orders_before") - r.getAs[Long]("n_orders_after")
        === a.getAs[Long]("n_erased_orders"), seg)
      assert(r.getAs[Long]("n_after") === a.getAs[Long]("n_kept"), seg)
      // the proof column: no requested key survives v2 via ANY join path
      assert(r.getAs[Long]("n_requested_surviving") === 0L, seg)
    }
    // v1 stayed a faithful pre-erasure snapshot: per-segment totals match
    // the raw dimension (auditable history, not a second rewrite)
    val raw = Tables.customer(spark, sf).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_before") === raw(r.getString(0)), r.getString(0))
    }
    // something was actually erased at this SF (the test isn't vacuous)
    assert(out.map(_.getAs[Long]("n_erased")).sum > 0)
  }
}
