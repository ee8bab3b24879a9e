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
}
