package graft

import org.apache.spark.sql.functions._

import graft.ops.Validate
import graft.sources.Tables

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("constraint suite: one row per declared check, mixed verdicts") {
    val rows = Validate.constraintSuite(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Validate.constraintNames.sorted)
    val byName = rows.map(r => r.getString(0) ->
      (r.getDouble(1), r.getBoolean(3))).toMap
    // observed always a ratio
    byName.values.foreach { case (obs, _) =>
      assert(obs >= 0.0 && obs <= 1.0) }
    // the synthetic lineitem's (orderkey, linenumber) pair is NOT unique
    // — the suite must report that as a failed check, completeness and
    // range checks as passed
    assert(!byName("uniqueness:l_orderkey,l_linenumber")._2)
    assert(!byName("uniqueness:l_orderkey")._2)
    assert(byName("completeness:l_orderkey") === ((1.0, true)))
    assert(byName("range:l_quantity>0")._2)
    assert(byName("domain:l_returnflag{A,N,R}")._2)
  }

  test("constraint suite: two Expand-free passes, uniqueness scan pruned to keys") {
    val qe = Validate.constraintSuite(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    // the previous two-distinct single aggregate tripled every fact row
    // through an Expand; the split shape must never reintroduce one
    assert(!plan.contains("Expand"), s"Expand reappeared in:\n$plan")
    val scans = "lineitem\\.parquet".r.findAllIn(plan).size
    assert(scans === 2, s"expected two lineitem scans, got $scans")
    // the uniqueness pass reads ONLY the two key columns
    val pruned = qe.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.toSeq ==
          Seq("l_orderkey", "l_linenumber") => f
    }
    assert(pruned.nonEmpty,
      s"no key-pruned uniqueness scan in:\n${qe.sparkPlan}")
  }

  test("refint: clean star schema has zero orphans on every edge") {
    val rows = Validate.refIntegrity(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)} orphans")
      assert(r.getDouble(3) === 0.0)
      assert(r.getLong(1) > 0L)
    }
    // denominators match the actual table sizes
    val byRel = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRel("lineitem.l_orderkey->orders") ===
      Tables.lineitem(spark, sf).count())
    assert(byRel("orders.o_custkey->customer") ===
      Tables.orders(spark, sf).count())
  }

  test("refint: one lineitem scan, outer-join on distinct keys, no anti join") {
    val plan = Validate.refIntegrity(spark, sf)
      .queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(plan).size === 1)
    // the dangling check must stay a LEFT OUTER over the aggregated key
    // frame — an anti join here means Catalyst pushed it onto raw rows
    assert(!plan.contains("LeftAnti"))
  }

  test("refint: detects injected dangling and null FKs") {
    val fact = Seq((1L, Some(10L)), (2L, Some(11L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val r = Validate.refIntegrityOf(
      facts = Seq((fact, Seq(("f->d", "fk")))),
      dims = Seq(("f->d", dim, "pk"))).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 4L)      // fact_rows
    assert(r.head.getLong(2) === 2L)      // the 99L and the null
    assert(r.head.getDouble(3) === 0.5)
  }

  test("ks: identical distributions score 0, disjoint score 1") {
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i % 5), ("b", i % 5))).toDF("src", "v")
    val ksSame = Validate.ksBySource(same, "src", "v").collect()
    ksSame.foreach(r => assert(r.getDouble(3) === 0.0))
    val disjoint = ((1 to 40).map(i => ("a", i % 4)) ++
      (1 to 40).map(i => ("b", 100 + i % 4))).toDF("src", "v")
    val ksDis = Validate.ksBySource(disjoint, "src", "v").collect()
    ksDis.foreach(r => assert(r.getDouble(3) === 1.0))
  }

  test("ks: single source yields null, never 0/0") {
    val solo = (1 to 10).map(i => ("only", i)).toDF("src", "v")
    val r = Validate.ksBySource(solo, "src", "v").collect()
    assert(r.length === 1)
    assert(r.head.isNullAt(3))
    assert(r.head.getLong(2) === 0L)
  }

  test("ks: high-cardinality continuous column pre-bins to a bounded grid") {
    // 20k distinct doubles over two shifted sources — unguarded, the
    // source x value ECDF grid would be 2 x 20k; the guard pre-bins to
    // ksMaxGridValues equi-width buckets (round-9 verdict #5)
    val rnd = new scala.util.Random(5)
    val cont = ((1 to 10000).map(i => ("a", rnd.nextDouble())) ++
      (1 to 10000).map(i => ("b", 0.5 + rnd.nextDouble()))).toDF("src", "v")
    assert(cont.select("v").distinct().count() > Validate.ksMaxGridValues)
    val rows = Validate.ksBySource(cont, "src", "v").collect()
    assert(rows.length === 2)
    // the binned sup evaluates the same ECDF difference at bin edges — a
    // subset of the raw evaluation points — so it approximates the exact
    // empirical KS from below, closely (1024 bins) but never over it
    val exact = Validate.ksBySource(cont, "src", "v",
      maxGridValues = Int.MaxValue).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      val (ks, raw) = (r.getDouble(3), exact(r.getString(0)))
      assert(ks <= raw + 1e-6, s"binned KS $ks over-reports raw $raw")
      assert(ks >= raw - 0.05, s"binned KS $ks too far below raw $raw")
      assert(ks > 0.4, s"binned KS $ks lost the planted drift")
    }
    // identical high-cardinality distributions still score ~0 binned
    val seq = (1 to 10000).map(_ => rnd.nextDouble() * 3.0)
    val same = (seq.map(("a", _)) ++ seq.map(("b", _))).toDF("src", "v")
    Validate.ksBySource(same, "src", "v").collect()
      .foreach(r => assert(r.getDouble(3) === 0.0))
    // the guard is a no-op below the bound: raising it on the declared
    // doc-length input changes nothing (the q_valid_ks_drift checksum
    // path is the unbinned one)
    val a = Validate.ksDrift(spark, sf).collect().map(_.toString).toSeq
    val b = Validate.ksBySource(Tables.documents(spark, sf), "source",
      "n_chars", maxGridValues = Int.MaxValue).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("ks drift on documents: stats in [0,1], totals partition corpus") {
    val rows = Validate.ksDrift(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === total)
      val ks = r.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0)
    }
  }

  test("freshness: freshest source reads zero, staleness nonnegative, counts conserve") {
    val rows = Validate.freshness(spark, sf).collect()
    assert(rows.map(_.getLong(3)).min === 0L)
    rows.foreach(r => assert(r.getLong(3) >= 0L))
    assert(rows.map(_.getLong(1)).sum ===
      Tables.events(spark, sf).count())
  }

  test("snapshot diff rows: classifies added/removed/changed/unchanged, null-safe") {
    val oldDf = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None),
      (4L, Some(40.0))).toDF("k", "v")
    val newDf = Seq((1L, Some(10.0)), (2L, Some(21.0)), (3L, None),
      (5L, Some(50.0))).toDF("k", "v")
    val got = Validate.snapshotDiffRows(oldDf, newDf, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged",                   // null <=> null: not a change
      4L -> "removed", 5L -> "added"))
  }

  test("snapshot diff query: counts match the construction rule") {
    val (addM, chgM, remM) = Validate.snapshotDiffMods
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val want = Map(
      "added" -> keys.count(_ % addM == 0).toLong,
      "removed" -> keys.count(_ % remM == 0).toLong,
      "changed" -> keys.count(k => k % chgM == 0 && k % addM != 0).toLong,
      "unchanged" -> keys.count(k =>
        k % addM != 0 && k % chgM != 0).toLong)
    val got = Validate.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want.filter(_._2 > 0))
  }

  test("cdc apply: merge arithmetic matches a driver-side replay") {
    val (addM, chgM, remM) = Validate.snapshotDiffMods
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // replay the merge imperatively: base minus deletes/update-olds,
    // plus update-news, plus re-keyed inserts
    val applied =
      rows.filter { case (k, _, _) => k % remM != 0 && k % chgM != 0 } ++
        rows.filter { case (k, _, _) => k % chgM == 0 && k % remM != 0 }
          .map { case (k, p, c) => (k, p, c * 110 / 100) } ++
        rows.filter { case (k, _, _) => k % addM == 0 }
          .map { case (k, p, c) => (-(k + 1), p, c) }
    val want = applied.groupBy(_._2).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val got = Validate.cdcMergeApply(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    // the update branch really changed values somewhere
    assert(rows.exists { case (k, _, _) => k % chgM == 0 && k % remM != 0 })
  }

  test("benford: dense 9-digit grid, fractions sum to 1, hot on synthetic data") {
    val rows = Validate.benfordScreen(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9))
    val obsSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, s"sum $obsSum")
    val expSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(expSum - 1.0) < 1e-4)
    // synthetic near-uniform leading digits: the screen must read hot
    // (digit 1 carries ~30% expectation but ~15% mass)
    val chi2 = rows.map(_.getDouble(4)).sum
    assert(chi2 > 100.0, s"chi2 $chi2")
    rows.foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("consistency audit: buckets partition the orders, invariant honestly broken") {
    val r = Validate.consistencyAudit(spark, sf).collect().head
    val (n, childless, w1, w10, beyond) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n === Tables.orders(spark, sf).count())
    val expectedChildless = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(childless === expectedChildless)
    assert(childless + w10 + beyond === n)   // buckets partition
    // independent recompute of the 1% bucket, like the childless check
    val one = lit(1).cast("decimal(3,2)")
    val recomputed = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (one + col("l_tax").cast("decimal(4,2)")) *
        (one - col("l_discount").cast("decimal(4,2)"))).as("rc"))
    val expectedW1 = Tables.orders(spark, sf)
      .join(recomputed, col("o_orderkey") === col("l_orderkey"))
      .where(abs(col("o_totalprice").cast("decimal(18,2)") - col("rc"))
        .cast("double") / col("o_totalprice") < 0.01).count()
    assert(w1 === expectedW1)
    // the synthetic generator never enforced the invariant — the audit
    // must say so, not paper over it
    assert(beyond > 0)
    assert(r.getDouble(5) > 0.0)
  }

  test("doc expectation suite: all green on the corpus, cross-field check included") {
    val rows = Validate.docChecks(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Validate.docCheckDefs.map(_._1).sorted)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} failed")
      assert(r.getDouble(1) === 1.0)
    }
  }

  test("plan shapes: benford and consistency each scan their facts once") {
    val bPlan = Validate.benfordScreen(spark, sf)
      .queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(bPlan).size === 1)
    val cPlan = Validate.consistencyAudit(spark, sf)
      .queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(cPlan).size === 1)
    assert("orders\\.parquet".r.findAllIn(cPlan).size === 1)
  }

  test("write-audit-publish: green load promotes, red load stays staged") {
    val dir = java.nio.file.Files.createTempDirectory("wap").toString
    val target = s"$dir/table"
    val checks = Seq(
      ("range:v>0", col("v") > 0),
      ("completeness:v", col("v").isNotNull))
    // green: publishes, staging promoted away
    def stagingDirs() = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("table.staging-"))
    val good = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val (ok1, rep1) = Validate.writeAuditPublish(spark, good, target, checks)
    assert(ok1 && rep1.collect().forall(_.getBoolean(3)))
    assert(spark.read.parquet(target).count() === 2)
    assert(stagingDirs() === 0)          // promoted away
    // red: violating rows stay OUT of the published table, staged for
    // inspection; the previous publish is untouched
    val bad = Seq((3L, -1.0), (4L, 30.0)).toDF("k", "v")
    val (ok2, rep2) = Validate.writeAuditPublish(spark, bad, target, checks)
    assert(!ok2)
    val byName = rep2.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(byName("range:v>0") === ((0.5, false)))
    assert(byName("completeness:v")._2)
    assert(spark.read.parquet(target).count() === 2)   // old publish intact
    assert(stagingDirs() === 1)          // retained for inspection
    // empty load: reads red (observed null, passed false), never a
    // vacuous pass or an NPE; the publish is still untouched
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      good.schema)
    val (ok3, rep3) = Validate.writeAuditPublish(spark, empty, target, checks)
    assert(!ok3)
    rep3.collect().foreach { r =>
      assert(r.isNullAt(1))
      assert(!r.getBoolean(3))
    }
    assert(spark.read.parquet(target).count() === 2)
  }

  test("q_valid_wap: declared gate publishes the profile and reports green") {
    val rep = Validate.wapGate(spark, sf).collect()
    assert(rep.length === Validate.wapCheckDefs.length)
    assert(rep.map(_.getString(0)).sorted
      === Validate.wapCheckDefs.map(_._1).sorted.toArray)
    rep.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} failed")
      assert(r.getBoolean(4), "published must be true on a green load")
    }
  }

  test("audit gate is exact, not rounded: one violation in many rows reads red") {
    // 2,000,001 rows, one violating: the 6dp-rounded ratio reads 1.0
    // but the verdict must compare exact counts
    val df = spark.range(0, 2000001).select(
      when(col("id") === 0, -1.0).otherwise(1.0).as("v"))
    val report = Validate.auditChecks(df, Seq(("range:v>0", col("v") > 0)))
      .collect().head
    assert(report.getDouble(1) === 1.0)   // rounded ratio saturates
    assert(!report.getBoolean(3), "exact verdict must still be red")
  }

  test("anomaly: a spiked day is flagged, warmup days are not scored") {
    // 7 flat days then a 10x spike on day 8: z = (100-10)/0 is degenerate
    // (constant window, vr=0 -> null); use slight jitter so sigma > 0
    val daily = (1 to 7).map(d => ("t", f"2024-01-0$d", 10L + (d % 2))) :+
      (("t", "2024-01-08", 100L)) :+ (("t", "2024-01-09", 10L))
    val r = Validate.anomalyScores(daily.toDF("grp", "day", "n"))
      .collect().map(x => x.getString(1) ->
        (Option(x.get(4)).map(_.toString.toDouble), x.getBoolean(5))).toMap
    (1 to 7).foreach(d => assert(r(f"2024-01-0$d") === ((None, false))))
    val (z8, flag8) = r("2024-01-08")
    assert(flag8 && z8.get > 3.0, s"spike z=$z8")
  }

  test("anomaly: constant trailing window scores null, not 0/0") {
    val daily = ((1 to 7).map(d => ("t", f"2024-01-0$d", 5L)) :+
      (("t", "2024-01-08", 50L))).toDF("grp", "day", "n")
    val last = Validate.anomalyScores(daily).collect().last
    assert(last.isNullAt(4))            // z null despite the huge jump
    assert(!last.getBoolean(5))         // and not flagged
  }

  test("anomaly on events: every (type, day) scored once, full-window rows have mu") {
    val rows = Validate.dailyAnomaly(spark, sf).collect()
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    val w = Validate.anomalyWindow
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sortedDays = rs.sortBy(_.getString(1))
      // first w days unscored, the rest carry a trailing mean
      sortedDays.take(w).foreach(r => assert(r.isNullAt(3)))
      sortedDays.drop(w).foreach(r => assert(!r.isNullAt(3)))
    }
  }

  test("anomaly: a fully collapsed source scores its silent days as anomalies") {
    // group "dead" emits for 10 days then goes silent; group "alive"
    // keeps the corpus horizon open through day 20. Pre-densification
    // the dead group simply vanished from the monitor (round-5 ADVICE);
    // now every silent day up to the horizon is a scored n=0 row.
    val daily = ((1 to 10).map(d => ("dead", f"2024-01-$d%02d", 50L + d)) ++
      (1 to 20).map(d => ("alive", f"2024-01-$d%02d", 40L + d % 3)))
      .toDF("grp", "day", "n")
    val r = Validate.anomalyScores(Validate.densifyDays(daily)).collect()
    val dead = r.filter(_.getString(0) == "dead").sortBy(_.getString(1))
    assert(dead.length === 20, "grid must extend to the corpus horizon")
    val silent = dead.drop(10)
    silent.foreach(row => assert(row.getLong(2) === 0L))
    // the FIRST silent day scores against a healthy window: extreme
    // negative z, flagged. Later windows absorb the collapse (variance
    // inflates, then goes constant-zero -> null): never a positive z.
    assert(silent.head.getBoolean(5), "first silent day not flagged")
    assert(silent.head.getDouble(4) < -3.0)
    silent.foreach { row =>
      if (!row.isNullAt(4)) assert(row.getDouble(4) <= 0.0)
    }
    // a group born late is NOT padded before its first observed day
    val alive = r.filter(_.getString(0) == "alive")
    assert(alive.length === 20)
  }
}
