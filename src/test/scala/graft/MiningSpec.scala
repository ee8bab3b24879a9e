package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.{Materialize, Mining, Text}
import graft.sources.Tables

/** Pattern mining, incremental view maintenance, sparse retrieval. */
class MiningSpec extends SparkSpec {

  test("assoc rules: combination explode ≡ posting self-join; support invariants") {
    val rules = Mining.brandAssociationRules(spark, sf).cache()
    // invariants: pair support bounded by both item supports, confidences
    // in (0,1], ordered pair emitted once with a < b
    val bad = rules.where(
      col("n_ab") > col("n_a") || col("n_ab") > col("n_b") ||
        col("n_a") > col("n_baskets") || col("n_b") > col("n_baskets") ||
        col("conf_ab") <= 0 || col("conf_ab") > 1 ||
        col("conf_ba") <= 0 || col("conf_ba") > 1 ||
        col("a") >= col("b")).count()
    assert(bad === 0)
    // independent pair counts: plain distinct-items self-join (the
    // quadratic form the per-basket combination explode replaces) must
    // agree exactly on every pair support
    val items = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct().cache()
    val brute = items.select(col("basket"), col("item").as("a"))
      .join(items.select(col("basket"), col("item").as("b")), "basket")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab_brute"))
    val joined = rules.join(brute, Seq("a", "b"), "left")
    assert(joined.where(col("n_ab_brute").isNull ||
      col("n_ab") =!= col("n_ab_brute")).count() === 0)
    items.unpersist(); rules.unpersist()
  }

  test("incremental refresh ≡ full recompute, and the delta filter is pushed") {
    val inc = Materialize.incrementalRevenueRefresh(spark, sf)
    val full = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mo"),
        col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("rev"), count(lit(1)).as("n_orders"))
      .orderBy(col("mo"), col("o_orderpriority"))
    // exact decimal partials merge to the bit-identical full answer
    assert(inc.collect().toSeq === full.collect().toSeq)
    // the open-month delta predicate reaches the parquet scan as a
    // pushed filter (row-group skipping; partition pruning on a
    // date-partitioned lake table)
    val cut = Materialize.cutoffMonthStart(spark, sf)
    val delta = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lit(cut))
    val plan = delta.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"delta scan did not push the cutoff predicate:\n$plan")
  }

  test("sparse sim: returned counts equal per-pair rare-shingle intersections") {
    val top = Text.sparseSimilarPairs(spark, sf).cache()
    assert(top.count() > 0) // fixture is live at sf0.001 too
    assert(top.where(col("doc_a") >= col("doc_b")).count() === 0)
    // recompute each returned pair's shared-rare-shingle count from the
    // corpus by brute intersection (no df prune on the pair side — the
    // prune must only ever REMOVE common shingles, which both sides of
    // the intersection lack by definition of rare)
    // hashed shingle space, recomputed DECLARATIVELY (the lambda
    // poly-hash fold + scalar combines — a different implementation than
    // the native NGramHashes loop the engine runs, so this doubles as a
    // bit-identity cross-check of the native expression)
    val n = Text.sparseSimShingleWords
    // WIDE key, built from n (not a hand-written 4-term chain): both
    // rolling folds over the window, combined h1·P + h2 — the
    // NGramHashesWide arithmetic, recomputed with scalar Columns
    def foldN(m: Long, terms: Seq[Column]): Column =
      terms.tail.foldLeft(terms.head)((acc, h) =>
        (acc * m + h) % graft.ops.Dedup.P)
    def wideKey(i: Column): Column = {
      val terms = (0 until n).map(j => element_at(col("th"), i + j))
      foldN(graft.ops.Dedup.shingleMult, terms) * graft.ops.Dedup.P +
        foldN(graft.ops.Dedup.shingleMult2, terms)
    }
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), transform(Text.tokens(col("text")),
        t => graft.ops.Dedup.polyHash(t)).as("th"))
      .where(size(col("th")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("th")) - (n - 1)),
          i => wideKey(i)))).as("s"))
    val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= Text.sparseSimDfCap)
      .select(col("s"))
    val p = sh.join(rare, Seq("s"), "left_semi")
    val brute = p.select(col("s"), col("doc_id").as("doc_a"))
      .join(p.select(col("s"), col("doc_id").as("doc_b")), "s")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_brute"))
    val joined = top.join(brute, Seq("doc_a", "doc_b"), "left")
    assert(joined.where(col("n_brute").isNull ||
      col("n_shared") =!= col("n_brute")).count() === 0)
    top.unpersist()
  }

  test("ER clusters: edges collapse to one label, rep is the component min") {
    val lab = Mining.entityClusters(spark, sf).cache()
    val edges = graft.ops.Text.sparseCandidatePairs(spark, sf).cache()
    assert(lab.count() > 0 && edges.count() > 0)
    // every edge's endpoints carry the SAME representative (the defining
    // property of a correct contraction), and every matched doc is labeled
    val la = lab.select(col("doc_id").as("doc_a"), col("cluster_rep").as("ra"))
    val lb = lab.select(col("doc_id").as("doc_b"), col("cluster_rep").as("rb"))
    val e = edges.join(la, Seq("doc_a"), "left").join(lb, Seq("doc_b"), "left")
    assert(e.where(col("ra").isNull || col("rb").isNull ||
      col("ra") =!= col("rb")).count() === 0)
    // the representative is the component minimum and labels itself
    assert(lab.where(col("cluster_rep") > col("doc_id")).count() === 0)
    val reps = lab.select(col("cluster_rep")).distinct()
    val selfLabeled = lab.where(col("doc_id") === col("cluster_rep"))
      .select(col("cluster_rep"))
    assert(reps.exceptAll(selfLabeled).count() === 0)
    lab.unpersist(); edges.unpersist()
  }
}
