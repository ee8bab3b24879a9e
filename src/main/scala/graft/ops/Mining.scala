package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed pattern mining over the fact tables — the market-basket
  * association screen a feature platform runs to surface co-occurrence
  * features (Agrawal & Srikant, *Fast Algorithms for Mining Association
  * Rules*, VLDB 1994).
  *
  * Reference scope note: the reference (`src/main.py:7-48`) has no
  * mining surface; this pack is part of the extended large-scale
  * mandate, like dedup/similarity/text.
  */
object Mining {

  /** Relative minimum support for the frequent-item prune (Apriori
    * level 1): an item must appear in at least this fraction of baskets
    * before it may enter pair expansion. */
  val assocMinSupport = 0.01
  val assocTopK = 100

  /** Pairwise association rules over order baskets: items are part
    * brands, baskets are orders. Emits each unordered frequent pair once
    * with its exact support counts and both conditional confidences plus
    * lift, ranked by lift.
    *
    * Arithmetic: every support is an exact integer count; confidence and
    * lift are ONE double division over exact long products (n_ab·N and
    * n_a·n_b both stay far under 2^53, so the doubles are exact), then
    * the shared half-up 6dp rounding — bit-identical cross-engine, no
    * summation-order hazard anywhere.
    *
    * Scale shape (the Apriori skeleton): one pass over the fact table
    * builds distinct (basket, item) rows — the map-side-combined
    * `distinct` is the only corpus-sized shuffle. Frequent items are a
    * |items|-sized aggregate broadcast back as a semi-join, so
    * infrequent items never reach pair expansion (at partkey granularity
    * this prune is what keeps the pair space tractable). Pair generation
    * is per-basket: sort the basket's item set and explode its ordered
    * 2-combinations — O(k²) rows per basket with k ≤ |items|, never a
    * corpus self-join — and the pair aggregate collapses map-side into
    * at most |items|² rows. */
  def brandAssociationRules(spark: SparkSession, dir: String,
                            minSupport: Double = assocMinSupport,
                            topK: Int = assocTopK): DataFrame = {
    // ONE pass over the fact table, ONE corpus-sized shuffle: group
    // straight to per-basket item sets (collect_set dedups, partial
    // buffers are ≤|items| so the combine is map-side). The basket-set
    // frame is O(|baskets|) rows and feeds THREE consumers (universe
    // count, item supports, pair expansion) — pin it so the fact join
    // runs once, not three times (same pattern as the pagerank edge
    // set). Pinned with a LAZY persist rather than localCheckpoint
    // (round-14 verdict #2: every driver sample of this query ran ≥2x
    // its steady): the checkpoint's EAGER materialization is a full
    // extra write of the basket frame before the query proper starts,
    // and fresh-JVM isolation at sf0.1 measured checkpoint 2.9 s steady
    // vs cache 1.7 s vs no-pin 3.4 s (identical checksums) — the
    // round-13 floor of 2.10 s was exactly this materialization tax.
    // Lazy MEMORY_AND_DISK also keeps the lineage (executor loss
    // recomputes instead of failing the query) — the right trade on a
    // real cluster too.
    val basketSets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Hints.dimHint(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey").as("basket"))
      .agg(sort_array(collect_set(col("p_brand"))).as("its"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // one-row basket universe, carried as a broadcast scalar (no collect)
    val nBaskets = basketSets.agg(count(lit(1)).as("n_baskets"))

    // Apriori level 1: per-item support + the relative-support prune.
    // |items|-sized — broadcast back as the pair-expansion gate.
    val freq = basketSets.select(explode(col("its")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_i"))
      .crossJoin(broadcast(nBaskets))
      .where(col("n_i").cast("double") >= lit(minSupport) * col("n_baskets"))
      .select(col("item"), col("n_i"))

    // frequent-item prune WITHOUT re-exploding the baskets: the frequent
    // set folds to ONE array row (bounded by |items| — at partkey
    // granularity this becomes a semi-join on the exploded postings) and
    // array_intersect keeps each basket's frequent items, preserving the
    // sorted order of `its`
    val freqArr = freq.agg(sort_array(collect_list(col("item"))).as("fi"))

    // per-basket ordered 2-combinations of the (pruned) item set: for a
    // sorted array its, pair its[i] with every later element — struct
    // rows (a, b) with a < b, so each unordered pair counts exactly once
    val combos: Column = flatten(transform(col("itsp"), (x, i) =>
      transform(slice(col("itsp"), i + lit(2),
        greatest(size(col("itsp")) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    val pairs = basketSets
      .crossJoin(broadcast(freqArr))
      .select(array_intersect(col("its"), col("fi")).as("itsp"))
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))

    val fa = freq.select(col("item").as("a"), col("n_i").as("n_a"))
    val fb = freq.select(col("item").as("b"), col("n_i").as("n_b"))
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    pairs
      .join(broadcast(fa), "a").join(broadcast(fb), "b")
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_baskets"),
        r6(col("n_ab") / col("n_a")).as("conf_ab"),
        r6(col("n_ab") / col("n_b")).as("conf_ba"),
        r6((col("n_ab") * col("n_baskets")) / (col("n_a") * col("n_b")))
          .as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Entity resolution end-to-end: block → match → cluster. The rare-
    * shingle posting index yields high-precision candidate pairs
    * (blocking + match score in one bounded pass), and the shared
    * alternating large-star/small-star contraction
    * ([[Dedup.connectedComponents]], the same O(log n) machinery behind
    * `q_dedup_clusters`) collapses the match graph into entities labeled
    * by their minimum doc_id. Singletons don't appear — an unmatched
    * document IS its own entity, the standard convention this repo's
    * cluster surfaces share.
    *
    * Like cluster formation over the signature index, ER is SCHEDULED
    * work over a corpus version, so it reads the PUBLISHED posting index
    * ([[Text.ensureRarePostingIndex]]); the live tokenize→postings
    * pipeline stays measured by `q_text_sparse_sim`.
    *
    * Scale shape: edges are bounded by the posting df cap (O(Σ df²)),
    * the contraction shuffles only the edge set, and the label output is
    * O(matched docs) — nothing here rescans the corpus after the one
    * posting pass. */
  def entityClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(Text.sparseCandidatePairsPublished(spark, dir))
      .orderBy(col("doc_id"))
}
