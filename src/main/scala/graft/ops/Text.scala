package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis pack over the `documents` table — the LLM-data-pipeline
  * operators mandated beyond the reference surface (SURVEY.md §2.B [EXT]
  * text-analysis row): token stats, quality scoring, language-ID heuristic,
  * and document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` and higher-order array
  * functions — no UDFs — so plans stay whole-stage-codegen'd (HOF lambdas
  * are the one interpreted island) and each operator is a single shuffle.
  * At 100 TB the shapes hold: tokenization is a per-row map, the only wide
  * exchanges are the final group-bys on low-cardinality keys.
  */
object Text {

  /** Tokenizer: whitespace split, dropping empty segments. */
  def tokens(c: Column): Column = filter(split(c, " "), t => length(t) > 0)

  /** Global token frequencies, top 50 — tokenize → explode → count.
    * Scale: the explode inflates rows ~60× but partial aggregation
    * collapses them map-side; the shuffle carries only |vocab| rows per
    * task. */
  def tokenCounts(spark: SparkSession, dir: String, topN: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)

  /** Per-document token accounting three ways (SURVEY §2.B text-analysis
    * "token counting" item): whitespace tokens, regex word tokens
    * (`[a-z]+|[0-9]+` — identical RE2/Java semantics), and a BPE-ish
    * subword proxy (4-char chunks per token, the ⌈len/4⌉ fold). Pure
    * per-row projection — embarrassingly parallel at any scale. */
  def tokenAccounting(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(t).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
          .cast("long").as("n_re_tokens"),
        aggregate(t, lit(0L), (acc, tok) =>
          acc + ceil(length(tok) / lit(4.0)).cast("long")).as("n_subwords"))
      .orderBy(col("doc_id"))
  }

  /** Per-(lang, source) document statistics: doc counts, char/token
    * means, total token volume. One fused hash-agg. */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("source"))

  /** Stopword list used by the quality score (tiny by design: the corpus
    * vocabulary is engine words + {the, a}). */
  val stopwords: Seq[String] = Seq("the", "a")

  /** Per-document quality scoring — length, lexical diversity, stopword
    * ratio, mean token length, and a blended [0,1] score. The classic
    * pre-training corpus filter signals (Gopher/C4-style rules), computed
    * relationally so they run as one codegen'd projection per row.
    *
    * score = 0.4·diversity + 0.3·(1−stop_ratio) + 0.3·min(1, n_tokens/60)
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, dir))

  /** Core of [[qualityScore]] over any documents-shaped frame. Token-count
    * divisors go through `nullif` — an empty document must yield NULL
    * ratios (as the DuckDB oracle does for /0), not an ANSI
    * DIVIDE_BY_ZERO (Spark 4 default). */
  def qualityScoreOf(docs: DataFrame): DataFrame =
    qualityScoreRows(docs).orderBy(col("doc_id"))

  /** [[qualityScoreOf]] without the presentation sort — the form that
    * runs UNCHANGED on a streaming frame (stateless per-row projection;
    * streams reject sorts). Spec-asserted equal to the batch path on the
    * same corpus. */
  def qualityScoreRows(docs: DataFrame): DataFrame =
    withQuality(docs)
      .select(col("doc_id"), col("lang"), col("len_chars"), col("n_tokens"),
        col("n_distinct"), col("n_stop"), col("diversity"), col("stop_ratio"),
        col("quality"))

  /** Append the quality signals to ANY documents-shaped frame, preserving
    * the caller's columns — the composable form [[trainingCorpus]] and
    * the declared scorer build on (one definition of the score, so the
    * composition and the standalone query cannot drift). */
  def withQuality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = nullif(col("n_tokens"), lit(0L))
    docs
      .withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => array_contains(stopArr, t))).cast("long"))
      .drop("toks")
      .withColumn("diversity", round(col("n_distinct") / nTok, 6))
      .withColumn("stop_ratio", round(col("n_stop") / nTok, 6))
      .withColumn("quality", round(
        lit(0.4) * (col("n_distinct") / nTok) +
        lit(0.3) * (lit(1.0) - col("n_stop") / nTok) +
        lit(0.3) * least(lit(1.0), col("n_tokens") / lit(60.0)), 6))
  }

  /** THE end-to-end corpus materialization — the single declarative
    * statement that produces a training corpus from the raw documents
    * table by composing three declared operators in one Catalyst plan:
    * near-dup cluster keep-list ([[Dedup.dupClusters]] non-representatives
    * anti-joined away under a size-guarded hint — the drop list is
    * corpus-proportional on a real crawl, so [[Hints.dimHint]] hints only
    * while it fits, else the anti-join shuffles on doc_id),
    * quality floor ([[withQuality]] — same
    * score definition as the standalone query), and the content-keyed
    * train split ([[corpusSplit]]'s bucket rule). This is what "a user of
    * the reference could switch and run their pipeline" means in
    * practice: filter + anti-join + projection fuse over one documents
    * scan family, and every piece is individually oracle-checked
    * elsewhere — the composition is oracle-checked here. */
  def trainingCorpus(spark: SparkSession, dir: String,
                     minQuality: Double = 0.70): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val drop = Dedup.clusterDropList(spark, dir)
    val bucket =
      pmod(graft.functions.GraftFunctions.polyHash(col("text")), lit(10))
    withQuality(Tables.documents(spark, dir))
      .join(Hints.dimHint(drop), Seq("doc_id"), "left_anti")
      .where(bucket <= 7 && col("quality") >= minQuality)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language-marker profiles for the n-gram language-ID heuristic:
    * common function-word bigrams/trigrams per language (public-knowledge
    * frequency profiles). Counting is substring-occurrence based so the
    * exact same arithmetic runs in the DuckDB oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " die ", " und ", " ist "),
    "en" -> Seq(" the ", " a ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de ", " que "),
    "fr" -> Seq(" le ", " la ", " et ", " est "),
    "zh" -> Seq(" de5 ", " shi4 ", " le5 ", " zai4 "))

  /** #occurrences of `m` in `c` via replace-length arithmetic — identical
    * semantics on every SQL engine, unlike regex counting. Plain (non-
    * regex) `replace`: StringReplace is a codegen'd substring scan, where
    * the earlier `regexp_replace(Pattern.quote(m))` compiled and ran a
    * regex per marker per row — 20 regex passes per document, ~4× the
    * whole query's cost (round-3 perf pass). The oracle already counts
    * with plain `replace`. */
  private def countSubstr(c: Column, m: String): Column =
    (length(c) - length(call_function("replace", c, lit(m)))) / m.length

  /** Language-ID: argmax of marker-profile scores with fixed-order
    * tiebreak, reported as a (lang → predicted) confusion matrix.
    *
    * NB: the synthetic corpus shares one vocabulary across langs
    * (FIXTURES.md §B), so prediction *accuracy* is meaningless here — the
    * operator contract is determinism + plumbing; on real multilingual
    * text the same profile table does the real job.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val scored = Tables.documents(spark, dir).select(
      (col("lang") +: langMarkers.map { case (lang, ms) =>
        ms.map(countSubstr(padded, _)).reduce(_ + _).as(s"s_$lang")
      }): _*)
    // argmax with first-in-order winning ties (same CASE chain as oracle)
    val langs = langMarkers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), elseCol) =>
        val rest = langs.drop(i + 1)
        val isMax = rest.map(r => col(s"s_$lang") >= col(s"s_$r")).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("pred_lang", pred)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Top-k corpus bigram counts — the n-gram frequency primitive behind
    * tokenizer training and contamination screens.
    *
    * 100 TB shape (round-2 verdict item): the count aggregate runs on an
    * 8-byte combined token-hash key — each token is poly-hashed once and
    * consecutive hashes combine affinely, the same machinery as
    * [[Dedup.shingleHashes]] — so the wide shuffle carries longs, never
    * bigram *strings* (~10× narrower on a real corpus). The winning k
    * strings are then materialized candidates-only: a broadcast join of
    * the top-k hash keys back against the corpus occurrences. Selection
    * and presentation tiebreak is the bigram hash, which the DuckDB
    * oracle replays from the same constants (as it already does for
    * shingles), so the selected set cannot drift on count ties. The token
    * array is materialized in its own projection before the pairing
    * lambda reads it (the inlined form is the O(n²) trap documented on
    * `Dedup.shingled`). */
  def bigramCounts(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // <2-token docs: sequence(1, size-1) would count DOWN into index 0
    // (ANSI array-index error); the size guard keeps them out entirely
    val th = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= 2)
    def bh(i: Column): Column =
      Dedup.combine2(element_at(col("th"), i), element_at(col("th"), i + 1))
    val topk = th
      .select(explode(graft.functions.GraftFunctions.ngramHashes(
        col("th"), 2)).as("bh"))
      .groupBy(col("bh")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bh"))
      .limit(k)
    val occ = th
      .select(explode(transform(sequence(lit(1), size(col("th")) - 1), i =>
        struct(bh(i).as("bh"), concat_ws(" ",
          element_at(col("t"), i), element_at(col("t"), i + 1)).as("bg")))).as("o"))
      .select(col("o.bh").as("bh"), col("o.bg").as("bg"))
    // min(bg) pins one string per hash key even under a (cosmically
    // unlikely) hash collision — deterministically, on both engines
    occ.join(broadcast(topk), "bh")
      .groupBy(col("bh"), col("n")).agg(min(col("bg")).as("bigram"))
      .orderBy(col("n").desc, col("bh"))
      .select(col("bigram"), col("n"))
  }

  /** Per-document repetition signals — the Gopher-style duplication
    * filters a pre-training corpus runs alongside [[qualityScore]]:
    * `dup_tri_frac` is the fraction of 3-gram occurrences that repeat an
    * earlier 3-gram of the same document, `top_bigram_frac` the share of
    * the document occupied by its single most frequent bigram. High
    * values mark boilerplate/looping text.
    *
    * Scale: ONE scan and ZERO wide exchanges — both signals are pure
    * per-row array arithmetic over the hashed-token representation. The
    * top-bigram multiplicity is the longest equal-run in the *sorted*
    * per-doc bigram-hash array (equal hashes become adjacent), computed
    * by a single `aggregate` fold — no explode, no per-(doc, bigram)
    * shuffle, no join. (Two rejected shapes, for the record: an
    * explode + two-level aggregate paid a per-(doc,bh) shuffle and, via
    * `InferFiltersFromGenerate` + predicate pushdown, re-inlined the
    * whole tokenize/hash expression into a pushed filter — measured 7×
    * the cost; and a two-branch scan + doc_id join paid a second scan
    * and a sort-merge join.) The only exchange in the plan is the final
    * presentation sort. */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // longest run of equal values in a sorted array: fold carrying
    // (prev, current run, best run). -1 sentinel: hashes are mod-P ≥ 0.
    def longestRun(sorted: Column): Column =
      aggregate(sorted,
        struct(lit(-1L).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (st, x) => {
          val run = when(x === st.getField("prev"),
            st.getField("run") + lit(1L)).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(st.getField("best"), run).as("best"))
        },
        st => st.getField("best"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= 3)
      .select(col("doc_id"),
        (size(col("th")) - 2).cast("long").as("n_tri"),
        size(Dedup.combine3(col("th"))).cast("long").as("n_tri_distinct"),
        (size(col("th")) - 1).cast("long").as("n_bi"),
        longestRun(array_sort(graft.functions.GraftFunctions.ngramHashes(
          col("th"), 2))).as("top_bi"))
      .select(col("doc_id"), col("n_tri"), col("n_tri_distinct"),
        round((col("n_tri") - col("n_tri_distinct")) / col("n_tri"), 6)
          .as("dup_tri_frac"),
        round(col("top_bi") / col("n_bi"), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Length-outlier filter: keep documents whose token count lies inside
    * the corpus [lo, hi] percentile band — the standard "drop truncated
    * and runaway documents" quality gate. The percentile bounds row is
    * broadcast (never collected), so the whole gate is one extra
    * broadcast join over the scan. */
  def lengthFilteredStats(spark: SparkSession, dir: String,
                          lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    // plain split count (no empty-token filter): the corpus is
    // single-spaced, the oracle uses the identical definition, and the
    // codegen'd split+size avoids two interpreted higher-order filter
    // passes over every document (the gate scans the corpus twice:
    // bounds, then filter)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bounds = docs.agg(
      expr(s"percentile(n_tokens, $lo)").as("p_lo"),
      expr(s"percentile(n_tokens, $hi)").as("p_hi"))
    docs.crossJoin(broadcast(bounds))
      .where(col("n_tokens") >= col("p_lo") && col("n_tokens") <= col("p_hi"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"))
      .orderBy(col("lang"))
  }

  /** Benchmark decontamination: drop every document whose exact text
    * appears in a held-out set (stand-in here: doc_id ≡ 0 mod 100) — the
    * anti-join-by-content screen any training corpus runs against eval
    * sets. Scale: at 100 TB both sides join on `xxhash64(text)` (8-byte
    * keys) with a re-verify on collision; the text-equality form is kept
    * here so the oracle can replay it. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val bench = Tables.documents(spark, dir)
      .where(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("text").as("bench_text"))
    Tables.documents(spark, dir)
      .join(broadcast(bench), col("text") === col("bench_text"), "left_anti")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Fuzzy n-gram decontamination — the screen exact matching misses:
    * flag every corpus document sharing at least `minShared` distinct
    * hashed 3-gram shingles with ANY benchmark document (stand-in
    * benchmark: doc_id ≡ 0 mod 50). This is the published-corpus recipe
    * (the GPT-3 report's 13-gram overlap filter, Brown et al. 2020,
    * applied here at the 3-gram granularity the dedup pack already
    * hashes); paraphrased or partially-copied eval items survive an
    * exact anti-join but still collide on shingles.
    *
    * Scale shape: the benchmark side collapses to a DISTINCT shingle-key
    * set (eval suites are small — always broadcastable); the corpus side
    * explodes to (doc_id, shingle) longs and broadcast-hash-joins — all
    * codegen, no shuffle until the per-doc count. Per-doc shingle sets
    * are distinct, so the shared count is a plain `count(*)` after the
    * join. At 100 TB the corpus explode streams; nothing is ever
    * pairwise. */
  def decontaminateNgram(spark0: SparkSession, dir: String,
                         minShared: Int = 3): DataFrame = {
    // Conf surgery on a CLONED session (the bloom-join precedent — never
    // the caller's conf): InferFiltersFromGenerate adds `size(hs) > 0`
    // for the explode below, and predicate pushdown then substitutes the
    // FULL shingle expression into that Filter — re-evaluating the token
    // transform per shingle index, O(tokens²) per document (measured
    // 180 s at sf0.1 vs ~1 s with the rule off). The inferred filter is
    // an optimization, not a correctness requirement: explode of an
    // empty array emits nothing either way.
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val docs = Tables.documents(spark, dir)
    // shingle via the dedup pack's materialized two-step projection —
    // NEVER an inline shingleHashes column, which re-evaluates the token
    // transform per shingle index (the same quadratic shape, at plan
    // construction instead of optimization)
    val sh = Dedup.shingleSets(docs)
    val benchSet = sh.where(pmod(col("doc_id"), lit(50)) === 0)
      .select(explode(col("hs")).as("h")).distinct()
    val flagged = sh.where(pmod(col("doc_id"), lit(50)) =!= 0)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(benchSet), "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    flagged.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("n_shared"))
      .orderBy(col("doc_id"))
  }

  /** Polynomial rolling-hash fingerprint over the document's characters:
    * fp = fold(chars, 0, (acc, ch) => (acc*31 + ascii(ch)) mod 1e9+7).
    *
    * This is the oracle-checkable demonstration variant (DuckDB replays
    * the identical fold via list_reduce). The 100 TB path is
    * [[fingerprintFast]] — Spark's native codegen'd xxhash64.
    */
  def fingerprintPoly(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.polyHash(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Scale-path fingerprint: one codegen'd 64-bit xxHash per row. Used by
    * exact dedup at 100 TB (hash the text, group by hash). Engine-specific
    * hash values → rows-only driver check; the spec asserts injectivity
    * matches [[fingerprintPoly]] grouping on this corpus. */
  def fingerprintFast(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), xxhash64(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Deterministic content-keyed train/val/test split: bucket =
    * polyHash(text) mod 10 → train (0-7) / val (8) / test (9). Keyed by
    * CONTENT, not id, so the same document lands in the same split across
    * corpus versions and re-ingestions — id-keyed splits silently migrate
    * documents (and leak test data into train) whenever ids are
    * reassigned. A pure per-row projection: embarrassingly parallel at
    * any scale, and the poly-hash fold replays exactly in the DuckDB
    * oracle (xxhash64 would be the faster engine-specific variant, same
    * trade as [[fingerprintFast]]). */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val bucket = pmod(graft.functions.GraftFunctions.polyHash(col("text")), lit(10))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(bucket <= 7, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Greedy sequence packing: assign documents to fixed-budget training
    * chunks — the pre-tokenization batching step of an LLM data pipeline.
    * Within each `source` (the natural pack partition), documents are
    * taken in doc_id order and chunk_id = floor(tokens-before-this-doc /
    * maxTokens): one running-sum window per source, no driver loop.
    *
    * Scale: packing is inherently sequential WITHIN a pack stream, so the
    * stream must be a partition key — a single global ordering would
    * funnel 100 TB through one window partition. Per-source windows
    * parallelize across sources and match how corpora are actually packed
    * (streams are per-shard/per-source); the window itself is one shuffle
    * by (source) plus a sort Spark fuses into the exchange. */
  def packChunks(spark: SparkSession, dir: String,
                 maxTokens: Int = 256): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("chunk_id",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / maxTokens))
      .orderBy(col("doc_id"))
  }

  /** Digit normalization — the classic text-cleanup pass (numbers are
    * near-useless tokens for LM training and explode the vocabulary):
    * replace every digit run with a `<num>` sentinel and report the
    * per-source impact. One projection + one low-cardinality aggregate;
    * both `regexp_replace` calls replay identically in DuckDB. */
  def normalizeNumbers(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(col("text"), "[0-9]+", "<num>")
    Tables.documents(spark, dir)
      .select(col("source"),
        (norm =!= col("text")).cast("long").as("changed"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).as("digit_chars"),
        length(norm).as("norm_len"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("changed")).as("n_changed"),
        sum(col("digit_chars")).as("digit_chars"),
        sum(col("norm_len")).as("norm_chars"))
      .orderBy(col("source"))
  }

  /** Corpus bigram-LM quality proxy — the perplexity filter of CCNet
    * (Wenzek et al., LREC 2020: keep documents whose n-gram LM score is
    * good): each document's mean log-probability of its token
    * transitions under an add-k-smoothed bigram model ESTIMATED FROM THE
    * CORPUS ITSELF, so the operator is self-contained and
    * oracle-replayable (no pretrained KenLM in this container).
    * Boilerplate and natural text score high (their transitions repeat
    * corpus-wide); garbled or unique-gibberish text scores low.
    *
    * Shapes at 100 TB: the LM table is ONE explode + hash-keyed
    * group-by over (head-hash, bigram-hash) — the vocabulary crosses the
    * shuffle, not the corpus; context counts derive from the LM table
    * itself (never a second corpus pass); scoring joins each transition
    * against the LM by hash key, AQE picking broadcast vs shuffle from
    * the real vocabulary size. In production the LM table is published
    * once per corpus version like every other layout; here estimation
    * and scoring fuse into one plan and exchange reuse dedupes the scan.
    */
  def lmQualityScore(spark: SparkSession, dir: String,
                     k: Double = 0.5): DataFrame =
    lmQualityScoreOf(Tables.documents(spark, dir), k)

  /** Core of [[lmQualityScore]] over any documents-shaped frame. */
  private[graft] def lmQualityScoreOf(docs: DataFrame,
                                      k: Double = 0.5): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val th = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= 2)
    val trans = th.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("th")) - 1), i =>
          struct(element_at(col("th"), i).as("h1"),
            Dedup.combine2(element_at(col("th"), i),
              element_at(col("th"), i + 1)).as("bh")))).as("tr"))
      .select(col("doc_id"), col("tr.h1").as("h1"), col("tr.bh").as("bh"))
    // the LM: bigram counts keyed by (head, bigram); context counts are
    // a regroup of the LM frame, NOT a second corpus aggregate
    val lm = trans.groupBy(col("h1"), col("bh")).agg(count(lit(1)).as("c12"))
    val ctx = lm.groupBy(col("h1")).agg(sum(col("c12")).as("c1"))
    val vocab = th.select(explode(col("th")).as("h"))
      .agg(count_distinct(col("h")).as("v"))
    // per-doc mean via 1e9-scaled longs: each transition's log-prob is
    // bit-identical cross-engine (integer counts in, one log out), but a
    // raw avg() folds in partition order — the round-4 q_feat_scale trap.
    // Exact integer sum / one division instead.
    trans
      .join(lm, Seq("h1", "bh"))
      .join(ctx, Seq("h1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(floor(log((col("c12") + lit(k)) /
          (col("c1") + lit(k) * col("v"))) * 1e9 + 0.5).cast("long")).as("s9"))
      .select(col("doc_id"), col("n_trans"),
        (floor(col("s9").cast("double") / col("n_trans") / 1e3 + 0.5) / 1e6)
          .as("lm_score"))
      .orderBy(col("doc_id"))
  }

  /** Context-window chunking with overlap — the pretokenization step that
    * turns long documents into fixed-size training windows (stride <
    * window ⇒ consecutive windows overlap, so no token boundary is ever
    * only at a window edge). Emits one row per (doc, window): start
    * offset and actual token count (the final window is short). Pure
    * integer arithmetic on the token count — bit-exact in any engine —
    * and a per-row explode of O(n_tok/stride) window indices: no shuffle
    * at all until the presentation sort. Greedy cross-doc packing is the
    * SEPARATE operator ([[packChunks]]); this one is per-document and
    * order-free, so it parallelizes embarrassingly at 100 TB. */
  /** Chunking geometry — shared with the generated DuckDB twin. */
  val chunkWindowTokens = 128
  val chunkStride = 96

  def chunkWindows(spark: SparkSession, dir: String,
                   windowTokens: Int = chunkWindowTokens,
                   stride: Int = chunkStride): DataFrame = {
    val w = windowTokens.toLong
    val s = stride.toLong
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      // a zero-token document yields NO windows (a zero-length training
      // window is garbage downstream), not one empty window
      .where(col("n_tok") > 0)
      .withColumn("n_win", when(col("n_tok") <= w, lit(1L))
        .otherwise(floor((col("n_tok") - w + (s - 1)) / lit(s.toDouble))
          .cast("long") + 1))
      .select(col("doc_id"), col("n_tok"),
        explode(sequence(lit(0L), col("n_win") - 1)).as("win_id"))
      .select(col("doc_id"), col("win_id"),
        (col("win_id") * s).as("start_tok"),
        least(lit(w), col("n_tok") - col("win_id") * s).as("win_tokens"))
      .orderBy(col("doc_id"), col("win_id"))
  }

  /** Boilerplate-span geometry — shared with the generated DuckDB twin. */
  val boilWindowTokens = 16
  val boilStride = 8

  /** Repeated-span (boilerplate) detection — the cross-document
    * repetition miner behind C4/RefinedWeb-style boilerplate stripping:
    * token windows (width [[boilWindowTokens]], stride [[boilStride]])
    * are rolling-hashed and grouped; a span hash appearing in ≥ `minDocs`
    * DISTINCT documents is shared content (headers, footers, license
    * blocks, templated text) that whole-document dedup never catches.
    * Emits the top spans by document reach with deterministic
    * (n_docs desc, hash) order.
    *
    * Shape at 100 TB: per-row window hashing is a pure projection (one
    * token-hash pass, then O(n_tok/stride) constant-width integer folds);
    * the only shuffle is the span-hash group-by whose output is the
    * distinct-span count, not the corpus. All arithmetic is the shared
    * integer poly fold — the DuckDB twin replays it hash-exactly. */
  def boilerplateSpans(spark: SparkSession, dir: String, minDocs: Int = 2,
                       k: Int = 50): DataFrame =
    boilerplateSpansOf(Tables.documents(spark, dir), minDocs, k)

  /** Core of [[boilerplateSpans]] over any documents-shaped frame. */
  private[graft] def boilerplateSpansOf(docs: DataFrame, minDocs: Int = 2,
                                        k: Int = 50): DataFrame =
    spanHashes(docs).groupBy(col("sh"))
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"), min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("sh"))
      .limit(k)

  /** (doc_id, sh) rolling window hashes — the span primitive shared by
    * [[boilerplateSpans]] and [[boilerplateRatio]]. */
  private def spanHashes(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = boilWindowTokens
    val s = boilStride
    val th = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= w)
    th.select(col("doc_id"),
      explode(transform(
        sequence(lit(0),
          floor((size(col("th")) - w) / lit(s.toDouble)).cast("int")),
        j => aggregate(slice(col("th"), j * s + 1, lit(w)), lit(0L),
          (acc, h) => (acc * Dedup.shingleMult + h) % Dedup.P))).as("sh"))
  }

  /** Per-source boilerplate exposure — the "so what" consumer of
    * [[boilerplateSpans]]: what fraction of each source's token windows
    * is cross-document shared content? The cleanup-priority ranking a
    * pipeline runs before deciding which source needs boilerplate
    * stripping. Shape: the span frame is computed once, the shared-span
    * key set derives from it by one regroup (never a second corpus
    * pass), and the exposure join is span-hash keyed; the final ratio is
    * integer arithmetic (floor-scaled), hash-exact cross-engine. */
  def boilerplateRatio(spark: SparkSession, dir: String,
                       minDocs: Int = 2): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val spans = spanHashes(docs)
    val shared = spans.groupBy(col("sh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("sh"), lit(1L).as("is_shared"))
    spans
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .join(shared, Seq("sh"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_shared"), lit(0L))).as("n_shared"))
      .select(col("source"), col("n_windows"), col("n_shared"),
        (floor(col("n_shared").cast("double") * 1e6 / col("n_windows") + 0.5)
          / 1e6).as("shared_ratio"))
      .orderBy(col("source"))
  }

  /** Exact-substring span width (tokens) — shared with the generated
    * DuckDB twin. 16 tokens ≈ the shortest span worth excising; Lee et
    * al. use 50 BPE tokens on web-scale corpora, the principle is the
    * window length, not the constant. */
  val substrWindowTokens = 16

  /** Exact substring-duplication audit (Lee, Ippolito et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022 — the EXACT-SUBSTRING dedup modality): find, per document, the
    * maximal token spans whose every [[substrWindowTokens]]-token window
    * also appears verbatim in at least one OTHER document. Document-level
    * dedup (MinHash/SimHash families above) removes whole near-copies;
    * this catches the memorization-relevant case where two otherwise
    * distinct documents share a long verbatim run (quotes, licenses,
    * syndicated paragraphs) that should be excised once, not trained on
    * twice.
    *
    * Pipeline: one token-hash pass → stride-1 rolling window hashes (the
    * native O(n) [[graft.functions.NGramHashes]] combine, the same
    * arithmetic as the boilerplate miner's windows) → cross-document
    * window hashes (distinct-doc count ≥ minDocs) → per-doc position
    * islands merged into maximal spans by one sorted window pass (a new
    * span starts where the gap to the previous duplicated window exceeds
    * the window width) → per-doc span report (count, duplicated tokens,
    * fraction, first offset).
    *
    * Shape at 100 TB: the window stream is a projection off one scan
    * (O(tokens) rows of (pos, hash) pairs — this is the suffix-array
    * substitute that distributes: no global suffix sort, one hash
    * group-by bounded by distinct windows, one semi join back, and the
    * island merge partitions BY DOCUMENT, so no cross-doc ordering
    * exists anywhere). Every step is the shared integer poly-hash fold —
    * the DuckDB twin replays positions and extents bit-for-bit.
    *
    * Window identity is the WIDE two-fold key
    * ([[graft.functions.NGramHashesWide]], ~60-bit): in the single-fold
    * ~2³⁰ space birthday collisions are expected past ~10⁷ distinct
    * windows and CERTAIN at the 100 TB target — and a colliding window
    * pair in two documents fabricates a "verbatim" duplicate invisibly
    * to every check, because the twin replays the identical hash
    * (round-11 ADVICE #1). With both folds required to collide, expected
    * collisions stay ≪ 1 out past 10⁹ distinct windows. */
  def substringDupSpans(spark: SparkSession, dir: String): DataFrame =
    substringDupSpansOf(Tables.documents(spark, dir))

  /** Core of [[substringDupSpans]] over any documents-shaped frame. */
  private[graft] def substringDupSpansOf(docs: DataFrame,
                                         w: Int = substrWindowTokens,
                                         minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val th = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= w)
      .select(col("doc_id"), size(col("th")).cast("long").as("n_tokens"),
        graft.functions.GraftFunctions.ngramHashesWide(col("th"), w).as("whs"))
    val wins = th.select(col("doc_id"), col("n_tokens"),
      posexplode(col("whs")).as(Seq("pos", "wh")))
      .select(col("doc_id"), col("n_tokens"), col("pos").cast("long").as("pos"),
        col("wh"))
    val dupHash = wins.groupBy(col("wh"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDocs)
      .select(col("wh"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = wins.join(dupHash, Seq("wh"), "left_semi")
      .withColumn("newspan",
        when(col("pos") >
          coalesce(lag(col("pos"), 1).over(byPos), lit(-(w + 1L))) + w, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("newspan")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("span_id"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + w - 1).as("e"))
    spans.groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens"),
        min(col("s")).as("first_start"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_frac"),
        col("first_start"))
      .orderBy(col("doc_id"))
  }

  /** Exact-substring EXCISION (the rewrite half of Lee, Ippolito et
    * al. ACL'22 — [[substringDupSpans]] is the audit half): remove every
    * duplicated span from every document EXCEPT its canonical copy, so
    * the corpus trains on each verbatim run once. Deterministic
    * ownership contract: each duplicated window's canonical owner is
    * the MINIMUM doc_id containing it; an occurrence is redundant iff
    * its doc is not the owner; a token is excised iff covered by at
    * least one redundant duplicated window (merged to maximal spans
    * first, as in the audit). Output text is the surviving tokens
    * single-space-joined (the corpus tokenizer is whitespace-split, so
    * an untouched document round-trips byte-identical).
    *
    * Scale shape: the audit's window pipeline plus one owner aggregate
    * keyed by window hash (same shuffle key as the dup set), the island
    * merge and coverage stay partitioned BY DOCUMENT, and the rebuild is
    * one per-doc sorted-struct fold — no global order anywhere. */
  def substringExcisedCorpus(spark: SparkSession, dir: String): DataFrame =
    substringExcisedCorpusOf(Tables.documents(spark, dir))

  /** Core of [[substringExcisedCorpus]] over any documents-shaped frame. */
  private[graft] def substringExcisedCorpusOf(docs: DataFrame,
                                              w: Int = substrWindowTokens)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("toks"))
    val th = base.where(size(col("toks")) >= w)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.ngramHashesWide(
          graft.functions.GraftFunctions.tokenHashes(col("text")), w)
          .as("whs"))
    val wins = th.select(col("doc_id"),
      posexplode(col("whs")).as(Seq("pos", "wh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("wh"))
    val own = wins.groupBy(col("wh"))
      .agg(count_distinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("owner"))
      .where(col("nd") >= 2)
      .select(col("wh"), col("owner"))
    val red = wins.join(own, "wh")
      .where(col("doc_id") > col("owner"))
      .select(col("doc_id"), col("pos"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = red
      .withColumn("newspan",
        when(col("pos") >
          coalesce(lag(col("pos"), 1).over(byPos), lit(-(w + 1L))) + w, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("newspan")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + w - 1).as("e"))
    // Rebuild WITHOUT leaving the document row: the span list per doc is
    // tiny (merged islands), so collect it into an array and drop covered
    // positions with a codegen higher-order filter. The previous shape
    // posexploded EVERY token of EVERY document into a (doc_id, p) frame,
    // anti-joined it against an exploded covered-position set and
    // re-assembled with sort+collect_list — three corpus-sized shuffles
    // of token strings for what is a per-row computation (round-16
    // profile: the rebuild chain was ~40% of the query). Tokens now never
    // leave their row at ANY scale; only span bounds shuffle.
    val spanArr = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("sps"))
    base.join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("toks")).cast("long").as("nt"),
        when(col("sps").isNull, col("toks")).otherwise(
          filter(col("toks"), (_, i) => !exists(col("sps"),
            sp => i.cast("long").between(sp("s"), sp("e")))))
          .as("kept"))
      .select(col("doc_id"), col("nt").as("n_tokens"),
        (col("nt") - size(col("kept")).cast("long")).as("n_excised"),
        array_join(col("kept"), " ").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** DSIR hashed-feature bucket count — shared with the generated DuckDB
    * twin. 64 is the gate-rung constant; the published method uses 10k
    * buckets at web scale, the contract is the bucket arithmetic. */
  val dsirBuckets = 64

  /** DSIR target slice: the source whose n-gram profile defines the
    * "domain we want more of". Shared with the twin. */
  val dsirTargetSource = "src0"

  /** DSIR selection quota per source shard (top 20%). Shared with the
    * twin. */
  val dsirSelectFrac = 0.2

  /** Data Selection via Importance Resampling (Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023): score every document by how much more likely its hashed
    * n-gram features are under a TARGET domain's profile than under the
    * raw corpus profile, then keep a per-shard quota of the top-scored
    * docs. The standard pre-training recipe for tilting a crawl toward
    * a high-quality slice without training a classifier.
    *
    * DETERMINISTIC variant (the paper resamples with Gumbel noise —
    * unusable as a cross-engine contract): features are hashed unigrams
    * + bigrams into [[dsirBuckets]] buckets (the paper's hashing trick);
    * bucket log-ratios use add-one smoothing
    * `ln((tc+1)/(tT+B)) − ln((rc+1)/(rT+B))`; each per-(doc,bucket) term
    * is rounded to integer MICRO-units before the per-doc sum, so the
    * weight is an exact BIGINT (addition order cannot matter and the two
    * engines' last-ulp `ln` noise is absorbed); selection is the top
    * ⌈[[dsirSelectFrac]]·n⌉ per SOURCE by (weight desc, doc_id) — a
    * per-shard quota, not a global sort.
    *
    * Scale shape: one token-hash pass; both distribution fits are
    * B-row aggregates off the SAME per-(doc,bucket) count frame
    * (target = filtered sum, raw = total sum) broadcast back; the only
    * wide exchanges are the (doc,bucket) partial-agg shuffle and one
    * window keyed by source (20 shards here; at 100 TB the shard key is
    * whatever the corpus is already partitioned by — never a single
    * global ordering). */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightsOf(Tables.documents(spark, dir))

  /** Core of [[dsirWeights]] over any documents-shaped frame. */
  private[graft] def dsirWeightsOf(docs: DataFrame,
                                   b: Int = dsirBuckets,
                                   target: String = dsirTargetSource,
                                   frac: Double = dsirSelectFrac): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val th = docs
      .select(col("doc_id"), col("source"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= 1)
    // hashed unigram + bigram features in one projection (NGramHashes
    // yields an empty array below 2 tokens — no guard needed)
    val feats = th.select(col("doc_id"), col("source"),
      explode(concat(col("th"),
        graft.functions.GraftFunctions.ngramHashes(col("th"), 2))).as("h"))
      .select(col("doc_id"), col("source"),
        pmod(col("h"), lit(b.toLong)).cast("int").as("bucket"))
    val docBucket = feats.groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    // raw profile = all docs; target profile = the target source's slice
    // — both derive from the SAME (doc,bucket) counts, B rows each
    val dist = docBucket.groupBy(col("bucket"))
      .agg(sum(col("c")).as("rc"),
        sum(when(col("source") === lit(target), col("c")).otherwise(0L))
          .as("tc"))
    val tot = dist.agg(sum(col("rc")).as("rT"), sum(col("tc")).as("tT"))
    val ratios = dist.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("tc") + lit(1.0)) / (col("tT") + lit(b.toDouble))) -
          log((col("rc") + lit(1.0)) / (col("rT") + lit(b.toDouble))))
          .as("lr"))
    val weights = docBucket.join(broadcast(ratios), "bucket")
      .withColumn("term_u",
        floor(col("c").cast("double") * col("lr") * lit(1e6) + lit(0.5))
          .cast("long"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("term_u")).as("logw_micro"))
    val bySrc = Window.partitionBy(col("source"))
    weights
      .withColumn("src_rank", row_number().over(
        bySrc.orderBy(col("logw_micro").desc, col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .select(col("doc_id"), col("source"), col("logw_micro"),
        col("src_rank").cast("long").as("src_rank"),
        when(col("src_rank") <= ceil(col("n_src") * lit(frac)), 1L)
          .otherwise(0L).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Default mixing temperature — shared with the generated DuckDB twin
    * so both engines exponentiate with the IDENTICAL double (0.7 - 1 is
    * NOT the double -0.3; the oracle embeds this constant via toString
    * round-trip, the kdeOracle precedent). */
  val mixAlpha = 0.7
  val mixExponent: Double = mixAlpha - 1

  /** Temperature-flattened source mixing — the data-mixing step of
    * multi-source LLM training (Raffel et al., JMLR 2020 §5.4.3:
    * examples sampled ∝ n_s^α with temperature α < 1 so small
    * high-quality sources aren't drowned by the big crawl). Acceptance
    * probability p_s = n_s^(α-1) / max_s n_s^(α-1) (the smallest source
    * keeps everything); the accept decision is a DETERMINISTIC hash of
    * the doc_id against floor(p_s·10^6) — reproducible across engines
    * and runs, unlike an RNG sample. Emits the per-source mixing audit
    * (corpus count, acceptance rate, sampled count).
    *
    * Shape at 100 TB: one per-source count (tiny), broadcast back, one
    * per-row hash filter, one regroup — the corpus streams through
    * exactly once. */
  def temperatureMix(spark: SparkSession, dir: String,
                     alpha: Double = mixAlpha): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val bySource = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val maxW = bySource.agg(
      max(pow(col("n_docs").cast("double"), lit(alpha - 1))).as("w_max"))
    val probs = bySource.crossJoin(broadcast(maxW))
      .select(col("source"), col("n_docs"),
        (pow(col("n_docs").cast("double"), lit(alpha - 1)) / col("w_max"))
          .as("p"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(probs), "source")
      .where(pmod(graft.functions.GraftFunctions.polyHash(
        col("doc_id").cast("string")), lit(1000000L)) <
        floor(col("p") * 1e6))
      .groupBy(col("source"))
      .agg(first(col("n_docs")).as("n_docs"),
        round(first(col("p")), 6).as("p_accept"),
        count(lit(1)).as("n_sampled"))
      .orderBy(col("source"))
  }

  /** Per-source vocabulary profile — lexical-diversity screen of a
    * multi-source corpus: total tokens, distinct types, hapax legomena
    * (types seen once — the Zipf tail that dominates vocabulary growth,
    * Baayen, *Word Frequency Distributions* 2001), and type–token ratio.
    * A crawl source whose TTR collapses is template spam; one whose hapax
    * share explodes is OCR noise — the two standard red flags.
    *
    * Scale: the explode collapses map-side into (source, token) partial
    * counts, so the one real shuffle carries ~|sources|·|vocab| rows, not
    * the corpus; the second group-by is |vocab|-sized input, |sources|
    * output. TTR is an integer-exact 6dp ratio. */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, lit(1L)).otherwise(lit(0L))).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (floor(col("n_types").cast("double") / col("n_tokens") * 1e6 + 0.5)
          / 1e6).as("ttr"))
      .orderBy(col("source"))

  val oovVocabSize = 16

  /** Per-source out-of-vocabulary rate against the corpus top-`vocabSize`
    * token vocabulary — the tokenizer-coverage screen run before training
    * a tokenizer or reusing one across corpora: sources whose token mass
    * falls outside the head vocabulary force long BPE splits and waste
    * context length. Vocabulary selection is the deterministic total
    * order (count desc, token), so the cut is reproducible cross-engine.
    *
    * Scale: ONE tokenize + one (source, token) shuffle that collapses
    * map-side; the global vocabulary derives from that same aggregate
    * (identical counts and tie-break as [[tokenCounts]] — the shared
    * subtree lets Spark reuse the exchange instead of rescanning the
    * corpus) and is broadcast to the membership join. */
  def oovRate(spark: SparkSession, dir: String,
              vocabSize: Int = oovVocabSize): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
    val vocab = perSource.groupBy(col("token"))
      .agg(sum(col("n")).as("ng"))
      .orderBy(col("ng").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    perSource
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("n")).otherwise(lit(0L)))
          .as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (floor(col("n_oov").cast("double") / col("n_tokens") * 1e6 + 0.5)
          / 1e6).as("oov_rate"))
      .orderBy(col("source"))
  }

  val zipfTopK = 32

  /** Per-source Zipf slope — least-squares fit of ln(count) on ln(rank)
    * over the top-`k` tokens (Zipf's law: a natural-language source sits
    * near −1; templated/generated text reads flatter, OCR noise steeper
    * — a one-number fingerprint of the frequency distribution that
    * complements [[vocabStats]]' TTR).
    *
    * Determinism: ranks are integers from the total order (count desc,
    * token); each per-row term (ln-rank, ln-count and their products) is
    * IEEE arithmetic on identical inputs, quantized to 1e9/1e12-scaled
    * longs BEFORE the per-source sums so the Σ's are exact integers
    * regardless of partition order; the closed-form slope then divides
    * exact-in-double sums — bit-identical cross-engine.
    *
    * Scale: the same map-side-collapsed (source, token) shuffle as
    * [[vocabStats]]; the rank window sorts |vocab| rows per source (not
    * the corpus), and everything after is ≤k rows per source. */
  def zipfSlope(spark: SparkSession, dir: String,
                k: Int = zipfTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
    val ranked = counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("token"))))
      .where(col("rnk") <= k)
    val x = log(col("rnk").cast("double"))
    val y = log(col("n").cast("double"))
    ranked
      .select(col("source"),
        floor(x * 1e9 + 0.5).cast("long").as("x9"),
        floor(y * 1e9 + 0.5).cast("long").as("y9"),
        floor(x * y * 1e12 + 0.5).cast("long").as("xy12"),
        floor(x * x * 1e12 + 0.5).cast("long").as("xx12"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_top"),
        sum(col("x9")).as("sx"), sum(col("y9")).as("sy"),
        sum(col("xy12")).as("sxy"), sum(col("xx12")).as("sxx"))
      // a single-type source (n_top = 1) has zero x-variance: slope is
      // undefined — null on both engines, never 0/0
      .select(col("source"), col("n_top"),
        when(col("n_top") > 1,
          floor((col("n_top") * (col("sxy").cast("double") / 1e12) -
              (col("sx").cast("double") / 1e9) * (col("sy").cast("double") / 1e9)) /
            (col("n_top") * (col("sxx").cast("double") / 1e12) -
              (col("sx").cast("double") / 1e9) * (col("sx").cast("double") / 1e9))
            * 1e6 + 0.5) / 1e6).as("slope"))
      .orderBy(col("source"))
  }

  val pmiMinCount = 5
  val pmiTopK = 30

  /** Pointwise mutual information of adjacent-token pairs (Church &
    * Hanks, CL 1990) — collocation mining: PMI = ln(n_xy·N / (n_x·n_y))
    * with n_x/n_y the marginal counts of x as first and y as second
    * element. High-PMI pairs are multi-word expressions a tokenizer
    * should keep intact; they also expose templated boilerplate that
    * repeats verbatim. Only pairs with n_xy ≥ `minCount` rank (the PMI
    * low-frequency pathology), top `k` by (pmi, pair).
    *
    * Determinism: both ln arguments are EXACT long products (n_xy·N and
    * n_x·n_y stay far under 2^63 at any tested SF — at 100 TB widen to
    * decimal(38,0) before the cast), so the double division and the one
    * ln see bit-identical inputs in both engines; PMI is floor-rounded
    * to 6dp BEFORE the ordering so the top-k cut is deterministic too.
    *
    * Scale: bigram explode collapses map-side into (w1,w2) partials —
    * the shuffle carries distinct pairs; marginals derive from the pair
    * frame (never re-reading the corpus) and join back on pair-frame
    * cardinality; top-k is TakeOrdered, no global sort. */
  def pmiCollocations(spark: SparkSession, dir: String,
                      minCount: Int = pmiMinCount,
                      k: Int = pmiTopK): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
        struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_xy"))
    val nx = pairs.groupBy(col("w1")).agg(sum(col("n_xy")).as("n_x"))
    val ny = pairs.groupBy(col("w2")).agg(sum(col("n_xy")).as("n_y"))
    val total = pairs.agg(sum(col("n_xy")).as("n_tot"))
    pairs.where(col("n_xy") >= minCount)
      .join(nx, "w1").join(ny, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_xy"),
        (floor(log((col("n_xy") * col("n_tot")).cast("double") /
            (col("n_x") * col("n_y")).cast("double")) * 1e6 + 0.5) / 1e6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  val sparseSimDfCap = 16
  val sparseSimMinShared = 3
  val sparseSimTopK = 100
  /** 4-word shingles: on this corpus's ~31-type vocabulary the 3-gram
    * shingle space saturates (≈30k combinations, average df in the rare
    * band) and pair volume explodes ~27× at sf0.1; one more word makes
    * rarity meaningful again. At web scale the same dial trades recall
    * against posting volume. */
  val sparseSimShingleWords = 4

  /** Rare-shingle co-occurrence pairs — the inverted-index
    * (posting-list) candidate miner: document pairs sharing at least
    * `minShared` distinct RARE word-`shingleWords`-gram shingles
    * (document frequency in [2, dfCap]). This is the sparse-retrieval
    * complement of the MinHash/embedding LSH families and the standard
    * blocking step of entity resolution: rare shingles are
    * high-precision keys (single tokens are not — this corpus's word
    * vocabulary is ~31 types, every one common), and capping document
    * frequency bounds every posting list, so candidate generation is
    * provably O(Σ df²) ≤ O(|rare shingles| · dfCap²) — never a corpus
    * self-join.
    *
    * Scale shape: one tokenize pass builds distinct (doc, shingle)
    * postings (per-doc `array_distinct` dedups before the explode, so
    * the corpus-sized shuffle carries postings, not raw shingles); the
    * document-frequency aggregate reuses that exchange; the df-capped
    * semi-join drops every common shingle BEFORE the posting self-join;
    * the pair aggregate collapses map-side into at most dfCap²/2 rows
    * per shingle. Counts are exact integers; ranking is a bounded
    * TakeOrdered under the total order (n_shared desc, doc_a, doc_b).
    * Shingle keys are 8-byte rolling hashes end to end (the MinHash
    * family's combine arithmetic, replayed by the DuckDB twin), so no
    * shuffle in the plan ever carries a shingle string. */
  def sparseSimilarPairs(spark: SparkSession, dir: String,
                         dfCap: Int = sparseSimDfCap,
                         minShared: Int = sparseSimMinShared,
                         k: Int = sparseSimTopK): DataFrame =
    sparseCandidatePairs(spark, dir, dfCap, minShared)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(k)

  /** The FULL candidate-pair set behind [[sparseSimilarPairs]] (no
    * ranking cut) — the edge list entity-resolution clustering consumes
    * ([[Mining.entityClusters]]). */
  private[graft] def sparseCandidatePairs(spark: SparkSession, dir: String,
                                          dfCap: Int = sparseSimDfCap,
                                          minShared: Int = sparseSimMinShared)
  : DataFrame =
    pairsOfPostings(rarePostings(spark, dir, dfCap), minShared)

  /** [[sparseCandidatePairs]] reading the PUBLISHED posting index — the
    * scheduled-consumer path (entity resolution). */
  private[graft] def sparseCandidatePairsPublished(
      spark: SparkSession, dir: String,
      minShared: Int = sparseSimMinShared): DataFrame =
    pairsOfPostings(publishedRarePostings(spark, dir), minShared)

  private def pairsOfPostings(p: DataFrame, minShared: Int): DataFrame = {
    // Per-token pre-aggregation instead of a posting self-join: ONE
    // shuffle of the posting list (the join shuffled it twice and paid a
    // join), then pairs explode from each token's ≤ dfCap sorted doc
    // array — the same ≤ df²/2 pairs, generated map-side into the pair
    // aggregate's partial combine. `docs` is materialized by the
    // aggregate before the pairing lambda reads it, so the nested
    // element_at probes are O(df²) array reads, not re-evaluations.
    val perToken = p.groupBy(col("token"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      // df-1 tokens pair with nothing; the guard also keeps
      // sequence(1, 0) from counting DOWN (the ANSI descending trap)
      .where(size(col("docs")) >= 2)
    perToken
      .select(explode(flatten(transform(
        sequence(lit(1), size(col("docs")) - 1),
        i => transform(
          slice(col("docs"), (i + 1).cast("int"), size(col("docs")) - i),
          b => struct(element_at(col("docs"), i).as("doc_a"),
            b.as("doc_b")))))).as("pr"))
      .select(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The df-capped rare-shingle posting index behind
    * [[sparseCandidatePairs]] and the RRF sparse ranking — pinned so the
    * corpus is tokenized ONCE, not per consumer (at lake scale this is
    * the published shingle index, hashed to 8-byte keys, exactly as the
    * MinHash signature index is). Rare postings are ≤ |rare
    * shingles|·dfCap rows. */
  private[graft] def rarePostings(spark: SparkSession, dir: String,
                                  dfCap: Int = sparseSimDfCap): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val n = sparseSimShingleWords
    // Shingles are HASHED to 8-byte keys before anything shuffles or
    // materializes — the same rolling token-hash combine the dedup
    // family publishes ([[Dedup.combine2]] arithmetic, native
    // [[graft.functions.NGramHashes]] loop), so the checkpoint, the df
    // aggregate, the semi-join, and the pair stage all carry
    // (long, long) rows instead of ~25-byte shingle strings. The DuckDB
    // twin replays the identical per-token poly-hash fold and 4-gram
    // combine. Token-hash array in its own projection before the
    // combine reads it (the `Dedup.tokenHashedOf` O(n²) trap).
    // WIDE (~60-bit) two-fold keys (round-8 ADVICE #1): the single-fold
    // mod-1e9+7 space expects birthday collisions past ~1e7 distinct
    // shingles, and a collision merges posting lists invisibly to every
    // check (brute baseline and twin replay the same hash). The wide key
    // needs both folds to collide — expected collisions ≪ 1 past 1e9
    // shingles. See [[graft.functions.NGramHashesWide]].
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenHashes(col("text")).as("th"))
      .where(size(col("th")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(
          graft.functions.GraftFunctions.ngramHashesWide(col("th"), n)))
          .as("token"))
      .localCheckpoint()
    val rare = postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= dfCap)
      .select(col("token"))
    postings.join(rare, Seq("token"), "left_semi").localCheckpoint()
  }

  /** The rare-posting index as a PUBLISHED per-corpus-version layout —
    * the sparse-retrieval half of the contract whose dense half is
    * [[Dedup.ensureSignatureIndex]]: production systems maintain one
    * inverted index per corpus version and every scheduled consumer
    * (entity resolution, hybrid fusion) reads it rather than
    * re-tokenizing the corpus. [[sparseSimilarPairs]] itself stays the
    * measured LIVE pipeline, exactly as `q_dedup_minhash_pairs` stays
    * live beside the signature index. */
  /** Posting-index layout version, mixed into the publish fingerprint:
    * v3 = WIDE two-fold ~60-bit shingle keys (v2 = single-fold mod-P
    * keys; v1 carried shingle strings). On a shared metastore a library
    * upgrade must not read a prior layout of the same corpus version —
    * the data fingerprint alone would. */
  private val rarePostingLayoutVersion = 3L

  def ensureRarePostingIndex(spark: SparkSession, dir: String): String =
    graft.store.FeatureStore.ensurePlainTable(spark,
      rarePostings(spark, dir),
      s"graft_rare_postings_${Relational.dirSlug(dir)}",
      graft.store.FeatureStore.versionFingerprint(spark,
        s"$dir/documents.parquet") * 31L + rarePostingLayoutVersion)

  /** Read side of [[ensureRarePostingIndex]]. */
  private[graft] def publishedRarePostings(spark: SparkSession,
                                           dir: String): DataFrame =
    spark.table(ensureRarePostingIndex(spark, dir))

  /** EXACT set-similarity self-join by prefix filtering (the SSJoin /
    * PPJoin family, Chaudhuri et al. ICDE'06, Xiao et al. WWW'08):
    * all document pairs with 3-word-shingle-set Jaccard ≥ τ, with NO
    * false negatives — unlike the MinHash/SimHash/sign-LSH families
    * (which trade recall for speed) and unlike [[sparseSimilarPairs]]
    * (a candidate miner), this is the subquadratic path to the *exact*
    * answer, so its oracle is literally the brute-force join.
    *
    * The sets are [[Dedup.shingleSets]]' hashed 3-gram shingles — the
    * SAME published index frame the whole dedup family reads, with the
    * same DuckDB twin — so tokens are 8-byte longs, not strings, on
    * every join key and intersect. Shingle width matters: this corpus's
    * word vocabulary is tiny, so BIGRAM dfs run ~270 at sf0.1 and the
    * prefix filter only prunes ~3× (measured); 3-gram dfs drop to ~8
    * and the same filter prunes ~65× with the identical match set —
    * the standard q-gram-width tuning every set-similarity-join paper
    * applies to its corpus.
    *
    * Filter chain, all in EXACT integer arithmetic (τ = num/den, never a
    * float multiply whose rounding could flip a boundary cross-engine):
    *  - prefix filter: order each doc's bigrams by (global df ASC, token
    *    ASC); two docs with J ≥ τ MUST share a token in their first
    *    `n − ceil(τ·n) + 1` tokens (`ceil(τ·n) = (n·num + den−1) div
    *    den`), so only prefix postings are joined — and prefixes hold
    *    the RAREST tokens, which keeps posting lists short;
    *  - length filter: `den·min(na,nb) ≥ num·max(na,nb)`;
    *  - exact verify: `den·|a∩b| ≥ num·|a∪b|` over the pinned sets.
    *
    * Scale shape: the corpus is tokenized ONCE into the pinned set frame
    * (at lake scale, the published bigram-set index); df is one
    * aggregate; the canonical order is a per-doc window over ~doc-length
    * rows; candidate generation shuffles only prefix postings, bounded
    * by Σ prefix-df² ≪ n²; the verify join carries only candidate pairs.
    */
  def prefixFilterJoin(spark: SparkSession, dir: String,
                       tauNum: Int = 3, tauDen: Int = 5): DataFrame = {
    val (sets, cand) = prefixCandidates(spark, dir, tauNum, tauDen)
    val va = sets.select(col("doc_id").as("doc_a"), col("hs").as("wa"),
      col("nw").as("na"))
    val vb = sets.select(col("doc_id").as("doc_b"), col("hs").as("wb"),
      col("nw").as("nb"))
    cand.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("inter", size(array_intersect(col("wa"), col("wb"))).cast("long"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .where(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("uni"), 6).as("jac"))
      // NARROW exchange (3 columns, candidate-pair cardinality) between
      // the per-pair intersect verify and the presentation sort: without
      // it the range-partitioner's boundary-sampling pass re-executes
      // the whole verify chain, paying the intersects twice (round-16
      // profile: two ~2 s stages with identical shuffle reads). The
      // verified-pair frame is tiny relative to the set frames, so this
      // ships ids+score only — never the shingle arrays (guide §2.3).
      .repartition(col("doc_a"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The pinned shingle-set frame and the post-prefix/length-filter
    * candidate pair set behind [[prefixFilterJoin]] — exposed so the
    * spec can assert the pruning (candidates ≪ all pairs) separately
    * from exactness (result ≡ brute force). */
  private[graft] def prefixCandidates(spark: SparkSession, dir: String,
                                      tauNum: Int, tauDen: Int)
  : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // an exact similarity join is SCHEDULED work over a corpus version,
    // so it reads the published signature index's (doc_id, hs) — the
    // same layout-reuse contract as q_dedup_clusters / the heal pass;
    // the oracle replays from raw documents and still hash-matches
    val sets = spark.table(Dedup.ensureSignatureIndex(spark, dir))
      .select(col("doc_id"), col("hs"))
      .withColumn("nw", size(col("hs")).cast("long"))
    val tok = sets.select(col("doc_id"), col("nw"), explode(col("hs")).as("token"))
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, "token")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("token"))))
    // p = nw − ceil(τ·nw) + 1, all-integer ceil (`div`, never `/` —
    // Column `/` is double division)
    val prefix = ranked.where(col("pos") <=
      col("nw") - expr(s"(nw * $tauNum + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("token"), col("doc_id"), col("nw"), col("pos"))
    // Candidate generation: ONE pass over the prefix postings. The
    // classic formulation self-joins the prefix frame on token, but
    // Catalyst cannot dedupe the duplicated subtree — only the exchange
    // under the df-rank window is reused, so the window (sort +
    // row_number over every exploded token) and the df join above it
    // executed TWICE, measured as two back-to-back ~1.5-2 s CPU stages
    // reading the same shuffle (round-17 profile; the round-16 pre-sort
    // exchange had fixed only the sampler re-run). Grouping each token's
    // prefix postings into one doc_id-sorted array and exploding its
    // ordered 2-combinations (the [[Mining]] basket-combo idiom) emits
    // the SAME pair multiset with a single prefix pass — and replaces
    // the self-join's broadcast of a corpus-sized prefix frame with one
    // narrow postings shuffle keyed by token, honest at any scale. The
    // per-token array is bounded by the prefix df — prefixes hold the
    // RAREST tokens by construction (df ~8 on this corpus), and the
    // Σ df² candidate space is the same one the join shape pays.
    //
    // PPJoin POSITIONAL filter (Xiao et al. WWW'08 §3.2) on top of the
    // prefix+length filters, in the same exact-integer style. At the
    // FIRST common prefix token of a pair, at canonical positions
    // (pa, pb), every other shared token sits strictly after both (a
    // shared token before it would itself be a common prefix token —
    // both its positions are smaller), so
    //   inter ≤ 1 + min(na − pa, nb − pb),
    // and J ≥ τ requires inter ≥ α = ceil(num·(na+nb)/(num+den)).
    // Pairs whose bound cannot reach α are dropped BEFORE the verify
    // join ships any shingle set; min(struct) picks the first match.
    val byTok = prefix
      .groupBy(col("token"))
      .agg(sort_array(collect_list(struct(
        col("doc_id"), col("nw"), col("pos")))).as("ds"))
      .where(size(col("ds")) > 1)
    // ordered 2-combinations of the doc_id-sorted posting array: element
    // i paired with every later element, so doc_a ≤ doc_b by construction
    val combos = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2),
        greatest(size(col("ds")) - i - 1, lit(0))),
        y => struct(
          x.getField("doc_id").as("doc_a"), y.getField("doc_id").as("doc_b"),
          x.getField("nw").as("na"), y.getField("nw").as("nb"),
          x.getField("pos").as("pa"), y.getField("pos").as("pb")))))
    // the grouped-postings frame is SMALL in bytes (one row per prefix
    // token) but each row carries O(df²) combination-generation CPU, so
    // AQE's byte-proxy coalescing runs the explode at 1-4 tasks (round-17
    // profile: 2.8 s of stage CPU nearly serial) — the exact case
    // [[Hints.fanOut]] exists for (size-guarded: a corpus-scale frame
    // passes through untouched and keeps its natural partitioning)
    val cand = Hints.fanOut(byTok).select(explode(combos).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.na").as("na"), col("p.nb").as("nb"),
        col("p.pa").as("pa"), col("p.pb").as("pb"))
      .where(col("doc_a") < col("doc_b") &&
        least(col("na"), col("nb")) * tauDen >=
          greatest(col("na"), col("nb")) * tauNum)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(struct(col("pa"), col("pb"))).as("fm"),
        min(col("na")).as("na"), min(col("nb")).as("nb"))
      .where(lit(1) + least(col("na") - col("fm.pa"), col("nb") - col("fm.pb")) >=
        expr(s"((na + nb) * $tauNum + ${tauNum + tauDen - 1}) div ${tauNum + tauDen}"))
      .select(col("doc_a"), col("doc_b"))
    (sets, cand)
  }

  // ------------------------------------------------------------------
  // Subword tokenization: greedy BPE (Sennrich et al. ACL 2016)
  // ------------------------------------------------------------------

  /** Merge-table size cap. 200 merges is enough to expose every
    * mechanism (char pairs -> morphemes -> whole frequent words) on the
    * synthetic corpora; production vocabularies just raise the knob —
    * the fit loop is linear in it. */
  val bpeMaxMerges = 200

  /** Fit-table bound: the merge fit sees the TOP-N words by (count
    * desc, word asc) — a deterministic bounded collect, the same
    * driver-side-fit discipline as the PQ/IVF codebooks
    * ([[graft.ops.Similarity]]): at 100 TB the word-count aggregate is
    * one distributed map-side-combined pass and the top-k is a
    * TakeOrdered — never a full vocabulary collect. Zipf's law makes
    * the head carry almost all pair mass, so the capped fit tracks the
    * full-corpus fit closely (the standard practical recipe). */
  val bpeFitWords = 4096

  private val bpeCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Seq[(String, String)]]

  /** Fit (or fetch) the corpus BPE merge table — ranked (a, b) symbol
    * pairs, fingerprint-cached like the quantizer fits. */
  private[graft] def bpeMerges(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/documents.parquet")
    bpeCache.keys.filter(k => k._1 == dir && k._2 != fp).foreach(bpeCache.remove)
    bpeCache.getOrElseUpdate((dir, fp), {
      val wc = Tables.documents(spark, dir)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w"))
        .limit(bpeFitWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      fitBpe(wc, bpeMaxMerges)
    })
  }

  /** Deterministic greedy BPE fit over a bounded word-count table: each
    * round counts weighted adjacent symbol pairs, takes the max by
    * (count desc, pair lexicographic asc — a total order, so the fit is
    * engine- and shuffle-independent), records the merge and applies it
    * to every word with the SAME iterated-`replace` rule the encode
    * kernel uses ([[graft.functions.BpeTable]] — fit and encode share
    * one rewriting semantics by construction). Stops early when no pair
    * repeats. */
  private[graft] def fitBpe(wordCounts: Seq[(String, Long)],
                            maxMerges: Int): Seq[(String, String)] = {
    val Sep = graft.functions.BpeTable.Sep
    def wrap(w: String): String = {
      val sb = new java.lang.StringBuilder(w.length * 2 + 1)
      sb.append(Sep)
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendCodePoint(cp).append(Sep)
        i += Character.charCount(cp)
      }
      sb.toString
    }
    var words = wordCounts.map { case (w, c) => (wrap(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < maxMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (s, c) =>
        val syms = s.split(Sep).filter(_.nonEmpty)
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val best = counts.reduceOption { (x, y) =>
        val ((xa, xb), xc) = x; val ((ya, yb), yc) = y
        if (xc > yc || (xc == yc &&
          (xa < ya || (xa == ya && xb <= yb)))) x else y
      }
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          merges += ((a, b))
          val pat = s"$Sep$a$Sep$b$Sep"
          val rep = s"$Sep$a$b$Sep"
          words = words.map { case (s0, c0) =>
            var cur = s0
            var t = cur.replace(pat, rep)
            while (t != cur) { cur = t; t = cur.replace(pat, rep) }
            (cur, c0)
          }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** The fitted merge table as a DECLARED dump query (rank, a, b) — the
    * [[graft.ops.Similarity.pqCodebooksDump]] pattern: the iterative
    * argmax fit is engine-specific (rows-only, enlisted), but given
    * these merges the ENCODE is replayable rewriting, so `q_text_bpe`
    * is hash-checked end to end with this dump as its input. */
  def bpeMergesDump(spark: SparkSession, dir: String): DataFrame = {
    val m = bpeMerges(spark, dir)
    val spark2 = spark
    import spark2.implicits._
    m.zipWithIndex.map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("rank", "a", "b").orderBy(col("rank"))
  }

  /** BPE-encoded corpus: per document the whitespace word count, the
    * subword token count, and the full subword rendering (pieces of a
    * word joined by `"@@ "`, words by a single space — stripping
    * `"@@ "` reconstructs the original text, spec-asserted). THE token
    * counter for LLM data budgeting: whitespace `tokens()` understates
    * subword token counts by the fertility factor, and every
    * tokens-per-doc / packing / cost estimate downstream wants this
    * number (round-11 verdict #2).
    *
    * Scale shape: the merge table is a bounded driver fit (see
    * [[bpeFitWords]]); the encode is ONE projection over the documents
    * scan — a codegen kernel expression with a memoized Zipf-friendly
    * per-word cache, no shuffle, no UDF serde, no join against a
    * vocabulary table. At 100 TB it is embarrassingly parallel over
    * scan partitions. */
  def bpeEncodedDocs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val m = bpeMerges(spark, dir)
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_words"),
        graft.functions.GraftFunctions.bpeEncode(
          col("toks"), m.map(_._1), m.map(_._2)).as("e"))
      .select(col("doc_id"), col("n_words"),
        col("e.n_bpe").as("n_bpe_tokens"), col("e.bpe_text"))
      .orderBy(col("doc_id"))
  }

  /** The fitted merge table PUBLISHED as a versioned catalog artifact —
    * the tokenizer-as-artifact contract (round-12 verdict #3): a
    * production pipeline fits the tokenizer ONCE and applies it
    * everywhere, because a refit on each corpus silently shifts every
    * token budget downstream (tokenizer drift). Fingerprinted like the
    * quantizer layouts, so a corpus rewrite re-fits exactly once. */
  def ensureBpeMergesTable(spark: SparkSession, dir: String): String = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/documents.parquet")
    graft.store.FeatureStore.ensurePlainTable(spark, bpeMergesDump(spark, dir),
      s"graft_bpe_merges_${Relational.dirSlug(dir)}", fp)
  }

  /** Encode a corpus under a FIXED, EXTERNAL merge-table frame (rank, a,
    * b) — the apply half of the fit/apply split: the merges come from
    * whatever artifact the caller read (the published
    * [[ensureBpeMergesTable]], a dump from another corpus, a foreign
    * tokenizer export), NOT from a refit. The collect is bounded by the
    * merge-table size ([[bpeMaxMerges]] rows — an artifact, not data),
    * and the encode stays the single codegen kernel projection. */
  def bpeEncodeWith(spark: SparkSession, docs: DataFrame,
                    merges: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val m = merges.select(col("rank"), col("a"), col("b"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_words"),
        graft.functions.GraftFunctions.bpeEncode(
          col("toks"), m.map(_._1), m.map(_._2)).as("e"))
      .select(col("doc_id"), col("n_words"),
        col("e.n_bpe").as("n_bpe_tokens"), col("e.bpe_text"))
  }

  /** Published BPE-encoded corpus under the published merge artifact —
    * the encode kernel runs ONCE per corpus fingerprint and every
    * downstream token-id consumer reads the parquet layout instead of
    * re-running the kernel per branch (the same encode-once/reuse
    * contract a production tokenization pipeline ships: tokenized
    * shards are an artifact, not a recomputation). */
  def ensureBpeEncodedTable(spark: SparkSession, dir: String): String = {
    val fp = graft.store.FeatureStore.versionFingerprint(
      spark, s"$dir/documents.parquet")
    graft.store.FeatureStore.ensurePlainTable(spark,
      bpeEncodeWith(spark,
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        spark.table(ensureBpeMergesTable(spark, dir))),
      s"graft_bpe_encoded_${Relational.dirSlug(dir)}", fp)
  }

  /** DECLARED apply query: encode the corpus under the PUBLISHED merge
    * artifact (read back from the catalog, not refit) and emit per doc
    * the subword count plus a TOKEN-ID fold against the dumped vocab —
    * ids are 1-based ranks of the sorted distinct marked pieces
    * (`x@@` = continuation piece, `x` = word-final, the standard BPE
    * vocab distinction), folded in document order as (acc·31 + id) mod
    * [[graft.ops.Dedup.P]]. The fold pins the ENTIRE id sequence of
    * every document into one hash-checkable BIGINT without violating
    * the no-top-level-array output contract.
    *
    * Scale shape: every branch reads the PUBLISHED encoded corpus
    * ([[ensureBpeEncodedTable]] — the kernel runs once per corpus
    * fingerprint, not once per plan branch), the vocab is a FRAME, never
    * a driver collect — one map-side-combinable distinct ranked by a
    * window over its bounded (|merges| + |alphabet|, a few hundred rows)
    * result, broadcast into an equi-join against the posexploded pieces,
    * then one per-doc ordered re-fold over packed primitive longs.
    * Linear in total pieces with no per-piece vocabulary scan — the
    * first cut looked up each piece in a literal map, and `GetMapValue`
    * on an array-backed map literal is an O(|vocab|) linear probe, which
    * multiplied corpus growth by vocabulary growth into the one SUPER
    * flag of the round-13 scale audit (19 s/run at the sf1 rung; this
    * shape measures ~5x better there and removes the superlinear term). */
  def bpeApplyTokenIds(spark: SparkSession, dir: String): DataFrame = {
    val pieces = spark.table(ensureBpeEncodedTable(spark, dir))
      .select(col("doc_id"), col("n_bpe_tokens"),
        filter(split(col("bpe_text"), " "), p => length(p) > 0).as("ps"))
    // 1-based ranks of the sorted distinct marked pieces; the
    // single-partition rank window is a vocab-grid cost, not a data cost
    val vocab = pieces.select(explode(col("ps")).as("p")).distinct()
      .withColumn("id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("p"))).cast("long"))
    // (pos, id) packed into one long so the per-doc ordered re-fold
    // sorts primitive longs, not struct comparators: pos in the high 32
    // bits orders the sort, id (< 2^31) unpacks with one pmod
    val perDoc = pieces
      .select(col("doc_id"), posexplode(col("ps")).as(Seq("pos", "p")))
      .join(broadcast(vocab), Seq("p"))
      .groupBy(col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(
          col("pos").cast("long") * lit(1L << 32) + col("id"))),
        lit(0L),
        (acc, x) => pmod(acc * lit(31L) + pmod(x, lit(1L << 32)),
          lit(Dedup.P)))
        .as("id_fold"))
    pieces.select(col("doc_id"), col("n_bpe_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(vocab.agg(
        coalesce(max(col("id")), lit(0L)).as("vocab_size"))))
      .select(col("doc_id"), col("n_bpe_tokens"),
        coalesce(col("id_fold"), lit(0L)).as("id_fold"), col("vocab_size"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer fertility by language: subword-per-word ratio of the
    * [[bpeEncodedDocs]] encoding, grouped by `lang` — the per-language
    * token-budget multiplier every multilingual data mix is costed
    * with (a language the merge table under-serves shows fertility
    * near characters-per-word; the fit language sits near 1). Integer
    * sums, one rounded division at the end. Scale: the encode
    * projection + one tiny (|langs|-row) aggregate. */
  def bpeFertilityByLang(spark: SparkSession, dir: String): DataFrame =
    bpeEncodedDocs(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") /
          nullif(col("n_words"), lit(0L)), 6).as("fertility"))
      .orderBy(col("lang"))
}
