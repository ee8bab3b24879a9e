package graft.ops

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Similarity-search pack over the `embeddings` table (SURVEY.md §2.B [EXT]
  * similarity-search row): brute-force cosine top-k as the exact baseline and
  * a random-projection-LSH approximate variant as the 100 TB scale path.
  *
  * Cosine is built entirely from higher-order array functions (`zip_with` +
  * `aggregate`) — an ordered left fold in doubles, so the DuckDB oracle can
  * replay bit-identical arithmetic (`list_reduce` over `list_transform`).
  * No UDFs anywhere; every plan is a scan → (broadcast) join → agg.
  */
object Similarity {

  /** Ordered left-fold sum of an array<double> column — matches DuckDB's
    * `list_reduce(l, (x,y) -> x+y)` exactly (0.0 + e1 == e1 in IEEE754). */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns as an ordered fold. */
  def dot(a: Column, b: Column): Column = foldSum(zip_with(a, b, (x, y) => x * y))

  /** Cosine similarity of two array<double> columns. Deterministic across
    * engines: same fold order, IEEE sqrt/div, caller rounds for output. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(sqrt(dot(a, a)) * sqrt(dot(b, b)), lit(0.0))

  /** `embeddings` with the float vector cast to array<double> (exact
    * widening) so all similarity arithmetic runs in doubles. */
  def embDouble(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("embedding", col("embedding").cast("array<double>"))

  /** [[embDouble]] plus a precomputed L2 norm — pair loops then need one
    * fold per pair (the dot) instead of three; at N×M pairs that's 3×
    * less interpreted-HOF work, the dominant cost of brute-force scoring. */
  def embWithNorm(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    embDouble(spark, dir)
      .withColumn("nrm",
        sqrt(GraftFunctions.dot(col("embedding"), col("embedding"))))
  }

  /** Exact top-k cosine neighbours for each query vector (`vec_id` <
    * `nQueries`), excluding self.
    *
    * Scale design: the query side is tiny and broadcast, so the candidate
    * scan never shuffles its full width. Top-k is two-phase — a salted
    * partial top-k (`groupBy(q_id, salt)` → sort+slice) collapses each
    * candidate partition to ≤ k·nSalts rows *before* the only wide exchange,
    * then a final per-query sort+slice. No window over a 10-partition key
    * (which would funnel all N candidates through 10 tasks), no driver
    * collect. At 100 TB the shuffle carries O(nQueries·salts·k) rows.
    */
  def topKCosine(spark: SparkSession, dir: String, nQueries: Int = 10,
                 k: Int = 10, nSalts: Int = 64): DataFrame = {
    val emb = embWithNorm(spark, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      col("nrm").as("cn"))

    val pairs = cands.crossJoin(broadcast(queries))
      .where(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        round(GraftFunctions.dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)), 6)
          .as("cos_sim"))

    // sort key: struct orders lexicographically → (-cos asc, cand_id asc)
    val keyed = struct((-col("cos_sim")).as("negcos"), col("cand_id"), col("cos_sim"))
    val partial = pairs
      .groupBy(col("q_id"), pmod(col("cand_id"), lit(nSalts)).as("salt"))
      .agg(slice(array_sort(collect_list(keyed)), 1, k).as("part"))
      .select(col("q_id"), explode(col("part")).as("e"))
    partial
      .groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(col("e"))), 1, k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.cand_id").as("cand_id"),
        col("col.cos_sim").as("cos_sim"), (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Approximate top-k via random-projection LSH on L2-normalized vectors —
    * the 100 TB path. On unit vectors euclidean distance is monotone in
    * cosine (d² = 2 − 2·cos), so BucketedRandomProjectionLSH's bucket join
    * prunes the candidate space to colliding buckets instead of the full
    * cross product. Seeded → deterministic. Output schema matches
    * [[topKCosine]]; recall is asserted (not equality) in the spec.
    */
  def annTopKCosine(spark: SparkSession, dir: String, nQueries: Int = 10,
                    k: Int = 10, threshold: Double = 1.3): DataFrame = {
    val emb = embDouble(spark, dir)
      .withColumn("v", array_to_vector(col("embedding")))
    val normed = new Normalizer().setInputCol("v").setOutputCol("nv").setP(2.0)
      .transform(emb).select(col("vec_id"), col("nv"))

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("nv").setOutputCol("hashes")
      .setBucketLength(0.5).setNumHashTables(4).setSeed(42)
    val model = lsh.fit(normed)

    val queries = normed.where(col("vec_id") < nQueries)
    val joined = model.approxSimilarityJoin(queries, normed, threshold, "dist")
      .select(col("datasetA.vec_id").as("q_id"),
        col("datasetB.vec_id").as("cand_id"), col("dist"))
      .where(col("q_id") =!= col("cand_id"))
      // unit vectors: cos = 1 - d²/2
      .withColumn("cos_sim", round(lit(1.0) - col("dist") * col("dist") / 2, 6))

    val keyed = struct((-col("cos_sim")).as("negcos"), col("cand_id"), col("cos_sim"))
    joined.groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(keyed)), 1, k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.cand_id").as("cand_id"),
        col("col.cos_sim").as("cos_sim"), (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** IVF-style approximate top-k: a seeded k-means coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nProbe` nearest centroids and searches only those cells — the
    * classic inverted-file ANN layout. At 100 TB the assignment is one
    * map pass, the probe join touches nProbe/nlist of the data, and cells
    * are the natural partitioning key for the candidate shuffle.
    * Seeded → deterministic; recall (not equality) asserted in the spec. */
  def ivfTopKCosine(spark: SparkSession, dir: String, nQueries: Int = 10,
                    k: Int = 10, nlist: Int = 16, nProbe: Int = 8): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val emb = embWithNorm(spark, dir)
      .withColumn("v", array_to_vector(col("embedding")))
    // a coarse quantizer doesn't need convergence — 8 iterations places
    // centroids well enough for cell routing at a fraction of the fit cost
    val km = new KMeans().setK(nlist).setSeed(42).setMaxIter(8)
      .setFeaturesCol("v").setPredictionCol("cell")
    val model = km.fit(emb.select(col("v")))
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))

    // centroid table is tiny: broadcast to rank cells per query
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }
    val centDf = spark.createDataFrame(centroids.toIndexedSeq)
      .toDF("cell", "centroid")
    val queries = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val probed = queries.crossJoin(broadcast(centDf))
      .withColumn("cdist",
        GraftFunctions.dot(col("qv"), col("centroid").cast("array<double>")) /
        (col("qn") * sqrt(GraftFunctions.dot(col("centroid").cast("array<double>"),
          col("centroid").cast("array<double>")))))
      .withColumn("crnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cdist").desc, col("cell"))))
      .where(col("crnk") <= nProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("cell"))

    val cands = assigned.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"), col("nrm").as("cn"), col("cell"))
    val scored = cands.join(broadcast(probed), Seq("cell"))
      .where(col("q_id") =!= col("cand_id"))
      .select(col("q_id"), col("cand_id"),
        round(GraftFunctions.dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)), 6)
          .as("cos_sim"))
    val keyed = struct((-col("cos_sim")).as("negcos"), col("cand_id"), col("cos_sim"))
    scored.groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(keyed)), 1, k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.cand_id").as("cand_id"),
        col("col.cos_sim").as("cos_sim"), (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  /** Pairwise cosine between the two vectors of every consecutive id pair
    * (2i, 2i+1) — a cheap all-distributed "similarity scoring" shape with a
    * clean oracle; exercises a co-partitioned self-join on derived keys. */
  def pairCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = embWithNorm(spark, dir)
    val a = emb.where(pmod(col("vec_id"), lit(2)) === 0)
      .select((col("vec_id") / 2).cast("long").as("pair_id"),
        col("embedding").as("va"), col("nrm").as("na"))
    val b = emb.where(pmod(col("vec_id"), lit(2)) === 1)
      .select(((col("vec_id") - 1) / 2).cast("long").as("pair_id"),
        col("embedding").as("vb"), col("nrm").as("nb"))
    a.join(b, "pair_id")
      .select(col("pair_id"),
        round(GraftFunctions.dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)), 6)
          .as("cos_sim"))
      .orderBy(col("pair_id"))
  }
}
