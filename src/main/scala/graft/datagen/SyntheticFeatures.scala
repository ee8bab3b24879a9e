package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, deterministic synthetic feature-table generator with the
  * semantics of the reference's seeded `make_classification` call
  * (`/root/reference/src/data_generation.py:5-7`): 20 float features =
  * 2 informative Gaussian-cluster dims (2 clusters per class on hypercube
  * corners) + 10 redundant (fixed linear combinations of the informative
  * dims) + 8 pure noise, plus a balanced binary `target` — columns
  * shuffled by a fixed permutation.
  *
  * Scale design (SURVEY.md §7.5 hard-part #1): every random draw is a pure
  * function of the row id — `xxhash64(id, salt)` → uniform → Box-Muller —
  * so the data is identical under any partitioning / executor count / AQE
  * re-plan, unlike `randn(seed)` whose stream is per-partition. At 100 TB
  * this generates embarrassingly parallel with zero shuffle.
  */
object SyntheticFeatures {

  val numInformative = 2
  val numRedundant = 10
  val numNoise = 8
  val numFeatures: Int = numInformative + numRedundant + numNoise

  /** Cluster-center scale. The reference task is "trivially separable"
    * (golden accuracy 1.0, SURVEY.md §2.A); ±2σ corners give a ~2% Bayes
    * error so a sane RF lands ≥0.9 on a 20-row holdout like the golden
    * run does. */
  val classSep = 2.0

  private val M = (1L << 31) - 1

  /** Uniform (0,1] derived from (id, salt) — partition-invariant. */
  private def u(id: Column, salt: Int): Column =
    (pmod(xxhash64(id, lit(salt)), lit(M)) + 1).cast("double") / lit(M.toDouble)

  /** Standard normal via Box-Muller on two hash-derived uniforms. */
  private def gaussian(id: Column, salt: Int): Column =
    sqrt(lit(-2.0) * log(u(id, salt))) * cos(lit(2.0 * math.Pi) * u(id, salt + 7919))

  /** Fixed 10×2 mixing matrix for the redundant features (deterministic
    * small rationals, full rank in expectation). */
  val mixing: Seq[(Double, Double)] =
    (0 until numRedundant).map { j =>
      (((j * 2 + 0) * 53 % 17 - 8) / 4.0, ((j * 2 + 1) * 53 % 17 - 8) / 4.0)
    }

  /** Fixed column permutation (the reference shuffles feature columns). */
  val permutation: Seq[Int] = {
    // deterministic Fisher-Yates with an LCG, seed 42
    val a = (0 until numFeatures).toArray
    var s = 42L
    for (i <- a.length - 1 to 1 by -1) {
      s = (s * 6364136223846793005L + 1442695040888963407L)
      val j = math.floorMod(s, i + 1).toInt
      val t = a(i); a(i) = a(j); a(j) = t
    }
    a.toSeq
  }

  /** Generate `n` rows: `row_id` (stable key for splits/ordering; drop it
    * for reference-schema fidelity) + `feature_0..feature_19` (double) +
    * `target` (long, balanced 50/50). */
  def generate(spark: SparkSession, n: Long, parallelism: Int = 32): DataFrame = {
    val base = spark.range(0, n, 1, parallelism)
    val id = col("id")
    val target = pmod(id, lit(2)).cast("long")
    // cluster corner: (class, clusterBit) → informative-space center ±1
    val clusterBit = pmod(xxhash64(id, lit(101)), lit(2)).cast("int")
    val c0 = (target * 2 - 1).cast("double") * classSep            // -sep | +sep
    val c1 = (c0 * (clusterBit * 2 - 1)).cast("double")            // corner flip
    val inf0 = c0 + gaussian(id, 1)
    val inf1 = c1 + gaussian(id, 2)

    val raw: Seq[Column] =
      Seq(inf0, inf1) ++
        mixing.map { case (m0, m1) => inf0 * m0 + inf1 * m1 } ++
        (0 until numNoise).map(k => gaussian(id, 100 + k))

    val shuffled = permutation.zipWithIndex.map { case (src, dst) =>
      raw(src).as(s"feature_$dst")
    }
    base.select(id.as("row_id") +: shuffled :+ target.as("target"): _*)
  }
}
