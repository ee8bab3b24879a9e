package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated prefix filter for local iteration; the
    // driver sets no filter and dumps everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    // gate-rung guard (round-9 ADVICE): several dump-twin oracle CTEs pin
    // the GATE-rung geometry (one sign word / word_idx = 0, nProbe = 8 of
    // nlist = 16, shortlist c = 128, PQ probe/shortlist 8/64,
    // single-block simhash keys) — valid
    // only while the oracle corpus stays ≤ 2048 embedding rows (below
    // Dedup.adaptiveGeometry / Similarity.adaptiveNlist rung 2 and
    // Dedup.mankuThreshold). Warn loudly so a larger gate SF reads as a
    // harness-geometry mismatch, not a spurious engine bug.
    val nEmb = graft.sources.Tables.embeddings(spark, sfDir).count()
    if (nEmb > 2048)
      System.err.println(s"[verify] WARNING: gate corpus has $nEmb embedding " +
        "rows > 2048 — the sign-LSH / IVF / ANN twin SQL pins gate-rung " +
        "literals and WILL hash-mismatch at wider adaptive rungs")
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // dump-backed oracles (q_histogram_features / q_kde_features) read
    // the q_synth_features dump by absolute path — substitute it here,
    // where the output dir is finally known
    val outAbs = new java.io.File(outDir).getAbsolutePath
    // the file-stats twin scans the PHYSICAL snapshot files of the
    // fingerprinted fixture — resolvable only at dump time (and only
    // if the fixture query ran under a SPARK_GRAFT_ONLY filter)
    val (fsV1, fsV2) =
      try graft.ops.Layout.fileStatsVersionDirs(spark, sfDir)
      catch { case _: Throwable => ("/graft_fstats_unseeded_v1",
        "/graft_fstats_unseeded_v2") }
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(graft.explore.Stats.verifyOutToken, outAbs)
          .replace(graft.ops.Layout.fstatsV1Token, fsV1)
          .replace(graft.ops.Layout.fstatsV2Token, fsV2))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
