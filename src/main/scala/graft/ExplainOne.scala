package graft
import org.apache.spark.sql.SparkSession

/** Plan-capture harness for the optimization rounds: writes
  * `.explain("formatted")` for each named query to plans/<tag>/<query>.txt
  * (measurement/evidence tooling, not part of the driver contract).
  * Usage: `runMain graft.ExplainOne <outDir> <query> [...]`. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = java.nio.file.Paths.get(args.head)
    java.nio.file.Files.createDirectories(outDir)
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
      println(s"EXPLAINED $name -> ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
