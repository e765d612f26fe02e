package graft
import org.apache.spark.sql.SparkSession

/** Deliverable helper (r17): dump `.explain("formatted")` of declared keys
  * to plans/<tag>/<key>_<suffix>.txt — the before/after plan evidence the
  * optimization rounds commit. Bench-shaped session (local[$CPUS], same
  * confs) so the dumped plan is the plan the bench times.
  * Usage: runMain graft.PlanDump <tag> <suffix> <key> [key...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    for (k <- keys) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        new java.io.File(dir, s"${k}_$suffix.txt").toPath,
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$tag/${k}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
