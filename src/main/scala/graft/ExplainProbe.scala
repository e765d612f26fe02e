package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit diagnostic: print the executed plan of any declared keys at
  * sf0.001 (`runMain graft.ExplainProbe <key> [key...]`). Exists so plan
  * hygiene checks (scan pruning / PushedFilters / exchange counts) are one
  * command instead of an ad-hoc harness each round.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Attach the full Graft session surface (function registration +
    // GraftPlanner strategies/rules) so the printed plan is the plan the
    // shipped session actually runs — without this, keys relying on
    // attach-time registration fail and rule-dependent plans differ.
    GraftSession.attach(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (k <- args) {
      println(s"========== $k ==========")
      val df = SparkEntry.queries(k)(spark, d)
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
