package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (r17): print the EXECUTED plan of `df.count()` for a
  * declared key — the bench times `.count()`, and count's own optimizer
  * pass (column pruning, sort elimination, limit pushdown) can run a
  * materially different plan than the declared DataFrame's explain. This
  * prints what the timed action truly executes.
  */
object CountPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- args) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      val counted = df.groupBy().count()
      println(s"========== $k (under count) ==========")
      println(counted.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
