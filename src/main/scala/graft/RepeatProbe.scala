package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: run one declared query key N times in a single session
  * and print EVERY invocation's wall-clock — the tool for spotting
  * cross-invocation degradation (leaked caches, listener pile-up,
  * accumulating scheduler state) that a median-of-N bench hides.
  */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("x15_dedup_clusters")
    val n = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[repeat] $key $i%2d: ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
