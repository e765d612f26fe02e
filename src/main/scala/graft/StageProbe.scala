package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (r17): run declared keys once warm and print EVERY
  * stage's task count, wall-clock, executor-CPU sum and shuffle bytes —
  * the tool for spotting serialized compute (a 1-task stage burning
  * seconds of CPU while 31 cores idle) that aggregate per-key timings
  * hide. `runMain graft.StageProbe <key> [key...]` at $SPARK_GRAFT_SF_DIR.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, sfDir, "region") // engine AQE posture (Tables.tune)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=${wall}%6.2fs cpu=${tm.executorCpuTime / 1e9}%6.2fs " +
          f"run=${tm.executorRunTime / 1e3}%6.2fs " +
          f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1048576.0}%8.3fMB " +
          f"${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    for (k <- args) {
      val fn = SparkEntry.queries(k)
      fn(spark, sfDir).count() // warmup: codegen + layout publish
      Thread.sleep(500)
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let the listener bus drain
      println(f"== $k: ${secs}%6.2f s, ${stages.size} stages")
      stages.forEach(println(_))
    }
    spark.stop()
  }
}
