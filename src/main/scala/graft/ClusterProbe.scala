package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-JVM execution probe: runs a representative key set under
  * `local-cluster[2,4,2048]` — Spark's real standalone scheduler with TWO
  * SEPARATE EXECUTOR JVMs (task serialization, closure shipping, network
  * shuffle service, remote block fetches: everything a real cluster
  * exercises except physical network latency) — then re-runs the same
  * keys in plain local mode and asserts order-independent result
  * fingerprints are identical. This is the closest a single sandbox can
  * get to multi-node evidence: results provably do not depend on
  * everything running inside one JVM.
  *
  * Needs SPARK_HOME=/opt/spark (worker JVMs boot via spark-class) and the
  * library packaged (`sbt package`) so executors can load the graft
  * classes (custom expressions run INSIDE executor JVMs here — a real
  * serialization/classloading test local mode never performs).
  */
object ClusterProbe {
  private val Jar = "target/scala-2.13/benchmarkspark_2.13-0.1.0.jar"

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val keys =
      if (args.sameElements(Array("all"))) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("q1a_scan_filter", "q2a_substr_agg", "q2g_substr_agg",
        "q3b_join_topk", "q5_star_join", "x2_dedup_exact",
        "x9_ngram_jaccard", "w5_range_frame", "a8_multi_distinct",
        "x15_dedup_clusters", "x8_ann_lsh", "j10_range_rule")

    def fingerprints(master: String): Map[String, Long] = {
      val b = SparkSession.builder().master(master)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      val b2 =
        if (master.startsWith("local-cluster"))
          b.config("spark.jars", new java.io.File(Jar).getAbsolutePath)
        else b
      val spark = b2.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val out = keys.map { k =>
        val df = SparkEntry.queries(k)(spark, sf)
        val h = df.withColumn("__fp", xxhash64(struct(df.columns.map(col): _*)))
          .agg(expr("bit_xor(__fp)")).first()
        k -> (if (h.isNullAt(0)) 0L else h.getLong(0))
      }.toMap
      spark.stop()
      out
    }

    require(sys.env.contains("SPARK_HOME"),
      "set SPARK_HOME=/opt/spark so local-cluster can launch worker JVMs")
    require(new java.io.File(Jar).exists(), s"run `sbt package` first ($Jar)")
    val cluster = fingerprints("local-cluster[2,4,2048]")
    val local = fingerprints("local[8]")
    var ok = true
    for (k <- keys) {
      val same = cluster(k) == local(k)
      ok &= same
      println(f"$k%-22s cluster=${cluster(k)}%20d local=${local(k)}%20d ${if (same) "OK" else "MISMATCH"}")
    }
    assert(ok, "multi-JVM execution changed a result fingerprint")
    println(s"all ${keys.size} keys bit-identical across 2-executor-JVM cluster vs local")
  }
}
