package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Partition pruning + columnar-cache read path — the two built-in scan
  * optimizations SURVEY §4 claims. Both are verified as BEHAVIOR here, not
  * just configuration: the pruned scan must list fewer partitions, and the
  * cached plan must read from InMemoryRelation with identical results.
  */
class PruningCachingSpec extends SparkSpec {

  test("day filter over day-partitioned parquet prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_by_day").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "events_by_day").getAbsolutePath
    // day-partitioned copy of events — the layout a 100 TB event store uses
    Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(path)

    val read = spark.read.parquet(path)
    val allDays = read.select(col("day")).distinct().count()
    assert(allDays > 1, "need multiple day partitions for pruning to be observable")

    val firstDay = read.agg(min(col("day"))).first().getDate(0)
    val pruned = read.filter(col("day") === lit(firstDay)).agg(count(lit(1)).as("n"))
    val scan = pruned.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("day"),
      s"day predicate not recognized as a partition filter:\n${scan.metadata}")
    val listing = scan.selectedPartitions
    assert(listing.partitionCount == 1,
      s"expected 1 of $allDays day-partitions after pruning, " +
        s"got ${listing.partitionCount} (${listing.totalNumberOfFiles} files)")
    assert(pruned.first().getLong(0) > 0)
  }

  test("declared key f4_math over a cached input reads InMemoryRelation, same result") {
    val expect = SparkEntry.queries("f4_math")(spark, TestSpark.sf001).collect()
    val li = Tables.lineitem(spark, TestSpark.sf001)
    li.persist()
    try {
      li.count() // materialize the columnar cache
      // CacheManager substitutes the matching scan subtree in ANY new plan —
      // the declared query is untouched; only the read path changes
      val cached = SparkEntry.queries("f4_math")(spark, TestSpark.sf001)
      val planStr = cached.queryExecution.withCachedData.toString
      assert(planStr.contains("InMemoryRelation"),
        s"cached lineitem not substituted into the plan:\n$planStr")
      assert(cached.collect().sameElements(expect))
    } finally li.unpersist()
  }
}
