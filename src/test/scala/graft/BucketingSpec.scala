package graft

import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle co-location strategy for repeated fact-fact
  * joins at scale. Writing both sides bucketed by the join key into the
  * warehouse lets every subsequent join skip its Exchange entirely — at
  * 100 TB that's the difference between an hourly pipeline re-shuffling
  * 100 TB per run and one that shuffles once at ingest.
  */
class BucketingSpec extends SparkSpec {

  test("join over bucketed tables plans without a shuffle exchange") {
    val o = Tables.orders(spark, TestSpark.sf0001)
    val li = Tables.lineitem(spark, TestSpark.sf0001)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a fresh derby metastore won't know tables whose warehouse dirs
    // survived a previous JVM — remove the locations too
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("orders_b", "lineitem_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (bucket co-location);
    // only the final aggregation exchanges
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side re-shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side re-shuffled:\n$plan")

    // and the result matches the unbucketed join
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
    assert(joined.orderBy("o_orderpriority").collect().sameElements(expect))
  }
}
