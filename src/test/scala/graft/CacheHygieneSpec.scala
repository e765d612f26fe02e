package graft

/** Cache discipline across the whole declared surface: after any query fn's
  * first action completes, no block-manager entry may survive — a long-lived
  * session running many queries (exactly the driver's Verify/Bench loops)
  * must not accumulate leaked InMemoryRelations. Scoped caches (x3's hashed
  * shingles, x9's doc sets) release via ScopedCache's one-shot listener;
  * x15's loop materializes its labels to parquet and unpersists eagerly.
  */
class CacheHygieneSpec extends SparkSpec {

  // getPersistentRDDs tracks every persisted RDD (SQL caches land here via
  // InMemoryRelation's column buffers) and shrinks on unpersist — the public
  // window onto exactly the leak class this spec polices.
  private def leaked: Iterable[Int] = spark.sparkContext.getPersistentRDDs.keys

  /** The scoped release rides the async listener bus: poll briefly. */
  private def awaitEmpty(key: String): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty,
      s"persisted RDDs leaked after first action of $key: ${leaked.mkString(",")}")
  }

  test("every declared query leaves no persisted blocks after its first action") {
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (key, fn) =>
      fn(spark, TestSpark.sf0001).count()
      awaitEmpty(key)
    }
  }
}
