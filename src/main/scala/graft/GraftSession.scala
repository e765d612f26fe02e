package graft

import graft.functions._
import graft.plans.{GraftExtensions, GraftPlanner}
import org.apache.spark.sql.SparkSession

/** One-line adoption surface for the library.
  *
  * New session, fully configured:
  * {{{
  *   val spark = GraftSession.builder().master("local[32]").getOrCreate()
  * }}}
  *
  * Existing session (driver-built, notebook, ...):
  * {{{
  *   GraftSession.attach(spark)
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  */
object GraftSession {

  /** Builder pre-configured with the graft defaults: local-appropriate
    * shuffle parallelism, AQE, UTC, the events-table ns-timestamp shim, and
    * the Catalyst extensions (CosineTopK rule/strategy + functions).
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)

  /** Idempotently register every graft function and planner extension on a
    * live session built elsewhere.
    */
  def attach(spark: SparkSession): SparkSession = {
    StringPolyHash.register(spark)
    VectorCosine.register(spark)
    VectorLshBucket.register(spark)
    SortedIntersectCount.register(spark)
    ZOrderCode.register(spark)
    TokenizePos.register(spark)
    SubwordPieces.register(spark)
    TopKTokensAgg.register(spark)
    WeightedSum.register(spark)
    VectorSumLong.register(spark)
    NfcNormalize.register(spark)
    BloomFunctions.register(spark)
    CmsQuery.register(spark)
    GraftPlanner.install(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Register every dataset table as a temp view over `sfDir`, so the whole
    * surface is reachable from plain `spark.sql` — the SQL-first workflow
    * the reference harness assumes (its queries are SQL strings over
    * external tables). Views go through [[Tables.load]], so the events
    * timestamp shim and session tuning apply identically to SQL users.
    *
    * Registration is per-table fault-isolated: one unreadable/missing table
    * must not take down views over the other nine (r7 postmortem — a broken
    * events loader killed four relational-only sql2 parity keys). SQL that
    * actually touches the broken table still fails, now with
    * TABLE_OR_VIEW_NOT_FOUND naming it.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    (Tables.relational ++ Seq("events", "documents", "embeddings")).foreach { t =>
      try Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
      catch { case e: Exception =>
        System.err.println(s"[graft] registerTables: skipping '$t' (${e.getMessage})")
      }
    }
}
