package graft

import graft.TestSpark._
import org.apache.spark.sql.functions._

/** Round-4 additions: repetition quality (x18), BM25 (x19), test-set
  * decontamination (x20), dedup-apply (x21), vector centroids (x22) and
  * the VectorSumLong DeclarativeAggregate behind them.
  */
class Round4Spec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("x18 repetition: keep flag consistent with its defining fractions") {
    val df = run("x18_repetition").cache()
    assert(df.count() > 0)
    val bad = df.filter(
      col("keep") =!= ((col("top_word_frac") < 0.10) && (col("dup_2gram_frac") < 0.10)))
    assert(bad.count() === 0L)
    // fractions are proper ratios
    assert(df.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1).count() === 0L)
    assert(df.filter(col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).count() === 0L)
    // the thresholds split the corpus non-trivially at sf0.001
    val kept = df.filter(col("keep")).count()
    assert(kept > 0 && kept < df.count())
    df.unpersist()
  }

  test("x19 bm25: scores positive, sorted, and docs actually contain a term") {
    val rows = run("x19_bm25").collect()
    assert(rows.length > 0 && rows.length <= 50)
    assert(rows.forall(_.getDouble(1) > 0))
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every scored doc contains at least one query term
    val ids = rows.map(_.getLong(0)).toSet
    val withTerm = Tables.documents(spark, sf0001)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .filter(col("text").contains("spark") || col("text").contains("join") ||
        col("text").contains("query"))
      .count()
    assert(withTerm === ids.size.toLong)
  }

  test("x20 decontam: flags only train docs, each sharing a real shingle") {
    val df = run("x20_decontam", sf001).cache()
    // flagged docs are never test docs
    assert(df.filter(col("doc_id") % 97 === 0).count() === 0L)
    assert(df.filter(col("n_shingles") < 1 || col("n_test_docs") < 1).count() === 0L)
    df.unpersist()
  }

  test("x21 dedup apply: survivors = all docs minus non-canonical cluster members") {
    val total = Tables.documents(spark, sf0001).count()
    val clusters = run("x15_dedup_clusters").cache()
    val removed = clusters.filter(col("cluster") =!= col("doc_id")).count()
    val kept = run("x21_dedup_apply").cache()
    assert(kept.count() === total - removed)
    // had_dups rows are exactly the canonical cluster representatives
    val canon = clusters.filter(col("cluster") === col("doc_id")).count()
    assert(kept.filter(col("had_dups")).count() === canon)
    clusters.unpersist(); kept.unpersist()
  }

  test("x22 centroid: one row per (label, dim); matches explode-path exactly") {
    val df = run("x22_centroid").cache()
    val labels = Tables.embeddings(spark, sf0001).select("label").distinct().count()
    assert(df.count() === labels * 64)
    // reference computation via explode→groupBy(label, dim): same integer
    // scaling, so equality is exact, not approximate
    val ref = Tables.embeddings(spark, sf0001)
      .select(col("label"), posexplode(
        expr("transform(embedding, v -> cast(round(cast(v as double) * 1000000) as long))")))
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(((sum(col("col")).cast("double") / lit(1000000.0)) / count(lit(1)))
        .as("ref_centroid"))
    val diff = df.join(ref, Seq("label", "dim"))
      .filter(col("centroid") =!= col("ref_centroid"))
    assert(diff.count() === 0L)
    df.unpersist()
  }

  test("VectorSumLong sums element-wise and ignores nulls") {
    import spark.implicits._
    graft.functions.VectorSumLong.register(spark)
    val df = Seq(
      (1, Some(Seq(1L, 2L, 3L))),
      (1, Some(Seq(10L, 20L, 30L))),
      (1, None: Option[Seq[Long]]),
      (2, Some(Seq(5L, 5L, 5L)))
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(expr("graft_vecsum_long(v)").as("s"))
      .orderBy("k").collect()
    assert(out(0).getSeq[Long](1) === Seq(11L, 22L, 33L))
    assert(out(1).getSeq[Long](1) === Seq(5L, 5L, 5L))
  }
}
