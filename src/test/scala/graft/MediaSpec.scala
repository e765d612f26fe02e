package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  test("typed media pipeline: schema carries binary + metadata struct") {
    val recs = Media.fromDocuments(spark, TestSpark.sf0001)
    val schema = recs.toDF().schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(recs.count() === 500)
  }

  test("decode stub is deterministic and matches m1's byte accounting") {
    val feats = Media.decode(Media.fromDocuments(spark, TestSpark.sf0001))
    val m1 = SparkEntry.queries("m1_media_features")(spark, TestSpark.sf0001)
    val joined = feats.toDF().join(m1, col("docId") === col("doc_id"))
      .filter(col("nBytes") =!= col("n_bytes"))
    assert(joined.count() === 0L)
    // determinism across runs
    val a = feats.orderBy("docId").collect()
    val b = Media.decode(Media.fromDocuments(spark, TestSpark.sf0001))
      .orderBy("docId").collect()
    assert(a.sameElements(b))
  }

  test("frame sampling emits ceil(n/stride) frames per doc") {
    val recs = Media.fromDocuments(spark, TestSpark.sf0001)
    val frames = Media.sampleFrames(recs, 16)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val m2 = SparkEntry.queries("m2_frame_sample")(spark, TestSpark.sf0001)
      .withColumnRenamed("n_frames", "expect")
    val bad = frames.join(m2, "doc_id").filter(col("n_frames") =!= col("expect"))
    assert(bad.count() === 0L)
  }
}
