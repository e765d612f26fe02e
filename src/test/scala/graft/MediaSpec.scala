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
    val m1 = SparkEntry.queries("m1_byte_features")(spark, TestSpark.sf0001)
    val joined = feats.toDF().join(m1, col("docId") === col("doc_id"))
      .filter(col("nBytes") =!= col("n_bytes"))
    assert(joined.count() === 0L)
    // determinism across runs
    val a = feats.orderBy("docId").collect()
    val b = Media.decode(Media.fromDocuments(spark, TestSpark.sf0001))
      .orderBy("docId").collect()
    assert(a.sameElements(b))
  }

  test("BMP container round-trips through the JDK ImageIO codec exactly") {
    // a crafted payload: decoded raster features must equal byte arithmetic
    val payload = "abc xyz".getBytes("UTF-8")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Media.encodeBmp(payload)))
    assert(img != null, "ImageIO must decode the constructed BMP")
    assert(img.getWidth === 16 && img.getHeight === 1)
    var sum = 0L; var mx = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      val ch = Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      sum += ch.sum; mx = math.max(mx, ch.max)
    }
    assert(sum === payload.map(_ & 0xff).map(_.toLong).sum)
    assert(mx === payload.map(_ & 0xff).max)
  }

  test("m3 real decode agrees with m1's stub byte accounting") {
    val m3 = SparkEntry.queries("m3_image_decode")(spark, TestSpark.sf0001)
    val m1 = SparkEntry.queries("m1_byte_features")(spark, TestSpark.sf0001)
      .withColumnRenamed("doc_id", "m1_doc")
    val bad = m3.join(m1, col("doc_id") === col("m1_doc"))
      .filter(col("channel_sum") =!= col("byte_sum") ||
        col("img_h") =!= greatest(lit(1L), ceil(col("n_bytes") / 48.0).cast("long")))
    assert(bad.count() === 0L)
  }

  test("PNG round-trips every byte value through DEFLATE exactly") {
    // all 256 byte values in one payload: the compressed path must be
    // lossless for the full alphabet, including 0x00 and 0xff
    val payload = Array.tabulate[Byte](256)(i => i.toByte)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Media.encodePng(payload)))
    assert(img != null, "ImageIO must decode the encoded PNG")
    assert(img.getWidth === 16 && img.getHeight === 16)
    val raster = img.getRaster
    val decoded = for (y <- 0 until 16; x <- 0 until 16)
      yield raster.getSample(x, y, 0)
    assert(decoded === (0 until 256))
  }

  test("m5 png decode agrees with m1's stub byte accounting") {
    val m5 = SparkEntry.queries("m5_png_decode")(spark, TestSpark.sf0001)
    val m1 = SparkEntry.queries("m1_byte_features")(spark, TestSpark.sf0001)
      .withColumnRenamed("doc_id", "m1_doc")
    val bad = m5.join(m1, col("doc_id") === col("m1_doc"))
      .filter(col("gray_sum") =!= col("byte_sum") ||
        col("img_h") =!= greatest(lit(1L), ceil(col("n_bytes") / 16.0).cast("long")))
    assert(bad.count() === 0L)
  }

  test("WAV container round-trips through the JDK audio codec exactly") {
    val payload = "hello audio".getBytes("UTF-8")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(Media.encodeWav(payload)))
    assert(in.getFormat.getSampleSizeInBits === 8)
    assert(in.getFormat.getChannels === 1)
    val samples = in.readAllBytes()
    assert(samples.length === payload.length)
    assert(samples.map(_ & 0xff).sum === payload.map(_ & 0xff).sum)
  }

  test("m4 real audio decode agrees with m1's byte accounting") {
    val m4 = SparkEntry.queries("m4_audio_decode")(spark, TestSpark.sf0001)
    val m1 = SparkEntry.queries("m1_byte_features")(spark, TestSpark.sf0001)
      .withColumnRenamed("doc_id", "m1_doc")
    val bad = m4.join(m1, col("doc_id") === col("m1_doc"))
      .filter(col("sample_sum") =!= col("byte_sum") ||
        col("n_samples") =!= col("n_bytes"))
    assert(bad.count() === 0L)
  }

  test("m6 gif: all 256 byte values survive the multi-frame LZW round-trip") {
    val payload = Array.tabulate(256)(_.toByte)
    val gif = Media.encodeGif(payload)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif)))
    assert(reader.getNumImages(true) === 4) // 256 bytes / 64-byte frames
    val decoded = (0 until 4).flatMap { f =>
      val img = reader.read(f)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y) & 0xff
    }
    assert(decoded === (0 until 256))
    reader.dispose()
  }

  test("m6 gif: sampled features equal byte arithmetic over even 64-byte chunks") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog " * 4 // 176 bytes, 3 frames
    val bytes = text.getBytes("UTF-8")
    val expect = bytes.grouped(64).zipWithIndex.filter(_._2 % 2 == 0)
      .flatMap(_._1.map(_ & 0xff)).toSeq
    val row = Media.decodeGifSampled(Seq((7L, bytes)).toDS()).head()
    assert(row.getLong(1) === (bytes.length + 63) / 64)
    assert(row.getLong(2) === expect.sum.toLong)
    assert(row.getLong(3) === expect.max.toLong)
  }

  test("frame sampling emits ceil(n/stride) frames per doc") {
    val recs = Media.fromDocuments(spark, TestSpark.sf0001)
    val frames = Media.sampleFrames(recs, 16)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    val m2 = SparkEntry.queries("m2_byte_frames")(spark, TestSpark.sf0001)
      .withColumnRenamed("n_frames", "expect")
    val bad = frames.join(m2, "doc_id").filter(col("n_frames") =!= col("expect"))
    assert(bad.count() === 0L)
  }
}
