package graft

import graft.functions.{StringPolyHash, TokenizePos, VectorCosine}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the custom Catalyst expressions — interpreted (eval)
  * and codegen paths must agree with each other and with a plain-Scala
  * reference implementation.
  */
class FunctionsSpec extends SparkSpec {

  private def refPolyHash(s: String, mod: Long): Long = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.isEmpty) 0L
    else bytes.tail.foldLeft((bytes.head & 0xffL)) { (h, b) =>
      (h * 31 + (b & 0xffL)) % mod
    }
  }

  private val asciiToken: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("StringPolyHash matches reference implementation (codegen path)") {
    import spark.implicits._
    StringPolyHash.register(spark)
    val tokens = Gen.listOfN(200, asciiToken).sample.get.distinct
    val got = tokens.toDF("t").selectExpr("t", "graft_polyhash(t) as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tokens.foreach { t =>
      assert(got(t) === refPolyHash(t, StringPolyHash.DefaultMod), s"token $t")
    }
  }

  test("StringPolyHash range is [0, mod)") {
    Gen.listOfN(500, asciiToken).sample.get.foreach { t =>
      val h = refPolyHash(t, StringPolyHash.DefaultMod)
      assert(h >= 0 && h < StringPolyHash.DefaultMod)
    }
  }

  test("VectorCosine: self-similarity is 1, symmetric, bounded") {
    import spark.implicits._
    VectorCosine.register(spark)
    val gen = Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))
    val vecs = (1 to 50).map(i => (i.toLong, gen.sample.get.toArray)).toDF("id", "v")
    vecs.createOrReplaceTempView("vc_test")
    val self = spark.sql("SELECT graft_cosine(v, v) AS s FROM vc_test").collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val pairs = spark.sql(
      """SELECT graft_cosine(a.v, b.v) AS ab, graft_cosine(b.v, a.v) AS ba
        |FROM vc_test a JOIN vc_test b ON a.id < b.id""".stripMargin).collect()
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(0) >= -1.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
    }
  }

  test("TokenizePos generator emits (pos, token) per non-empty token") {
    import spark.implicits._
    TokenizePos.register(spark)
    val df = Seq((1L, "a b  c"), (2L, ""), (3L, "solo")).toDF("id", "text")
    df.createOrReplaceTempView("tp_test")
    val rows = spark.sql(
      "SELECT id, tokenize_pos(text) AS (pos, token) FROM tp_test")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // "a b  c" splits to [a, b, "", c] — empty dropped, positions original
    assert(rows === Set((1L, 0, "a"), (1L, 1, "b"), (1L, 3, "c"), (3L, 0, "solo")))
  }

  test("SortedIntersectCount matches array_intersect cardinality on sorted distinct arrays") {
    import spark.implicits._
    graft.functions.SortedIntersectCount.register(spark)
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 60L))
    val rows = (1 to 60).map { i =>
      (i.toLong, gen.sample.get.distinct.sorted.toArray,
        gen.sample.get.distinct.sorted.toArray)
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.selectExpr("id",
        "graft_sorted_intersect_count(a, b) AS fast",
        "CAST(size(array_intersect(a, b)) AS BIGINT) AS ref")
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}"))
    // empty-array edges
    val edge = Seq((Array.empty[Long], Array(1L, 2L))).toDF("a", "b")
      .selectExpr("graft_sorted_intersect_count(a, b) AS c").head()
    assert(edge.getLong(0) === 0L)
  }

  test("graft_lsh_bucket rejects out-of-range Int literals with the descriptive error") {
    import spark.implicits._
    graft.functions.VectorLshBucket.register(spark)
    Seq((1L, Array(0.1f, 0.2f))).toDF("id", "v").createOrReplaceTempView("lsh_lit")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // Int literal (SQL integer) and Long literal (BIGINT cast) must both hit
    // the range check, not fall through to the bare case-class require.
    Seq("31", "0", "CAST(31 AS BIGINT)").foreach { lit =>
      val ex = intercept[Throwable] {
        spark.sql(s"SELECT graft_lsh_bucket(v, $lit) FROM lsh_lit").collect()
      }
      assert(messages(ex).exists(_.contains("[1, 30]")), s"literal $lit")
    }
    assert(spark.sql("SELECT graft_lsh_bucket(v, 30) FROM lsh_lit").collect().length === 1)
  }

  test("ZOrderCode: aligned 2-D tiles are exactly contiguous in z order; row-major is not") {
    import spark.implicits._
    graft.functions.ZOrderCode.register(spark)
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y").selectExpr("x", "y", "graft_zorder(x, y) AS z")
    val w = org.apache.spark.sql.expressions.Window.orderBy("z")
    val ranked = df.withColumn("rk", row_number().over(w))
    val sq = ranked.filter(col("x") >= 16 && col("x") < 24 &&
                           col("y") >= 32 && col("y") < 40)
      .agg(min("rk"), max("rk"), count(lit(1))).head()
    val (lo, hi, n) = (sq.getInt(0), sq.getInt(1), sq.getLong(2))
    assert(n === 64L)
    // an 8-aligned 8x8 tile is ONE contiguous z-range: dilation exactly 1
    assert(hi - lo + 1 === 64, s"z-order dilation ${(hi - lo + 1) / 64.0}")
    // row-major (y*64+x) spreads the same tile across ~7x its size
    assert((39 * 64 + 23) - (32 * 64 + 16) + 1 > 5 * 64)
    // out-of-range input must raise, not silently mask
    val ex = intercept[Throwable] {
      Seq((1L << 21, 0L)).toDF("x", "y").selectExpr("graft_zorder(x, y)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("2^21")))
  }

  test("money cast is exact and associative under partition reordering") {
    import spark.implicits._
    val values = Gen.listOfN(500, Gen.chooseNum(0.01, 99999.99)).sample.get
    val df = values.toDF("v")
    val once = df.repartition(1).agg(sum(Tables.money(col("v")))).head().getDecimal(0)
    val many = df.repartition(7).agg(sum(Tables.money(col("v")))).head().getDecimal(0)
    assert(once === many)
  }

  test("NfcNormalize: composes decomposed sequences, zero-copy when already NFC") {
    import spark.implicits._
    graft.functions.NfcNormalize.register(spark)
    // decomposed e + COMBINING ACUTE (U+0301) must compose to U+00E9
    val decomposed = "café résumé"
    val composed = "café résumé"
    val rows = Seq(decomposed, "plain ascii", "", composed).toDF("t")
      .selectExpr("t", "graft_nfc(t) AS n", "length(t) AS lt", "length(n) AS ln")
      .collect()
    val byInput = rows.map(r => r.getString(0) -> r).toMap
    assert(byInput(decomposed).getString(1) === composed)
    assert(byInput(decomposed).getInt(3) === byInput(decomposed).getInt(2) - 3,
      "each of the 3 combining pairs must shrink by one codepoint")
    // already-NFC inputs round-trip unchanged (the zero-copy fast path)
    Seq("plain ascii", "", composed).foreach { s =>
      assert(byInput(s).getString(1) === s)
    }
    // kernel-level zero-copy: same UTF8String instance comes back
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("already nfc")
    assert(graft.functions.NfcKernel.nfc(u) eq u)
  }
}
