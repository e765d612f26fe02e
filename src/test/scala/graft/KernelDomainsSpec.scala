package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions._

/** Adversarial-input domain bounds for every codegen'd kernel (r15 verdict
  * #5): WinnowHashes carried a crash-at-scale `require` that took a full
  * verdict cycle to surface, so every kernel now has a pin of its behavior
  * on a manufactured pathological row — a monster document, a huge array, a
  * corrupt buffer, an out-of-range key. Policy per kernel (the table is
  * docs/KERNEL_DOMAINS.md): LINEAR kernels complete with input-proportional
  * cost (a pathological row costs what the row itself already costs to
  * hold); DECLARED-DOMAIN kernels fail with a NAMED error at the exact
  * boundary (never an opaque executor failure); CONTRACT kernels document
  * the caller obligation the type system can't express. WinnowHashes' gate
  * + backstop is pinned in Round15Spec and not repeated here.
  */
class KernelDomainsSpec extends SparkSpec {

  private def toks(n: Int, f: Int => String): GenericArrayData =
    new GenericArrayData(
      Array.tabulate[Any](n)(i => UTF8String.fromString(f(i))))

  /** Unwrap Spark's task/codegen wrapping to find a named cause. */
  private def causeChain(t: Throwable): Seq[String] = {
    var c: Throwable = t
    val msgs = scala.collection.mutable.ArrayBuffer[String]()
    while (c != null) { msgs += s"${c.getClass.getName}: ${c.getMessage}"; c = c.getCause }
    msgs.toSeq
  }

  // ===== linear text kernels: monster docs complete at O(row) ==============

  test("ShingleHashes: 200k-token document is linear — m = n-k+1, no throw") {
    val n = 200000
    val out = graft.functions.ShingleHashes.hash(
      toks(n, i => s"w$i"), 3, graft.functions.StringPolyHash.DefaultMod,
      distinctSorted = false)
    assert(out.numElements() == n - 3 + 1)
    val sorted = graft.functions.ShingleHashes.hash(
      toks(n, i => s"w$i"), 3, graft.functions.StringPolyHash.DefaultMod,
      distinctSorted = true)
    // distinct set is ascending-sorted and no larger than the multiset
    assert(sorted.numElements() <= out.numElements())
    var i = 1
    while (i < sorted.numElements()) {
      assert(sorted.getLong(i - 1) < sorted.getLong(i)); i += 1
    }
    // sub-k docs are empty, not an error
    assert(graft.functions.ShingleHashes.hash(toks(2, i => s"w$i"), 3,
      graft.functions.StringPolyHash.DefaultMod, distinctSorted = true)
      .numElements() == 0)
  }

  test("WordGramSha: monster doc linear; passage mode truncates the tail") {
    val n = 50000
    val out = graft.functions.WordGramSha.digests(
      toks(n, i => s"w$i"), 3, overlapping = true)
    assert(out.numElements() == n - 3 + 1)
    assert(out.getUTF8String(0).numBytes() == 64) // hex sha256
    // passage mode: ceil(12/5) = 3 windows, last truncated to 2 tokens
    val p = graft.functions.WordGramSha.digests(
      toks(12, i => s"w$i"), 5, overlapping = false)
    assert(p.numElements() == 3)
    // empty input is empty output, not an error
    assert(graft.functions.WordGramSha.digests(
      toks(0, i => ""), 3, overlapping = true).numElements() == 0)
  }

  test("SubwordPieces: 200k-char unknown-alphabet token degrades to 1-char pieces") {
    // worst case BY CONSTRUCTION: no vocab piece matches, every char is its
    // own piece — output count == char count, the kernel's documented
    // amplification ceiling (linear; progress guaranteed on any input)
    val out = graft.functions.SubwordVocab.tokenizeText(
      UTF8String.fromString("Z" * 200000))
    assert(out.numElements() == 200000)
    // and the greedy matcher still takes the longest piece when one exists
    val known = graft.functions.SubwordVocab.tokenizeText(
      UTF8String.fromString("that"))
    assert(known.numElements() == 1)
  }

  test("NfcKernel: 20k stacked combining marks normalize linearly") {
    val monster = "e" + "́" * 20000
    val out = graft.functions.NfcKernel.nfc(UTF8String.fromString(monster))
    val s = out.toString
    // e + acute composes to é; the remaining marks have nothing to compose
    // with and stay — length n, no throw, output is canonical NFC
    assert(s.length == 20000 && s.charAt(0) == 'é')
    assert(java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
    // already-normalized fast path returns the input reference (zero-copy)
    val ascii = UTF8String.fromString("plain ascii")
    assert(graft.functions.NfcKernel.nfc(ascii) eq ascii)
  }

  test("StringPolyHash + TokenizePos: megabyte rows stay linear through SQL") {
    graft.functions.StringPolyHash.register(spark)
    graft.functions.TokenizePos.register(spark)
    val h = spark.sql("SELECT graft_polyhash(repeat('a', 2000000)) AS h")
      .collect()(0).getLong(0)
    assert(h >= 0 && h < graft.functions.StringPolyHash.DefaultMod)
    // a 100k-token line explodes to exactly its token count (empties skipped)
    val line = (0 until 100000).map(i => s"t$i").mkString(" ") + "  "
    import spark.implicits._
    val cnt = Seq(line).toDF("text")
      .selectExpr("tokenize_pos(text) AS (pos, token)").count()
    assert(cnt == 100000)
  }

  // ===== vector kernels: degenerate inputs are total + deterministic =======

  test("VectorLshBucket: empty and NaN vectors bucket deterministically; bad knob is named") {
    graft.functions.VectorLshBucket.register(spark)
    // empty vector: every plane dot is 0.0 >= 0 — all bits set, one bucket,
    // deterministic (degenerate rows collide together, never crash a scan)
    val empty = spark.sql(
      "SELECT graft_lsh_bucket(cast(array() as array<float>), 8) AS b")
      .collect()(0).getInt(0)
    assert(empty == 255)
    // a NaN coordinate poisons every dot; NaN >= 0 is false — bucket 0
    val nan = spark.sql(
      "SELECT graft_lsh_bucket(cast(array(cast('NaN' as float), 1.0F) as array<float>), 8) AS b")
      .collect()(0).getInt(0)
    assert(nan == 0)
    // out-of-range plane count fails AT ANALYSIS with a named error, and an
    // out-of-range long must not silently truncate into a valid count
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_bucket(cast(array() as array<float>), 31)").collect()
    }
    assert(causeChain(e).exists(_.contains("plane count")))
  }

  test("VectorCosine: zero vectors are NaN, ragged lengths use the shared prefix") {
    graft.functions.VectorCosine.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(cast(array(0.0F, 0.0F) as array<float>),
        |                    cast(array(1.0F, 1.0F) as array<float>)) AS z,
        |       graft_cosine(cast(array(1.0F, 0.0F) as array<float>),
        |                    cast(array(1.0F) as array<float>)) AS ragged
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0).isNaN) // 0/0 — visible, never a throw
    assert(r.getDouble(1) == 1.0) // min-length prefix by contract
  }

  test("SortedIntersectCount: million-element arrays, zero allocation, exact") {
    graft.functions.SortedIntersectCount.register(spark)
    // multiples of 2 x multiples of 3 in [0, 1e6) intersect at multiples
    // of 6: 166667 (incl. 0). Sorted-distinct input is the CALLER contract
    // (callers sort once per document); unsorted input is documented
    // undefined, and array<int> coerces to array<bigint> at analysis.
    val c = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  sequence(0L, 999998L, 2L), sequence(0L, 999999L, 3L)) AS c
        |""".stripMargin).collect()(0).getLong(0)
    assert(c == 166667L)
  }

  test("VectorSumLong: ragged embedding lengths surface as VISIBLE nulls") {
    graft.functions.VectorSumLong.register(spark)
    import spark.implicits._
    val out = Seq(Seq(1L, 2L), Seq(3L)).toDF("v")
      .selectExpr("graft_vecsum_long(v) AS s").collect()(0).getSeq[Any](0)
    // ZipWith pads the shorter side with null and null + x = null: a ragged
    // corpus CANNOT silently produce a wrong centroid — the dimension that
    // lost data is null in the output (callers declare fixed-d embeddings)
    assert(out == Seq(4L, null))
  }

  // ===== declared-domain and buffer kernels ================================

  test("ZOrderCode: out-of-domain key fails with the named boundary error") {
    graft.functions.ZOrderCode.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zorder(-1L, 0L)").collect()
    }
    assert(causeChain(e).exists(_.contains("graft_zorder inputs must be in [0, 2^21)")))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT graft_zorder(${1L << 21}L, 0L)").collect()
    }
    assert(causeChain(e2).exists(_.contains("graft_zorder")))
    // boundary-interior values interleave fine
    val ok = spark.sql(s"SELECT graft_zorder(${(1L << 21) - 1}L, 0L) AS z")
      .collect()(0).getLong(0)
    assert(ok >= 0)
  }

  test("CmsQuery: a corrupt sketch buffer fails fast and typed, not garbage") {
    graft.functions.CmsQuery.register(spark)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_cms_query(cast('garbage-bytes' as binary), 'x')").collect()
    }
    // CountMinSketch.readFrom rejects the version word — the failure names
    // the sketch format rather than returning a fabricated count. Domain:
    // sketch bytes come from Spark's own count_min_sketch aggregate; the
    // probe side is top-k candidate rows, never the corpus.
    assert(causeChain(e).exists(m =>
      m.toLowerCase.contains("version") || m.contains("CountMinSketch")))
  }

  test("TopKTokensAgg: buffer stays capacity-bounded under a flood of distincts") {
    graft.functions.TopKTokensAgg.register(spark)
    import spark.implicits._
    // 50k distinct tokens through a capacity-bounded space-saving buffer:
    // state is O(capacity) regardless of stream cardinality — the
    // eviction path, not the exact path, is what this pins
    val out = (0 until 50000).map(i => s"tok$i").toDF("t")
      .selectExpr("graft_topk_tokens(t) AS top").collect()(0).getSeq[Any](0)
    assert(out.nonEmpty)
  }
}
