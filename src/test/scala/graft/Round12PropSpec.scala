package graft

import org.apache.spark.sql.functions._

/** Randomized property pins for round-12's semantics-critical kernels —
  * the handpicked cases in Round11Spec/Round12Spec show the known corners;
  * these show there are no unknown ones. Each property batches all samples
  * into ONE DataFrame so the whole sweep is a single Spark job.
  */
class Round12PropSpec extends SparkSpec {

  /** The reference BPE merge as readable Scala: left-to-right token scan,
    * merge-with-next on match, never reconsider a just-merged token —
    * verified equivalent to Sennrich's lookaround re.sub by simulation
    * (see commit 62587ce / ROUND12.md §4).
    */
  private def refMerge(sym: String, pair: String): String = {
    val sep = pair.indexOf(' ')
    val x = pair.substring(0, sep); val y = pair.substring(sep + 1)
    val toks = sym.split(" ")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out += x + y; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.mkString(" ")
  }

  test("BpeMergeExpr == reference scan fold on 2000 randomized symbol strings") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    // alphabet chosen adversarially: tokens that are prefixes/suffixes of
    // each other and equal to plausible MERGED tokens ("ab", "aa"), so
    // boundary confusion or merged-token re-matching would surface
    val alphabet = Vector("a", "b", "ab", "aa", "ba", "c")
    val cases = (1 to 2000).map { _ =>
      val n = 1 + rnd.nextInt(9)
      val sym = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
      val pair = alphabet(rnd.nextInt(alphabet.size)) + " " +
        alphabet(rnd.nextInt(alphabet.size))
      (sym, pair, refMerge(sym, pair))
    }
    val bad = cases.toDF("sym", "pair", "expected")
      .withColumn("got", expr(graft.queries.PipelineOps.BpeMergeExpr))
      .filter(col("got") =!= col("expected"))
      .select(col("sym"), col("pair"), col("got"), col("expected"))
      .collect()
    assert(bad.isEmpty,
      s"merge fold diverges from the reference scan on: ${bad.take(5).mkString("; ")}")
  }

  test("SortedIntersectCount == set intersection on 2000 randomized sorted arrays") {
    val sess = spark
    import sess.implicits._
    graft.functions.SortedIntersectCount.register(spark)
    val rnd = new scala.util.Random(0xBEEF)
    // small value domain forces heavy overlap; sorted-distinct per contract
    val cases = (1 to 2000).map { _ =>
      val a = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted
      (a, b, (a.toSet intersect b.toSet).size.toLong)
    }
    val bad = cases.toDF("a", "b", "expected")
      .withColumn("got", expr("graft_sorted_intersect_count(a, b)"))
      .filter(col("got") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, s"intersect kernel diverges on ${bad.length} cases")
  }
}
